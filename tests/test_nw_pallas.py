"""Pallas Gotoh kernel parity vs the XLA specification (interpret mode on
CPU; real Mosaic lowering is exercised on TPU by bench/driver)."""

import numpy as np
import pytest

from seqrush_tpu.ops import nw, nw_pallas
from seqrush_tpu.pos import encode_bases


def pack(pairs):
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    return Q, T, qlens, tlens


@pytest.mark.parametrize("seed", range(2))
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(8):
        base = bases[rng.integers(0, 4, size=150)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=4):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 3 == 1:
            del alt[60:66]
        if k % 3 == 2:
            alt[90:90] = bases[rng.integers(0, 4, size=5)].tobytes()
        pairs.append((base, bytes(alt)))
    Q, T, qlens, tlens = pack(pairs)
    tmax = int((qlens + tlens).max())
    band = 63
    kw = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=band, tmax=tmax)
    s_ref, tb_ref = nw.nw_align_device(Q, T, qlens, tlens, with_traceback=True, **kw)
    s_pal, tb_pal = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, interpret=True, **kw)
    assert (np.asarray(s_ref) == np.asarray(s_pal)).all()
    tb_ref = np.asarray(tb_ref)
    tb_pal = np.asarray(tb_pal)
    assert (tb_ref == tb_pal[:, : tb_ref.shape[1], :]).all()
