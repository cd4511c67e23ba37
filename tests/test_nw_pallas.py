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


@pytest.mark.parametrize("seed", range(2))
def test_pallas_runs_emission_parity(seed):
    """End-CIGAR parity between the production runs-emission path and the
    Pallas forward sweep + device opcode walk (the runner's pallas route,
    align/runner.py _dispatch_nw_chunk): the decoded run lists must be
    IDENTICAL, pinning nw_align_with_runs semantics against the kernel
    that replaces the sweep on direct-attached TPU (VERDICT r2 #8)."""
    rng = np.random.default_rng(100 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(8):
        base = bases[rng.integers(0, 4, size=130)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=5):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 2:
            del alt[50:57]
        pairs.append((base, bytes(alt)))
    Q, T, qlens, tlens = pack(pairs)
    tmax = int((qlens + tlens).max()) + 1
    kw = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=63, tmax=tmax)

    # production emission: fused sweep + in-scan run accumulator
    s_runs, tokens, counts = nw.nw_align_with_runs(Q, T, qlens, tlens, **kw)
    qs = [Q[b, : qlens[b]] for b in range(len(pairs))]
    ts = [T[b, : tlens[b]] for b in range(len(pairs))]
    assert (np.asarray(counts)[: len(pairs)] <= nw.RUN_MAX).all()
    items_runs = nw.decode_runs_batch(
        np.asarray(tokens)[: len(pairs)], np.asarray(counts)[: len(pairs)], qs, ts
    )

    # pallas route: interpret-mode forward sweep -> device opcode walk
    s_pal, tb_pal = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, interpret=True, **kw)
    opcodes = nw.traceback_scan_device(tb_pal, qlens, tlens, band=63, tmax=tmax)
    ops = nw.unpack_opcodes(np.asarray(opcodes), np.asarray(opcodes).shape[1] * 4)
    items_ops = nw.decode_batch(ops[: len(pairs)], qs, ts)

    assert (np.asarray(s_runs)[: len(pairs)] == np.asarray(s_pal)[: len(pairs)]).all()
    for a, b in zip(items_runs, items_ops):
        assert a == b
