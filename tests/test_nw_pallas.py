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


def _variant_pairs(rng, n=8, L=170):
    """SNP/indel/inversion-bearing pairs (the full production content mix)."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    pairs = []
    for k in range(n):
        base = bases[rng.integers(0, 4, size=L)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=5):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 4 == 1:
            del alt[60:71]
        if k % 4 == 2:
            alt[90:90] = bases[rng.integers(0, 4, size=9)].tobytes()
        if k % 4 == 3:
            alt[40:80] = bytes(alt[40:80]).translate(comp)[::-1]
        pairs.append((base, bytes(alt)))
    return pairs


# every production config class the runner can route through the Pallas
# sweep on direct-attached hardware (VERDICT r3 next #8): band buckets,
# int16 vs int32 DP state on the XLA side, scan unroll variants, one- vs
# two-piece penalties, and runs vs opcode emission
_MATRIX = [
    dict(band=63, use_int16=False, unroll=4, tb_unroll=4, two_piece=True),
    dict(band=127, use_int16=True, unroll=4, tb_unroll=4, two_piece=True),
    dict(band=255, use_int16=False, unroll=8, tb_unroll=2, two_piece=True),
    dict(band=127, use_int16=False, unroll=1, tb_unroll=1, two_piece=False),
    dict(band=63, use_int16=True, unroll=2, tb_unroll=8, two_piece=False),
]


@pytest.mark.parametrize("cfg", _MATRIX)
def test_pallas_parity_matrix(cfg):
    """End-CIGAR parity between every XLA production config and the Pallas
    route on the same mixed-variant batch."""
    rng = np.random.default_rng(sum(cfg[k] for k in ("band", "unroll", "tb_unroll")))
    pairs = _variant_pairs(rng)
    Q, T, qlens, tlens = pack(pairs)
    tmax = int((qlens + tlens).max()) + 1
    band = cfg["band"]
    kw = dict(
        mismatch=5, o1=8, e1=2,
        o2=24 if cfg["two_piece"] else -1,
        e2=1 if cfg["two_piece"] else -1,
        band=band, tmax=tmax,
    )
    qs = [Q[b, : qlens[b]] for b in range(len(pairs))]
    ts = [T[b, : tlens[b]] for b in range(len(pairs))]

    s_runs, tokens, counts = nw.nw_align_with_runs(
        Q, T, qlens, tlens, use_int16=cfg["use_int16"],
        unroll=cfg["unroll"], tb_unroll=cfg["tb_unroll"], **kw
    )
    assert (np.asarray(counts)[: len(pairs)] <= nw.RUN_MAX).all()
    items_runs = nw.decode_runs_batch(
        np.asarray(tokens)[: len(pairs)], np.asarray(counts)[: len(pairs)], qs, ts
    )

    s_pal, tb_pal = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, interpret=True, **kw)
    opcodes = nw.traceback_scan_device(tb_pal, qlens, tlens, band=band, tmax=tmax)
    ops = nw.unpack_opcodes(np.asarray(opcodes), np.asarray(opcodes).shape[1] * 4)
    items_ops = nw.decode_batch(ops[: len(pairs)], qs, ts)

    assert (np.asarray(s_runs)[: len(pairs)] == np.asarray(s_pal)[: len(pairs)]).all()
    for a, b in zip(items_runs, items_ops):
        assert a == b


@pytest.mark.parametrize("cfg", _MATRIX[:3])
def test_pallas_walk_matches_xla_walk(cfg):
    """The Pallas reverse-walk kernel (nw_walk_pallas) must emit the exact
    per-anti-diagonal opcode stream of the XLA walk (traceback_scan_device)
    over the Pallas sweep's traceback — the fused all-Pallas route the
    runner prefers on direct-attached hardware."""
    rng = np.random.default_rng(7 + cfg["band"])
    pairs = _variant_pairs(rng)
    Q, T, qlens, tlens = pack(pairs)
    tmax = int((qlens + tlens).max()) + 1
    band = cfg["band"]
    kw = dict(
        mismatch=5, o1=8, e1=2,
        o2=24 if cfg["two_piece"] else -1,
        e2=1 if cfg["two_piece"] else -1,
        band=band, tmax=tmax,
    )
    _s, tb = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, interpret=True, **kw)
    opc = nw.traceback_scan_device(tb, qlens, tlens, band=band, tmax=tmax)
    ops_ref = nw.unpack_opcodes(np.asarray(opc), np.asarray(opc).shape[1] * 4)[
        :, : tmax + 1
    ]
    ops_pal = np.asarray(
        nw_pallas.nw_walk_pallas(
            tb, qlens, tlens, band=band, tmax=tmax, interpret=True
        )
    )
    assert (ops_ref == ops_pal).all()
    qs = [Q[b, : qlens[b]] for b in range(len(pairs))]
    ts = [T[b, : tlens[b]] for b in range(len(pairs))]
    items_ref = nw.decode_batch(ops_ref, qs, ts)
    items_pal = nw.decode_batch(ops_pal, qs, ts)
    for a, b in zip(items_ref, items_pal):
        assert a == b


def test_pallas_parity_vs_segmented():
    """The segmented long-pair kernel and the Pallas route agree on scores
    and end CIGARs for the same pairs (the config the runner would pick at
    opposite ends of the length scale)."""
    from seqrush_tpu.ops.wfa import Penalties

    rng = np.random.default_rng(9)
    pairs = _variant_pairs(rng, n=8, L=200)
    Q, T, qlens, tlens = pack(pairs)
    tmax = int((qlens + tlens).max()) + 1
    band = 127
    kw = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=band, tmax=tmax)
    qs = [Q[b, : qlens[b]] for b in range(len(pairs))]
    ts = [T[b, : tlens[b]] for b in range(len(pairs))]

    pen = Penalties(5, 8, 2, 24, 1)
    s_seg, items_seg = nw.nw_align_long(Q, T, qlens, tlens, pen, band=band, seg=64)

    s_pal, tb_pal = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, interpret=True, **kw)
    opcodes = nw.traceback_scan_device(tb_pal, qlens, tlens, band=band, tmax=tmax)
    ops = nw.unpack_opcodes(np.asarray(opcodes), np.asarray(opcodes).shape[1] * 4)
    items_ops = nw.decode_batch(ops[: len(pairs)], qs, ts)

    assert (np.asarray(s_seg)[: len(pairs)] == np.asarray(s_pal)[: len(pairs)]).all()
    for k, (a, b) in enumerate(zip(items_seg[: len(pairs)], items_ops)):
        # segmented items carry 'M' placeholders (resolved by the runner)
        assert nw.resolve_matches(a, qs[k], ts[k]) == b


def test_runner_all_pallas_route_matches_default(monkeypatch):
    """Drive the runner's Pallas branch (sweep + walk kernels +
    'ops_unpacked' collect) end to end in interpret mode: results must
    equal the default XLA route's."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(4)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=200)].tobytes()
    fam = [("a", base)]
    for k in range(1, 4):
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=5):
            alt[pos] = bases[rng.integers(0, 4)]
        if k == 2:
            del alt[80:88]
        fam.append((chr(97 + k), bytes(alt)))
    seqs = make_sequence_set(fam)
    pairs = np.array([[i, j] for i in range(4) for j in range(4) if i != j])
    cfg = AlignmentScores.parse("0,5,8,2,24,1")

    ref = WfaAligner(seqs, RunnerConfig(scores=cfg)).align_pairs(pairs)
    ref_by_key = {(r.query_idx, r.target_idx): r for r in ref}

    real_sweep = nw_pallas.nw_align_pallas
    real_walk = nw_pallas.nw_walk_pallas
    monkeypatch.setattr(
        nw_pallas, "nw_align_pallas",
        lambda *a, **kw: real_sweep(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(
        nw_pallas, "nw_walk_pallas",
        lambda *a, **kw: real_walk(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(WfaAligner, "_use_pallas", lambda self: True)
    al = WfaAligner(seqs, RunnerConfig(scores=cfg))
    res = al.align_pairs(pairs)
    assert len(res) == len(ref)
    for r in res:
        o = ref_by_key[(r.query_idx, r.target_idx)]
        assert (r.score, r.is_reverse) == (o.score, o.is_reverse)
        assert r.cigar == o.cigar
