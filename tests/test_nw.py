"""Banded anti-diagonal Gotoh kernel tests: score parity with the DP oracle
and with the WFA kernel, traceback validity."""

import numpy as np
import pytest

from seqrush_tpu.ops import nw, wfa
from seqrush_tpu.ops.wfa import Penalties
from seqrush_tpu.pos import encode_bases

PEN = Penalties(5, 8, 2, 24, 1)
PEN1 = Penalties(1, 1, 1)


def run_nw(pairs, pen, band=48, with_traceback=True):
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    tmax = int((qlens + tlens).max())
    scores, tb = nw.nw_align_device(
        Q,
        T,
        qlens,
        tlens,
        mismatch=pen.mismatch,
        o1=pen.gap1_open,
        e1=pen.gap1_extend,
        o2=pen.gap2_open if pen.two_piece else -1,
        e2=pen.gap2_extend if pen.two_piece else -1,
        band=band,
        tmax=tmax,
        with_traceback=with_traceback,
    )
    return np.asarray(scores), np.asarray(tb), qlens, tlens


def full_cigar(tb, b, qlens, tlens, band, q, t):
    items = nw.traceback_pair(tb[b], int(qlens[b]), int(tlens[b]), band)
    return nw.resolve_matches(
        items, np.frombuffer(q, np.uint8), np.frombuffer(t, np.uint8)
    )


def check_cigar(items, q, t):
    qi = ti = 0
    for n, op in items:
        if op == "=":
            assert q[qi : qi + n] == t[ti : ti + n]
            qi += n
            ti += n
        elif op == "X":
            assert all(q[qi + i] != t[ti + i] for i in range(n))
            qi += n
            ti += n
        elif op == "I":
            qi += n
        elif op == "D":
            ti += n
        else:
            raise AssertionError(op)
    assert qi == len(q) and ti == len(t)


def cigar_score(items, pen):
    s = 0
    for n, op in items:
        if op == "X":
            s += n * pen.mismatch
        elif op in "ID":
            g1 = pen.gap1_open + n * pen.gap1_extend
            s += min(g1, pen.gap2_open + n * pen.gap2_extend) if pen.two_piece else g1
    return s


def test_identical():
    s, tb, ql, tl = run_nw([(b"ACGTACGTAC", b"ACGTACGTAC")], PEN)
    assert s[0] == 0
    items = full_cigar(tb, 0, ql, tl, 48, b"ACGTACGTAC", b"ACGTACGTAC")
    assert items == [(10, "=")]


def test_snp_and_gap():
    q = b"ACGTACGTACGTACGT"
    t = b"ACGAACGTACGT"  # SNP at 3 + 4-base deletion vs q
    s, tb, ql, tl = run_nw([(q, t)], PEN)
    items = full_cigar(tb, 0, ql, tl, 48, q, t)
    check_cigar(items, q, t)
    assert cigar_score(items, PEN) == s[0]


def test_long_gap_two_piece():
    q = b"ACGTACGTACGT" + b"T" * 24 + b"GGCCAATT"
    t = b"ACGTACGTACGT" + b"GGCCAATT"
    s, _, _, _ = run_nw([(q, t)], PEN, band=40)
    assert s[0] == 48  # min(8+2*24, 24+24)


@pytest.mark.parametrize("seed", range(5))
def test_random_vs_dp(seed):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    def mutate(s):
        s = bytearray(s)
        for _ in range(rng.integers(0, 6)):
            op = rng.integers(0, 3)
            pos = rng.integers(0, len(s))
            if op == 0:
                s[pos] = bases[rng.integers(0, 4)]
            elif op == 1 and len(s) > 4:
                del s[pos : pos + int(rng.integers(1, 4))]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=int(rng.integers(1, 4)))].tobytes()
        return bytes(s)

    base = bases[rng.integers(0, 4, size=70)].tobytes()
    pairs = [(mutate(base), mutate(base)) for _ in range(4)]
    scores, tb, ql, tl = run_nw(pairs, PEN, band=40)
    for b, (q, t) in enumerate(pairs):
        dp = wfa.affine2p_score_dp(
            np.frombuffer(q, np.uint8), np.frombuffer(t, np.uint8), PEN
        )
        assert scores[b] == dp, f"pair {b}"
        items = full_cigar(tb, b, ql, tl, 40, q, t)
        check_cigar(items, q, t)
        assert cigar_score(items, PEN) == dp


@pytest.mark.parametrize("seed", range(3))
def test_matches_wfa_scores(seed):
    rng = np.random.default_rng(50 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=300)].tobytes()
    alt = bytearray(base)
    for pos in rng.integers(0, len(alt), size=8):
        alt[pos] = bases[rng.integers(0, 4)]
    del alt[150:157]
    pairs = [(base, bytes(alt)), (bytes(alt), base), (base, base)]
    s_nw, _, _, _ = run_nw(pairs, PEN, band=64, with_traceback=False)

    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    Q, T, qlens, tlens = wfa.pack_batch(qs, ts)
    s_wfa, _ = wfa.wfa_align_device(
        Q, T, qlens, tlens, np.full(3, 500, np.int32),
        mismatch=5, o1=8, e1=2, o2=24, e2=1, smax=500, band=64, keep_history=False,
    )
    assert (s_nw == np.asarray(s_wfa)).all()


def test_single_piece_edit_distance():
    q = b"ACGTACGTAA"
    t = b"ACTTACGTA"
    s, tb, ql, tl = run_nw([(q, t)], PEN1, band=16)
    dp = wfa.affine2p_score_dp(np.frombuffer(q, np.uint8), np.frombuffer(t, np.uint8), PEN1)
    assert s[0] == dp


def test_unequal_lengths_batch():
    pairs = [(b"ACGT" * 10, b"ACGT" * 12), (b"AC" * 8, b"AC" * 8)]
    s, tb, ql, tl = run_nw(pairs, PEN, band=32)
    for b, (q, t) in enumerate(pairs):
        dp = wfa.affine2p_score_dp(np.frombuffer(q, np.uint8), np.frombuffer(t, np.uint8), PEN)
        assert s[b] == dp
        items = full_cigar(tb, b, ql, tl, 32, q, t)
        check_cigar(items, q, t)


@pytest.mark.parametrize("seed", range(3))
def test_device_traceback_matches_host(seed):
    """The device reverse-scan traceback produces the same CIGAR as the host
    walk for every pair."""
    rng = np.random.default_rng(70 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(6):
        base = bases[rng.integers(0, 4, size=90)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=4):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 2:
            del alt[40 : 40 + k]
        if k % 3 == 0:
            alt[70:70] = bases[rng.integers(0, 4, size=3)].tobytes()
        pairs.append((base, bytes(alt)))
    scores, tb, ql, tl = run_nw(pairs, PEN, band=32)
    tb_dev = nw.traceback_scan_device(
        np.asarray(tb), ql, tl, band=32, tmax=tb.shape[1] - 1
    )
    tb_dev = nw.unpack_opcodes(tb_dev, np.asarray(tb_dev).shape[1] * 4)
    for b, (q, t) in enumerate(pairs):
        host = nw.traceback_pair(tb[b], int(ql[b]), int(tl[b]), 32)
        dev = nw.decode_opcodes(tb_dev[b])
        assert host == dev, f"pair {b}"


def test_segmented_matches_single_shot():
    """The segmented long-sequence sweep produces the same scores and CIGARs
    as the single-shot kernel."""
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(4):
        base = bases[rng.integers(0, 4, size=500 + 40 * k)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=10):
            alt[pos] = bases[rng.integers(0, 4)]
        del alt[200:206]
        pairs.append((base, bytes(alt)))
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    ql = np.array([q.size for q in qs], np.int32)
    tl = np.array([t.size for t in ts], np.int32)
    s_ref, tb, _, _ = run_nw(pairs, PEN, band=63)
    s_seg, items_seg = nw.nw_align_long(Q, T, ql, tl, PEN, band=63, seg=256)
    assert (s_ref == s_seg).all()
    for b in range(4):
        host = nw.traceback_pair(tb[b], int(ql[b]), int(tl[b]), 63)
        assert items_seg[b] == host, f"pair {b}"


def test_extreme_length_mismatch():
    """Pair with wildly different lengths (band capped at maxlen+1)."""
    q = b"ACGTACGTAC"
    t = (b"ACGTACGTAC" * 30)[:298]
    s, tb, ql, tl = run_nw([(q, t)], PEN, band=299)
    dp = wfa.affine2p_score_dp(np.frombuffer(q, np.uint8), np.frombuffer(t, np.uint8), PEN)
    assert s[0] == dp
    items = full_cigar(tb, 0, ql, tl, 299, q, t)
    check_cigar(items, q, t)


def test_one_base_pair():
    s, tb, ql, tl = run_nw([(b"A", b"A"), (b"A", b"C")], PEN, band=8)
    assert s[0] == 0 and s[1] == PEN.mismatch
    assert full_cigar(tb, 0, ql, tl, 8, b"A", b"A") == [(1, "=")]
    assert full_cigar(tb, 1, ql, tl, 8, b"A", b"C") == [(1, "X")]


def test_runner_routes_long_pairs_through_segments():
    """Pairs above long_pair_threshold use the segmented kernel and still
    produce valid alignments through the runner."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=1500)].tobytes()
    alt = bytearray(base)
    for pos in rng.integers(0, len(alt), size=20):
        alt[pos] = bases[rng.integers(0, 4)]
    seqs = make_sequence_set([("a", base), ("b", bytes(alt))])
    cfg = RunnerConfig(long_pair_threshold=1024)  # force the segmented path
    al = WfaAligner(seqs, cfg)
    res = al.align_pairs(np.array([[0, 1], [1, 0]], dtype=np.int32))
    assert len(res) == 2
    for r in res:
        q = seqs[r.query_idx].data
        t = seqs[r.target_idx].data
        qc = sum(n for n, op in r.cigar if op in "=XI")
        tc = sum(n for n, op in r.cigar if op in "=XD")
        assert qc == len(q) and tc == len(t)
        for n, op in r.cigar:
            assert op in "=XID"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_v3_matches_v1(seed):
    """The stacked-carry v3 sweep is bit-identical to the v1 specification:
    same scores and same opcode streams across random SNP/indel pairs,
    including unequal lengths, dummies, and both DP dtypes."""
    rng = np.random.default_rng(100 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    B = 6
    qs, ts = [], []
    for b in range(B):
        n = int(rng.integers(1, 300))
        q = bases[rng.integers(0, 4, n)]
        t = bytearray(q.tobytes())
        for pos in rng.integers(0, max(n, 1), size=max(n // 12, 1)):
            t[pos % len(t)] = bases[rng.integers(0, 4)]
        for _ in range(int(rng.integers(0, 3))):
            pos = int(rng.integers(0, max(len(t) - 5, 1)))
            ln = int(rng.integers(1, 12))
            if rng.random() < 0.5 and len(t) > ln + 2:
                del t[pos : pos + ln]
            else:
                t[pos:pos] = bases[rng.integers(0, 4, ln)].tobytes()
        qs.append(q)
        ts.append(np.frombuffer(bytes(t), np.uint8))
    qs.append(np.zeros(0, np.uint8))  # dummy pair
    ts.append(np.zeros(0, np.uint8))
    lq = max(max(q.size for q in qs), 1)
    lt = max(max(t.size for t in ts), 1)
    Q = np.stack([np.concatenate([encode_bases(q.tobytes()), np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([encode_bases(t.tobytes()), np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    tmax = int((qlens + tlens).max())
    kw = dict(mismatch=PEN.mismatch, o1=PEN.gap1_open, e1=PEN.gap1_extend,
              o2=PEN.gap2_open, e2=PEN.gap2_extend, band=64, tmax=tmax)
    for use_int16 in (False, True):
        s1, o1_ = nw.nw_align_with_opcodes(
            Q, T, qlens, tlens, use_int16=use_int16, impl="v1", **kw)
        s3, o3_ = nw.nw_align_with_opcodes(
            Q, T, qlens, tlens, use_int16=use_int16, impl="v3", **kw)
        # v1 never captures the t=0 cell, reporting -1 for zero-length
        # dummies; v3 correctly reports 0 there (the one intended divergence)
        s1 = np.where(qlens + tlens == 0, 0, np.asarray(s1))
        np.testing.assert_array_equal(s1, np.asarray(s3))
        np.testing.assert_array_equal(np.asarray(o1_), np.asarray(o3_))


def test_stream_windows_matches_dynamic_slice():
    """The streamed substitution windows (carried [B, W] windows + one-lane
    shifts) are score- and opcode-identical to the dynamic-slice windows
    across shape edge cases: tmax far beyond the sequences (dead sliding
    rows), band wider than the sequences, unequal lengths with M > Lq, and
    zero-length dummies."""
    import jax

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    q0 = bases[rng.integers(0, 4, 90)]
    t0 = bytearray(q0.tobytes())
    del t0[30:45]
    t0[60:60] = bases[rng.integers(0, 4, 8)].tobytes()
    qs = [q0, bases[rng.integers(0, 4, 12)], np.zeros(0, np.uint8),
          bases[rng.integers(0, 4, 250)]]
    ts = [np.frombuffer(bytes(t0), np.uint8), bases[rng.integers(0, 4, 240)],
          np.zeros(0, np.uint8), bases[rng.integers(0, 4, 20)]]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    for band, tmax in ((63, int((qlens + tlens).max())), (127, 900), (511, 1200)):
        kw = dict(mismatch=PEN.mismatch, o1=PEN.gap1_open, e1=PEN.gap1_extend,
                  o2=PEN.gap2_open, e2=PEN.gap2_extend, band=band, tmax=tmax)
        outs = {}
        for flag in (True, False):
            nw.STREAM_WINDOWS = flag
            jax.clear_caches()
            try:
                outs[flag] = nw.nw_align_with_opcodes(Q, T, qlens, tlens, **kw)
            finally:
                nw.STREAM_WINDOWS = True
        jax.clear_caches()
        np.testing.assert_array_equal(np.asarray(outs[True][0]), np.asarray(outs[False][0]))
        np.testing.assert_array_equal(np.asarray(outs[True][1]), np.asarray(outs[False][1]))


def test_stream_walk_matches_dynamic_slice():
    """The streamed traceback walk (tb rows consumed as reversed scan
    inputs) is opcode- and token-identical to the per-step dynamic-slice
    walk, in both emission modes."""
    import jax

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", np.uint8)
    qs, ts = [], []
    for k in range(6):
        n = int(rng.integers(30, 200))
        q = bases[rng.integers(0, 4, n)]
        t = bytearray(q.tobytes())
        for pos in rng.integers(0, n, size=max(n // 15, 1)):
            t[pos % len(t)] = bases[rng.integers(0, 4)]
        if k % 2:
            del t[10:14]
        qs.append(q)
        ts.append(np.frombuffer(bytes(t), np.uint8))
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    kw = dict(mismatch=PEN.mismatch, o1=PEN.gap1_open, e1=PEN.gap1_extend,
              o2=PEN.gap2_open, e2=PEN.gap2_extend, band=63,
              tmax=int((qlens + tlens).max()))
    outs = {}
    for flag in (True, False):
        nw.STREAM_WALK = flag
        jax.clear_caches()
        try:
            s, o = nw.nw_align_with_opcodes(Q, T, qlens, tlens, **kw)
            sr, tok, cnt = nw.nw_align_with_runs(Q, T, qlens, tlens, **kw)
            outs[flag] = tuple(np.asarray(a) for a in (s, o, sr, tok, cnt))
        finally:
            nw.STREAM_WALK = True
    jax.clear_caches()
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(a, b)


def test_v3_single_piece_and_tiny_band():
    """v3 parity in single-piece mode and with band wider than sequences."""
    pairs = [(b"ACGTACGT", b"ACGTTACGT"), (b"A", b"G"), (b"ACACAC", b"ACACAC")]
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    tmax = int((qlens + tlens).max())
    for band in (2, 15, 64):
        kw = dict(mismatch=1, o1=1, e1=1, o2=-1, e2=-1, band=band, tmax=tmax)
        s1, o1_ = nw.nw_align_with_opcodes(Q, T, qlens, tlens, impl="v1", **kw)
        s3, o3_ = nw.nw_align_with_opcodes(Q, T, qlens, tlens, impl="v3", **kw)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))
        np.testing.assert_array_equal(np.asarray(o1_), np.asarray(o3_))


# -----------------------------------------------------------------------------
# Row-major (v4) kernel
# -----------------------------------------------------------------------------


def _pack_for_rows(pairs_raw):
    qs = [encode_bases(q) for q, _ in pairs_raw]
    ts = [encode_bases(t) for _, t in pairs_raw]
    lq = max(max(q.size for q in qs), 1)
    lt = max(max(t.size for t in ts), 1)
    Q = np.stack([np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    return Q, T, qlens, tlens


def _cigar_cost(items, pen):
    """Alignment cost of a resolved CIGAR under two-piece-affine penalties;
    every maximal gap run costs its best single piece (optimal paths never
    pay more, see the v4 design note in ops/nw.py)."""
    cost = 0
    for n, op in items:
        if op == "X":
            cost += n * pen.mismatch
        elif op in "ID":
            c1 = pen.gap1_open + n * pen.gap1_extend
            c2 = (pen.gap2_open + n * pen.gap2_extend) if pen.two_piece else c1
            cost += min(c1, c2)
    return cost


def _rows_align(Q, T, qlens, tlens, pen, band, use_int16=False):
    return nw.nw_align_rows(
        Q, T, qlens, tlens,
        mismatch=pen.mismatch, o1=pen.gap1_open, e1=pen.gap1_extend,
        o2=pen.gap2_open if pen.two_piece else -1,
        e2=pen.gap2_extend if pen.two_piece else -1,
        band=band, use_int16=use_int16,
    )


def _rows_decode(out, b, qlen):
    _, steps_p, grows, gvals, gcount = (np.asarray(a) for a in out)
    steps = nw.unpack_opcodes(steps_p, steps_p.shape[1] * 4)
    return nw.decode_rowtokens(
        steps[b], grows[b], gvals[b], int(gcount[b]), qlen
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rows_matches_v1_scores_and_cigar_cost(seed):
    """v4 scores are bit-identical to v1; v4 CIGARs consume exactly
    (qlen, tlen) and cost exactly the reported score (co-optimal CIGARs may
    differ from v1's in tie cases — both are optimal)."""
    rng = np.random.default_rng(300 + seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs_raw = []
    for b in range(6):
        n = int(rng.integers(1, 300))
        q = bases[rng.integers(0, 4, n)]
        t = bytearray(q.tobytes())
        for pos in rng.integers(0, max(n, 1), size=max(n // 12, 1)):
            t[pos % len(t)] = bases[rng.integers(0, 4)]
        for _ in range(int(rng.integers(0, 3))):
            pos = int(rng.integers(0, max(len(t) - 5, 1)))
            ln = int(rng.integers(1, 12))
            if rng.random() < 0.5 and len(t) > ln + 2:
                del t[pos : pos + ln]
            else:
                t[pos:pos] = bases[rng.integers(0, 4, ln)].tobytes()
        pairs_raw.append((q.tobytes(), bytes(t)))
    pairs_raw.append((b"", b""))  # dummy
    Q, T, qlens, tlens = _pack_for_rows(pairs_raw)
    tmax = int((qlens + tlens).max())
    kw = dict(mismatch=PEN.mismatch, o1=PEN.gap1_open, e1=PEN.gap1_extend,
              o2=PEN.gap2_open, e2=PEN.gap2_extend, band=64, tmax=tmax)
    s1, _ = nw.nw_align_with_opcodes(Q, T, qlens, tlens, impl="v1", **kw)
    s1 = np.where(qlens + tlens == 0, 0, np.asarray(s1))
    for use_int16 in (False, True):
        out = _rows_align(Q, T, qlens, tlens, PEN, band=64, use_int16=use_int16)
        s4 = np.asarray(out[0])
        np.testing.assert_array_equal(s1, s4)
        for b, (qr, tr) in enumerate(pairs_raw):
            items = _rows_decode(out, b, int(qlens[b]))
            items = nw.resolve_matches(items, encode_bases(qr), encode_bases(tr))
            qc = sum(n for n, op in items if op in "=XI")
            tc = sum(n for n, op in items if op in "=XD")
            assert (qc, tc) == (int(qlens[b]), int(tlens[b])), f"pair {b}"
            assert _cigar_cost(items, PEN) == int(s4[b]), f"pair {b}"


def test_rows_edge_cases():
    """Leading/trailing/pure gaps, single bases, identical pairs,
    single-piece penalties."""
    cases = [
        (b"C", b"XXC"), (b"A", b"AXX"), (b"", b"ACGT"), (b"ACGT", b""),
        (b"A", b"G"), (b"ACACAC", b"ACACAC"), (b"ACGT", b"ACGT"),
        (b"AAAA", b"AATAAA"), (b"AATAAA", b"AAAA"),
    ]
    for pen in (PEN, PEN1):
        Q, T, qlens, tlens = _pack_for_rows(cases)
        tmax = int((qlens + tlens).max())
        kw = dict(mismatch=pen.mismatch, o1=pen.gap1_open, e1=pen.gap1_extend,
                  o2=pen.gap2_open if pen.two_piece else -1,
                  e2=pen.gap2_extend if pen.two_piece else -1,
                  band=16, tmax=tmax)
        s1, _ = nw.nw_align_with_opcodes(Q, T, qlens, tlens, impl="v1", **kw)
        s1 = np.asarray(s1)
        out = _rows_align(Q, T, qlens, tlens, pen, band=16)
        s4 = np.asarray(out[0])
        np.testing.assert_array_equal(s1, s4)
        for b, (qr, tr) in enumerate(cases):
            items = _rows_decode(out, b, int(qlens[b]))
            items = nw.resolve_matches(items, encode_bases(qr), encode_bases(tr))
            qc = sum(n for n, op in items if op in "=XI")
            tc = sum(n for n, op in items if op in "=XD")
            assert (qc, tc) == (int(qlens[b]), int(tlens[b])), (pen, b, items)
            assert _cigar_cost(items, pen) == int(s4[b]), (pen, b, items)


def test_rows_against_dp_oracle():
    """v4 scores equal the O(nm) reference DP on small random pairs."""
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pairs_raw = []
    for _ in range(8):
        n = int(rng.integers(1, 40))
        m = int(rng.integers(1, 40))
        pairs_raw.append(
            (bases[rng.integers(0, 4, n)].tobytes(),
             bases[rng.integers(0, 4, m)].tobytes())
        )
    Q, T, qlens, tlens = _pack_for_rows(pairs_raw)
    out = _rows_align(Q, T, qlens, tlens, PEN, band=48)
    s4 = np.asarray(out[0])
    for b, (qr, tr) in enumerate(pairs_raw):
        oracle = wfa.affine2p_score_dp(encode_bases(qr), encode_bases(tr), PEN)
        assert int(s4[b]) == oracle, f"pair {b}"


def test_rows_gap_overflow_falls_back():
    """A pair with more D-runs than GAP_MAX retries on the anti-diagonal
    kernel through the runner and still aligns exactly."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(5)
    bases = b"ACGT"
    q = bytearray()
    t = bytearray()
    # one 1-base deletion per 40-base block: merging runs across a block
    # costs 40 mismatches (200) to save one open (<= 23) — never optimal,
    # so the optimal CIGAR keeps GAP_MAX + 40 separate D-runs
    for _ in range(nw.GAP_MAX + 40):
        block = bytes(bases[rng.integers(0, 4)] for _ in range(40))
        q += block
        t += block + bytes([bases[rng.integers(0, 4)]])
    seqs = make_sequence_set([("q", bytes(q)), ("t", bytes(t))])
    cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), sweep="rows")
    al = WfaAligner(seqs, cfg)
    res = al.align_pairs(np.array([[0, 1]]))
    assert len(res) == 1
    assert al.stats["gap_overflows"] >= 1
    qc = sum(n for n, op in res[0].cigar if op in "=XI")
    tc = sum(n for n, op in res[0].cigar if op in "=XD")
    assert (qc, tc) == (len(q), len(t))


def test_runner_rows_vs_antidiag_scores_identical():
    """Both sweeps produce identical scores and valid CIGARs through the
    runner on a small SNP/indel workload."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    base = bases[rng.integers(0, 4, 400)]
    named = [("s0", base.tobytes())]
    for k in range(1, 4):
        v = bytearray(base.tobytes())
        for pos in rng.integers(0, len(v), 8):
            v[pos] = bases[rng.integers(0, 4)]
        del v[100 + k : 108 + k]
        named.append((f"s{k}", bytes(v)))
    seqs = make_sequence_set(named)
    pairs = np.array([(i, j) for i in range(4) for j in range(4) if i != j])
    results = {}
    for sweep in ("antidiag", "rows"):
        cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), sweep=sweep)
        res = WfaAligner(seqs, cfg).align_pairs(pairs)
        results[sweep] = {(r.query_idx, r.target_idx): r for r in res}
    assert results["antidiag"].keys() == results["rows"].keys()
    for key, ra in results["antidiag"].items():
        rr = results["rows"][key]
        assert ra.score == rr.score, key
        for r in (ra, rr):
            qlen = len(named[r.query_idx][1])
            tlen = len(named[r.target_idx][1])
            qc = sum(n for n, op in r.cigar if op in "=XI")
            tc = sum(n for n, op in r.cigar if op in "=XD")
            assert (qc, tc) == (qlen, tlen), key


@pytest.mark.parametrize("seed", range(3))
def test_decode_batch_matches_per_pair(seed):
    """The vectorized whole-batch decode equals per-pair decode_opcodes +
    resolve_matches on kernel-produced opcode streams."""
    rng = np.random.default_rng(500 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(7):
        base = bases[rng.integers(0, 4, size=80 + 10 * k)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=5):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 2:
            del alt[30 : 30 + k]
        if k % 3 == 1:
            alt[60:60] = bases[rng.integers(0, 4, size=k)].tobytes()
        pairs.append((base, bytes(alt)))
    pairs.append((b"ACGT", b"ACGT"))  # trivial all-match row
    scores, tb, ql, tl = run_nw(pairs, PEN, band=32)
    ops_packed = nw.traceback_scan_device(
        np.asarray(tb), ql, tl, band=32, tmax=tb.shape[1] - 1
    )
    ops = nw.unpack_opcodes(ops_packed, np.asarray(ops_packed).shape[1] * 4)
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    batch = nw.decode_batch(ops, qs, ts)
    for b, (q, t) in enumerate(pairs):
        ref = nw.resolve_matches(nw.decode_opcodes(ops[b]), qs[b], ts[b])
        assert batch[b] == ref, f"pair {b}"
        check_cigar(batch[b], q, t)


def test_decode_batch_empty_rows():
    """All-none rows decode to empty item lists; mixed batches keep row
    boundaries (no run bleeds across rows)."""
    ops = np.zeros((3, 12), np.uint8)
    ops[0, :4] = [nw.OP_M, nw.OP_M, nw.OP_I, nw.OP_D]
    # row 1 all none; row 2 starts with the same op row 0 ended with
    ops[2, :3] = [nw.OP_D, nw.OP_M, nw.OP_M]
    q0 = encode_bases(b"ACG")
    t0 = encode_bases(b"ACT")
    q2 = encode_bases(b"GG")
    t2 = encode_bases(b"AGG")
    batch = nw.decode_batch(
        ops, [q0, encode_bases(b"A"), q2], [t0, encode_bases(b"A"), t2]
    )
    assert batch[0] == [(2, "="), (1, "I"), (1, "D")]
    assert batch[1] == []
    assert batch[2] == [(1, "D"), (2, "=")]


# -----------------------------------------------------------------------------
# Bidirectional fold (nw_align_fold)
# -----------------------------------------------------------------------------


def run_fold(pairs, kw, band, use_int16=False):
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    B = len(pairs)
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Qf = np.full((B, lq), nw.QPAD, np.uint8)
    Tf = np.full((B, lt), nw.TPAD, np.uint8)
    Qr = np.full((B, lq), nw.QPAD, np.uint8)
    Tr = np.full((B, lt), nw.TPAD, np.uint8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b, (q, t) in enumerate(zip(qs, ts)):
        Qf[b, : q.size] = q
        Tf[b, : t.size] = t
        Qr[b, : q.size] = q[::-1]
        Tr[b, : t.size] = t[::-1]
        qlens[b] = q.size
        tlens[b] = t.size
    tmax = int((qlens + tlens).max())
    s_ref, _ = nw.nw_align_with_opcodes(
        Qf, Tf, qlens, tlens, band=band, tmax=tmax, use_int16=use_int16, **kw
    )
    s_fold, packed2, cross_m = nw.nw_align_fold(
        Qf, Tf, Qr, Tr, qlens, tlens, band=band, tmax_half=tmax // 2 + 2,
        use_int16=use_int16, **kw,
    )
    ops2 = nw.unpack_opcodes(np.asarray(packed2), np.asarray(packed2).shape[1] * 4)
    merged = nw.merge_fold_ops(ops2, np.asarray(cross_m))
    items = nw.decode_batch(merged, qs, ts)
    return np.asarray(s_ref), np.asarray(s_fold), items


def assert_fold_matches(pairs, kw, band, use_int16=False):
    s_ref, s_fold, items_all = run_fold(pairs, kw, band, use_int16)
    assert (s_fold == s_ref).all(), (s_ref, s_fold)
    pen = Penalties(
        kw["mismatch"], kw["o1"], kw["e1"],
        kw["o2"] if kw["o2"] >= 0 else None,
        kw["e2"] if kw["e2"] >= 0 else None,
    )
    for b, (q, t) in enumerate(pairs):
        check_cigar(items_all[b], q, t)
        assert cigar_score(items_all[b], pen) == s_fold[b], b


KW2 = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)


@pytest.mark.parametrize("seed", range(3))
def test_fold_random_battery(seed):
    """Fold scores equal the single sweep on randomized SNP/indel pairs of
    mixed lengths, and the merged half-walk CIGARs are valid with cost ==
    score (both fin parities, gap runs, tiny pairs)."""
    rng = np.random.default_rng(900 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for k in range(16):
        n1 = int(rng.integers(4, 400))
        q = bases[rng.integers(0, 4, size=n1)].tobytes()
        s = bytearray(q)
        for pos in rng.integers(0, max(1, len(s)), size=int(rng.integers(0, 12))):
            s[pos % len(s)] = bases[rng.integers(0, 4)]
        if k % 2:
            cut = int(rng.integers(0, max(1, len(s) // 2)))
            del s[cut : cut + int(rng.integers(0, 60))]
        if k % 3 == 0:
            cut = int(rng.integers(0, max(1, len(s))))
            s[cut:cut] = bases[rng.integers(0, 4, size=int(rng.integers(0, 80)))].tobytes()
        if not s:
            s = bytearray(b"A")
        pairs.append((q, bytes(s)))
    pairs += [(b"ACGT", b"ACGT"), (b"A", b"T"), (b"AC", b"A"), (b"A", b"A")]
    assert_fold_matches(pairs, KW2, band=200)


def test_fold_seam_inside_gap_run():
    """A 200 bp indel spanning the meet anti-diagonal exercises the
    run-open double-payment correction on every crossing family."""
    rng = np.random.default_rng(31)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    A = bases[rng.integers(0, 4, size=100)].tobytes()
    Bseg = bases[rng.integers(0, 4, size=100)].tobytes()
    ins = bases[rng.integers(0, 4, size=200)].tobytes()
    pairs = [
        (A + ins + Bseg, A + Bseg),
        (A + Bseg, A + ins + Bseg),
        (A + ins, A),
        (ins + Bseg, Bseg),
    ]
    assert_fold_matches(pairs, KW2, band=260)
    # single-piece affine and the 0,1,1,1 orientation-probe scoring
    assert_fold_matches(pairs, dict(mismatch=5, o1=6, e1=2, o2=-1, e2=-1), band=260)
    assert_fold_matches(pairs, dict(mismatch=1, o1=0, e1=1, o2=-1, e2=-1), band=260)


def test_fold_int16():
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=250)].tobytes()
    alt = bytearray(base)
    for pos in rng.integers(0, len(alt), size=8):
        alt[pos] = bases[rng.integers(0, 4)]
    del alt[60:75]
    assert_fold_matches([(base, bytes(alt)), (base, base)], KW2, band=128,
                        use_int16=True)


def test_runner_fold_matches_single_sweep():
    """End-to-end runner parity: fold on vs off produces identical scores
    and consuming CIGARs for every pair (orientation + escalation paths)."""
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(5150)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=700)]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    seqs = [("s0", base.tobytes())]
    for k in range(1, 5):
        s = bytearray(base.tobytes())
        for pos in rng.integers(0, len(s), size=14):
            s[pos] = bases[rng.integers(0, 4)]
        if k == 2:
            del s[200:320]  # indel >> band_slack: exercises escalation
        if k == 3:
            s = bytearray(bytes(s).translate(comp)[::-1])  # RC orientation
        seqs.append((f"s{k}", bytes(s)))
    ss = make_sequence_set(seqs)
    pairs = all_ordered_pairs(len(seqs))
    sc = AlignmentScores.parse("0,5,8,2,24,1")
    res = {}
    for fold in (True, False):
        al = WfaAligner(ss, RunnerConfig(scores=sc, fold=fold))
        out = al.align_pairs(pairs)
        assert len(out) == len(pairs)
        res[fold] = {(r.query_idx, r.target_idx): r for r in out}
    for key, r_on in res[True].items():
        r_off = res[False][key]
        assert r_on.score == r_off.score, key
        assert r_on.is_reverse == r_off.is_reverse, key
        for r in (r_on, r_off):
            qlen = len(ss.sequences[r.query_idx].data)
            tlen = len(ss.sequences[r.target_idx].data)
            assert sum(n for n, op in r.cigar if op in "=XI") == qlen, key
            assert sum(n for n, op in r.cigar if op in "=XD") == tlen, key
