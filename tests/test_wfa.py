"""WFA kernel tests: score optimality vs an O(nm) DP oracle, CIGAR validity,
match-run extraction.  Mirrors the CIGAR-convention pinning tests of the
reference (tests/test_wfa2_cigar_debug.rs, test_cigar_validity.rs)."""

import numpy as np
import pytest

from seqrush_tpu.ops import wfa
from seqrush_tpu.ops.wfa import Penalties
from seqrush_tpu.pos import encode_bases

PEN = Penalties(mismatch=5, gap1_open=8, gap1_extend=2, gap2_open=24, gap2_extend=1)
PEN1 = Penalties(mismatch=1, gap1_open=1, gap1_extend=1)


def run_batch(pairs, pen, smax=200, band=32, keep_history=True, ext_mode="windowed"):
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    Q, T, qlens, tlens = wfa.pack_batch(qs, ts)
    caps = np.full(len(pairs), smax, dtype=np.int32)
    scores, hists = wfa.wfa_align_device(
        Q,
        T,
        qlens,
        tlens,
        caps,
        mismatch=pen.mismatch,
        o1=pen.gap1_open,
        e1=pen.gap1_extend,
        o2=pen.gap2_open if pen.two_piece else -1,
        e2=pen.gap2_extend if pen.two_piece else -1,
        smax=smax,
        band=band,
        keep_history=keep_history,
        ext_mode=ext_mode,
    )
    return np.asarray(scores), {k: np.asarray(v) for k, v in hists.items()}


def check_cigar(cigar_items, q, t):
    """CIGAR consumes exactly the sequences; '=' runs really match; 'X' don't."""
    qi = ti = 0
    for n, op in cigar_items:
        if op == "=":
            assert q[qi : qi + n] == t[ti : ti + n]
            qi += n
            ti += n
        elif op == "X":
            for i in range(n):
                assert q[qi + i] != t[ti + i]
            qi += n
            ti += n
        elif op == "I":
            qi += n
        elif op == "D":
            ti += n
    assert qi == len(q) and ti == len(t)


def cigar_score(cigar_items, pen):
    s = 0
    for n, op in cigar_items:
        if op == "X":
            s += n * pen.mismatch
        elif op in ("I", "D"):
            g1 = pen.gap1_open + n * pen.gap1_extend
            if pen.two_piece:
                g2 = pen.gap2_open + n * pen.gap2_extend
                s += min(g1, g2)
            else:
                s += g1
    return s


def test_identical():
    scores, _ = run_batch([(b"ACGTACGT", b"ACGTACGT")], PEN)
    assert scores[0] == 0


def test_single_mismatch():
    scores, _ = run_batch([(b"ACGTACGT", b"ACGAACGT")], PEN)
    assert scores[0] == PEN.mismatch


def test_single_insertion():
    # query has an extra base
    scores, _ = run_batch([(b"ACGTTACG", b"ACGTACG")], PEN)
    assert scores[0] == PEN.gap1_open + PEN.gap1_extend


def test_long_gap_uses_gap2():
    q = b"ACGTACGTACGT" + b"TTTTTTTTTTTTTTTTTTTTTTTT" + b"GGCCAATT"
    t = b"ACGTACGTACGT" + b"GGCCAATT"
    scores, hists = run_batch([(q, t)], PEN, smax=200, band=40)
    # 24-base insertion: two-piece cost min(8+2*24, 24+1*24) = 48
    assert scores[0] == 48


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
                ins = bases[rng.integers(0, 4, size=int(rng.integers(1, 4)))]
                s[pos:pos] = ins.tobytes()
        return bytes(s)

    base = bases[rng.integers(0, 4, size=60)].tobytes()
    pairs = [(mutate(base), mutate(base)) for _ in range(4)]
    scores, hists = run_batch(pairs, PEN, smax=400, band=40)
    for b, (q, t) in enumerate(pairs):
        dp = wfa.affine2p_score_dp(
            np.frombuffer(q, dtype=np.uint8), np.frombuffer(t, dtype=np.uint8), PEN
        )
        assert scores[b] == dp, f"pair {b}: wfa={scores[b]} dp={dp}"
        # backtrace: valid CIGAR achieving the same score
        items = wfa.backtrace_pair(
            {k: v[b] for k, v in hists.items()}, int(scores[b]), len(q), len(t), 40, PEN
        )
        check_cigar(items, q, t)
        assert cigar_score(items, PEN) == dp


@pytest.mark.parametrize("seed", range(3))
def test_random_vs_dp_single_piece(seed):
    rng = np.random.default_rng(100 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    q = bases[rng.integers(0, 4, size=40)].tobytes()
    t = bases[rng.integers(0, 4, size=44)].tobytes()
    scores, hists = run_batch([(q, t)], PEN1, smax=100, band=48)
    dp = wfa.affine2p_score_dp(
        np.frombuffer(q, dtype=np.uint8), np.frombuffer(t, dtype=np.uint8), PEN1
    )
    assert scores[0] == dp
    items = wfa.backtrace_pair(
        {k: v[0] for k, v in hists.items()}, int(scores[0]), len(q), len(t), 48, PEN1
    )
    check_cigar(items, q, t)
    assert cigar_score(items, PEN1) == dp


def test_score_only_mode_matches():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pairs = []
    for _ in range(3):
        q = bases[rng.integers(0, 4, size=50)].tobytes()
        t = bytearray(q)
        t[10] = bases[(np.frombuffer(q, np.uint8)[10] + 1) % 4]
        pairs.append((q, bytes(t)))
    s_hist, _ = run_batch(pairs, PEN, keep_history=True)
    s_fast, _ = run_batch(pairs, PEN, keep_history=False)
    assert (s_hist == s_fast).all()


def test_match_runs():
    items = [(3, "="), (1, "X"), (2, "="), (2, "I"), (4, "="), (1, "D"), (2, "=")]
    runs = wfa.cigar_match_runs(items)
    assert runs == [(0, 0, 3), (4, 4, 2), (8, 6, 4), (12, 11, 2)]


def test_score_cap_rejects():
    q = b"AAAATTTTCCCCGGGG"
    t = b"TTTTAAAAGGGGCCCC"
    qs, ts = [encode_bases(q)], [encode_bases(t)]
    Q, T, qlens, tlens = wfa.pack_batch(qs, ts)
    scores, _ = wfa.wfa_align_device(
        Q, T, qlens, tlens, np.array([3], dtype=np.int32),
        mismatch=5, o1=8, e1=2, o2=24, e2=1, smax=200, band=16, keep_history=False,
    )
    assert scores[0] == -1


@pytest.mark.parametrize("seed", range(3))
def test_ext_modes_agree(seed):
    """windowed / full / chunked extension modes produce identical scores
    and histories."""
    rng = np.random.default_rng(40 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=700)].tobytes()
    alt = bytearray(base)
    for pos in rng.integers(0, len(alt), size=12):
        alt[pos] = bases[rng.integers(0, 4)]
    del alt[333:341]
    pairs = [(base, bytes(alt)), (base, base), (bytes(alt), base)]
    outs = {}
    for mode in ("windowed", "full", "chunked"):
        outs[mode] = run_batch(pairs, PEN, smax=400, band=64, ext_mode=mode)
    s0, h0 = outs["windowed"]
    for mode in ("full", "chunked"):
        s, h = outs[mode]
        assert (s == s0).all(), mode
        for k in h0:
            assert (h[k] == h0[k]).all(), (mode, k)
