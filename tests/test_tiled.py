"""Band-tiling parity: the mixed-band tiled kernel must be BIT-identical to
running every pair untiled at its own band.

The tiled kernel (ops/nw.py nw_align_with_runs_tiled) merges a narrow band
bucket and a wide band bucket into ONE serial program by giving each wide
pair R = (band_wide+1)/(band+1) consecutive batch rows coupled through
per-anti-diagonal halo columns.  The DP values, tie order, traceback bytes,
and walk are unchanged — so scores, run tokens, counts, and decoded CIGARs
must all match nw_align_with_runs exactly.  Reference contract:
/root/reference/src/wfa.rs:41-75 (exact end-to-end alignment).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from seqrush_tpu.ops import nw

PEN = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)


def _mutate(rng, q, div=0.03, indels=2, max_indel=10, inv_frac=0.0):
    t = list(q)
    for p in rng.integers(0, len(t), max(1, int(div * len(t)))):
        t[int(p)] = int(rng.integers(0, 4))
    for _ in range(indels):
        p = int(rng.integers(0, max(1, len(t) - max_indel)))
        ln = int(rng.integers(1, max_indel + 1))
        if rng.random() < 0.5:
            del t[p : p + ln]
        else:
            t[p:p] = [int(rng.integers(0, 4)) for _ in range(ln)]
    t = np.array(t, np.uint8)
    if inv_frac > 0:
        a = int(len(t) * (0.5 - inv_frac / 2))
        b = int(len(t) * (0.5 + inv_frac / 2))
        t[a:b] = (3 - t[a:b])[::-1]
    return t


def _run_untiled(pairs, band, tmax):
    B = len(pairs)
    Lq = max(len(q) for q, _ in pairs)
    Lt = max(len(t) for _, t in pairs)
    Q = np.full((B, Lq), nw.QPAD, np.uint8)
    T = np.full((B, Lt), nw.TPAD, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for b, (q, t) in enumerate(pairs):
        Q[b, : len(q)] = q
        T[b, : len(t)] = t
        ql[b] = len(q)
        tl[b] = len(t)
    s, tok, cnt = nw.nw_align_with_runs(
        jnp.asarray(Q), jnp.asarray(T), ql, tl, band=band, tmax=tmax, **PEN
    )
    return np.asarray(s), np.asarray(tok), np.asarray(cnt)


def _run_tiled(narrow, wide, band, band_wide, tmax, use_int16=False):
    """Build the tiled row layout (narrow rows, then R consecutive rows per
    wide pair) and run the tiled kernel; returns per-PAIR primary-row
    slices (scores, tokens, counts)."""
    W = band + 1
    R = (band_wide + 1) // W
    rows = [(k, 0, False) for k in range(len(narrow))]
    for k in range(len(wide)):
        rows += [(len(narrow) + k, r, True) for r in range(R)]
    allp = narrow + wide
    B = len(rows)
    Lq = max(len(q) for q, _ in allp)
    Lt = max(len(t) for _, t in allp)
    Q = np.full((B, Lq), nw.QPAD, np.uint8)
    T = np.full((B, Lt), nw.TPAD, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    o_off = np.zeros(B, np.int32)
    is_wide = np.zeros(B, bool)
    hl = np.zeros(B, bool)
    hr = np.zeros(B, bool)
    for b, (pk, r, w) in enumerate(rows):
        q, t = allp[pk]
        Q[b, : len(q)] = q
        T[b, : len(t)] = t
        ql[b] = len(q)
        tl[b] = len(t)
        o_off[b] = r * W
        is_wide[b] = w
        hl[b] = w and r > 0
        hr[b] = w and r < R - 1
    sibf = np.zeros((max(R - 1, 1), B), bool)
    for b, (pk, r, w) in enumerate(rows):
        for k in range(1, R):
            if b + k < B and rows[b + k][0] == pk and rows[b + k][1] == r + k:
                sibf[k - 1, b] = True
    sc, tok, cnt = nw.nw_align_with_runs_tiled(
        jnp.asarray(Q), jnp.asarray(T), ql, tl, o_off, is_wide, hl, hr,
        jnp.asarray(sibf), band=band, band_wide=band_wide, tmax=tmax,
        n_tiles=R, use_int16=use_int16, **PEN,
    )
    prim = [b for b, (pk, r, w) in enumerate(rows) if r == 0]
    return np.asarray(sc)[prim], np.asarray(tok)[prim], np.asarray(cnt)[prim]


def _assert_parity(narrow, wide, band, band_wide, use_int16=False):
    allp = narrow + wide
    tmax = ((max(len(q) + len(t) for q, t in allp) + 511) // 512) * 512
    sc, tok, cnt = _run_tiled(narrow, wide, band, band_wide, tmax, use_int16)
    if narrow:
        s_n, tok_n, cnt_n = _run_untiled(narrow, band, tmax)
        np.testing.assert_array_equal(sc[: len(narrow)], s_n)
        np.testing.assert_array_equal(cnt[: len(narrow)], cnt_n)
        np.testing.assert_array_equal(tok[: len(narrow)], tok_n)
    if wide:
        s_w, tok_w, cnt_w = _run_untiled(wide, band_wide, tmax)
        np.testing.assert_array_equal(sc[len(narrow):], s_w)
        np.testing.assert_array_equal(cnt[len(narrow):], cnt_w)
        np.testing.assert_array_equal(tok[len(narrow):], tok_w)
    # decoded CIGARs equal too (runs decode is pure host code, but this
    # pins the end-to-end contract the runner consumes)
    qs = [q for q, _ in allp]
    ts = [t for _, t in allp]
    items = nw.decode_runs_batch(tok, cnt, qs, ts)
    for (q, t), it in zip(allp, items):
        qc = sum(n for n, op in it if op in "=XI")
        tc = sum(n for n, op in it if op in "=XD")
        assert qc == len(q) and tc == len(t)


def test_tiled_parity_mixed_r3():
    rng = np.random.default_rng(7)
    narrow = []
    for _ in range(6):
        q = rng.integers(0, 4, 240).astype(np.uint8)
        narrow.append((q, _mutate(rng, q)))
    wide = []
    for _ in range(3):
        q = rng.integers(0, 4, 240).astype(np.uint8)
        wide.append((q, _mutate(rng, q, inv_frac=0.3)))
    _assert_parity(narrow, wide, band=63, band_wide=191)


def test_tiled_parity_r2_and_r4():
    rng = np.random.default_rng(11)
    for R in (2, 4):
        narrow = []
        for _ in range(4):
            q = rng.integers(0, 4, 200).astype(np.uint8)
            narrow.append((q, _mutate(rng, q)))
        wide = []
        for _ in range(2):
            q = rng.integers(0, 4, 200).astype(np.uint8)
            wide.append((q, _mutate(rng, q, inv_frac=0.25)))
        _assert_parity(narrow, wide, band=63, band_wide=R * 64 - 1)


def test_tiled_fuzz_small_bands():
    """Small-W fuzz: every fin lane / tile-boundary / length-parity
    combination at band 7 / 23 over random heavily-indeled pairs."""
    rng = np.random.default_rng(23)
    for trial in range(8):
        narrow = []
        for _ in range(3):
            n = int(rng.integers(4, 40))
            q = rng.integers(0, 4, n).astype(np.uint8)
            narrow.append((q, _mutate(rng, q, div=0.1, indels=1, max_indel=3)))
        wide = []
        for _ in range(3):
            n = int(rng.integers(12, 48))
            q = rng.integers(0, 4, n).astype(np.uint8)
            wide.append((q, _mutate(rng, q, div=0.1, indels=2, max_indel=8)))
        _assert_parity(narrow, wide, band=7, band_wide=23)


def test_tiled_fin_lane_on_tile_boundary():
    """Lengths engineered so the final cell's global lane sits at lane 0 /
    W-1 of each tile (the halo-critical extraction cells)."""
    rng = np.random.default_rng(5)
    W, Kn, Kw = 16, 15, 47
    wide = []
    base = rng.integers(0, 4, 120).astype(np.uint8)
    # fin lane = qlen - max((qlen+tlen-Kw+1)//2, 0); sweep qlen-tlen offsets
    for d in range(-34, 35, 4):
        q = base
        t = base[: 120 - abs(d)] if d >= 0 else np.concatenate(
            [base, rng.integers(0, 4, -d).astype(np.uint8)]
        )
        wide.append((q, t))
    _assert_parity([], wide, band=Kn, band_wide=Kw)


def test_tiled_short_pair_inside_wide_chunk():
    """A tiny pair (qlen+tlen < band_wide) rides in a tiled chunk — its
    whole DP happens in P1/P2 where the wide schedule never leaves i0=0."""
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, 9).astype(np.uint8)
    wide = [(q, _mutate(rng, q, div=0.2, indels=1, max_indel=2))]
    n = rng.integers(0, 4, 30).astype(np.uint8)
    narrow = [(n, _mutate(rng, n, div=0.1, indels=1, max_indel=2))]
    _assert_parity(narrow, wide, band=15, band_wide=63)


def test_tiled_int16_parity():
    rng = np.random.default_rng(13)
    narrow = []
    for _ in range(2):
        q = rng.integers(0, 4, 150).astype(np.uint8)
        narrow.append((q, _mutate(rng, q)))
    q = rng.integers(0, 4, 150).astype(np.uint8)
    wide = [(q, _mutate(rng, q, inv_frac=0.3))]
    allp = narrow + wide
    tmax = ((max(len(a) + len(b) for a, b in allp) + 511) // 512) * 512
    sc16, tok16, cnt16 = _run_tiled(narrow, wide, 63, 191, tmax, use_int16=True)
    sc32, tok32, cnt32 = _run_tiled(narrow, wide, 63, 191, tmax, use_int16=False)
    np.testing.assert_array_equal(sc16, sc32)
    np.testing.assert_array_equal(tok16, tok32)
    np.testing.assert_array_equal(cnt16, cnt32)


def test_tiled_rejects_bad_geometry():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 4, 20).astype(np.uint8)
    with pytest.raises(ValueError):
        _run_tiled([(q, q)], [(q, q)], band=8, band_wide=26, tmax=64)


def _bench_like_seqs(n_seqs=8, length=900, seed=7):
    """Miniature of bench.py's synth_hla: one inversion-carrying sample
    forces a wide band bucket next to the narrow SNP/indel bucket."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, length).astype(np.uint8)
    out = [base]
    for k in range(1, n_seqs):
        s = base.copy()
        for p in rng.integers(0, length, int(0.02 * length)):
            s[p] = rng.integers(0, 4)
        if k == n_seqs - 1:
            a, b = length // 3, 2 * length // 3
            s[a:b] = (3 - s[a:b])[::-1]
        out.append(s)
    return out


def test_runner_band_tiling_end_to_end():
    """The production runner with band_tiling='auto' must produce the exact
    AlignmentResults of 'off' while dispatching fewer, merged chunks."""
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    codes = _bench_like_seqs()
    b2a = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = make_sequence_set(
        [(f"s{k}", b2a[c].tobytes()) for k, c in enumerate(codes)]
    )
    pairs = all_ordered_pairs(len(codes))

    def run(tiling):
        # budget scaled so the band buckets split into two chunks (as the
        # bench-scale workload's 2.6 GB budget forces) while the merged
        # tiled chunk still fits
        cfg = RunnerConfig(
            scores=AlignmentScores.parse("0,5,8,2,24,1"),
            threads=2,
            band_tiling=tiling,
            memory_budget_bytes=int(70e6),
        )
        al = WfaAligner(seqs, cfg)
        res = al.align_pairs(pairs)
        return al, res

    al_on, res_on = run("auto")
    al_off, res_off = run("off")
    assert al_on.stats["tiled_chunks"] >= 1, "tiling never engaged"
    assert al_on.stats["tiled_rows"] >= 2
    assert al_off.stats["tiled_chunks"] == 0
    assert len(res_on) == len(res_off) == len(pairs)
    for a, b in zip(res_on, res_off):
        assert (a.query_idx, a.target_idx, a.is_reverse) == (
            b.query_idx, b.target_idx, b.is_reverse
        )
        assert a.score == b.score
        assert a.cigar == b.cigar
