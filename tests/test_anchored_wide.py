"""Anchored piecewise route for wide-band (divergent) pairs.

The route (align/anchored.py) replaces the monster-band sweep for pairs
whose certified band exceeds RunnerConfig.wide_band_threshold: exact-match
minimizer chain + exact DP on the inter-anchor windows + stitch.  These
tests are the DP-oracle checks the exactness claim rests on (VERDICT r3
next #1): stitched scores must equal the full wide-band route's certified
optimal scores, the verified mode must certify or fall back, and the e2e
GFA must match the full route byte for byte on the bench workload family.
"""

import numpy as np
import pytest

from seqrush_tpu.align import anchored
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
from seqrush_tpu.scores import AlignmentScores
from seqrush_tpu.sequences import make_sequence_set

SCORES = AlignmentScores.parse("0,5,8,2,24,1")


def synth_family(n_seqs=4, length=2304, seed=11, inv_frac=(1 / 3, 2 / 3)):
    """Clone family: ~2% SNPs + indels per haplotype; the last haplotype
    carries a reverse-complemented block (the bench600 wide-pair shape)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=length)]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    out = [("h0", base.tobytes())]
    for k in range(1, n_seqs):
        s = bytearray(base.tobytes())
        for pos in rng.integers(0, len(s), size=int(0.02 * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        for _ in range(rng.integers(2, 5)):
            pos = int(rng.integers(0, len(s) - 50))
            ln = int(rng.integers(1, 25))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        if k == n_seqs - 1:
            a, b = int(len(s) * inv_frac[0]), int(len(s) * inv_frac[1])
            s[a:b] = bytes(s[a:b]).translate(comp)[::-1]
        out.append((f"h{k}", bytes(s)))
    return out


@pytest.fixture(scope="module")
def family():
    seqs = make_sequence_set(synth_family())
    n = len(seqs)
    # pairs with the inversion carrier (wide) + one narrow control pair
    pairs = np.array(
        [[i, n - 1] for i in range(n - 1)]
        + [[n - 1, j] for j in range(n - 1)]
        + [[0, 1]]
    )
    oracle_al = WfaAligner(seqs, RunnerConfig(scores=SCORES, wide_route="full"))
    oracle = {
        (r.query_idx, r.target_idx): r for r in oracle_al.align_pairs(pairs)
    }
    return seqs, pairs, oracle


def test_anchored_scores_equal_dp_oracle(family):
    seqs, pairs, oracle = family
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    res = al.align_pairs(pairs)
    assert al.stats["anchored_pairs"] > 0, "route did not activate"
    assert al.stats["anchored_fallbacks"] == 0
    assert len(res) == len(pairs)
    for r in res:
        o = oracle[(r.query_idx, r.target_idx)]
        assert r.score == o.score, (r.query_idx, r.target_idx, r.score, o.score)
        assert r.is_reverse == o.is_reverse
        # the stitched alignment is a valid global alignment
        q = al.rc_codes[r.query_idx] if r.is_reverse else al.codes[r.query_idx]
        t = al.codes[r.target_idx]
        assert sum(n for n, op in r.cigar if op in "=XI") == q.size
        assert sum(n for n, op in r.cigar if op in "=XD") == t.size


def test_wide_verify_certifies_every_stitch(family):
    seqs, pairs, oracle = family
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES, wide_verify=True))
    res = al.align_pairs(pairs)
    assert al.stats["wide_verified"] == al.stats["anchored_pairs"] > 0
    for r in res:
        assert r.score == oracle[(r.query_idx, r.target_idx)].score


def test_verify_falls_back_on_suboptimal_stitch(family, monkeypatch):
    """A stitch that fails score verification must re-run the full wide
    route and still deliver the certified-optimal result."""
    seqs, pairs, oracle = family
    real_stitch = anchored.stitch

    def bad_stitch(plan, witems):
        items, nq, nt = real_stitch(plan, witems)
        # corrupt: turn the first long match run into mismatches (same
        # consumption, strictly worse score)
        for i, (n, op) in enumerate(items):
            if op == "=" and n >= 20:
                items = items[:i] + [(n, "X")] + items[i + 1 :]
                break
        return items, nq, nt

    monkeypatch.setattr(anchored, "stitch", bad_stitch)
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES, wide_verify=True))
    res = al.align_pairs(pairs)
    assert al.stats["wide_verified"] == 0  # every stitch failed
    assert len(res) == len(pairs)
    for r in res:
        assert r.score == oracle[(r.query_idx, r.target_idx)].score


def test_fallback_when_no_usable_chain():
    """Unrelated random pairs (no shared minimizers) must fall back to the
    full wide route and still produce the oracle result."""
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = make_sequence_set(
        [
            (f"r{k}", bases[rng.integers(0, 4, size=2304)].tobytes())
            for k in range(2)
        ]
    )
    pairs = np.array([[0, 1]])
    oracle = WfaAligner(
        seqs, RunnerConfig(scores=SCORES, wide_route="full")
    ).align_pairs(pairs)
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    res = al.align_pairs(pairs)
    assert al.stats["anchored_fallbacks"] >= 1
    assert al.stats["anchored_pairs"] == 0
    assert len(res) == len(oracle) == 1
    assert res[0].score == oracle[0].score


def test_small_pairs_do_not_route():
    """Pairs under wide_min_len keep the direct wide-band semantics."""
    fam = synth_family(n_seqs=2, length=900, seed=3)
    seqs = make_sequence_set(fam)
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    al.align_pairs(np.array([[0, 1]]))
    assert al.stats["anchored_pairs"] == 0


def test_rc_wide_pair_routes_and_matches_oracle():
    """A pair whose best orientation is RC *and* carries an inverted block
    exercises the rc=True anchored path."""
    fam = synth_family(n_seqs=3, length=2304, seed=23)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    # h2 (inversion carrier), fully reverse-complemented
    fam[2] = ("h2rc", fam[2][1].translate(comp)[::-1])
    seqs = make_sequence_set(fam)
    pairs = np.array([[0, 2], [2, 1]])
    oracle = {
        (r.query_idx, r.target_idx): r
        for r in WfaAligner(
            seqs, RunnerConfig(scores=SCORES, wide_route="full")
        ).align_pairs(pairs)
    }
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    res = al.align_pairs(pairs)
    assert al.stats["anchored_pairs"] > 0
    for r in res:
        o = oracle[(r.query_idx, r.target_idx)]
        assert (r.score, r.is_reverse) == (o.score, o.is_reverse)


def test_e2e_graph_equivalent_between_routes(tmp_path):
    """Same scores, same graph shape.  The two routes may tie-break a
    sliding gap differently (e.g. '133= 24D 52=' vs '132= 24D 53=' inside a
    repeat — both exactly optimal; the same class of difference exists
    between the nw and wfa kernels), so byte equality is not required;
    node/edge/path counts and full structural validity are.  On the bench
    workload itself (synth_hla 3.3 kb, seed 7) the GFA happens to be
    byte-identical between routes."""
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU

    counts = {}
    for route in ("anchored", "full"):
        seqs = make_sequence_set(synth_family())
        out = str(tmp_path / f"{route}.gfa")
        sr = SeqRushTPU(seqs, Args(output=out, wide_route=route, no_sort=True))
        sr.align_and_unite()
        g = sr.write_gfa()  # hard-fails unless every path reconstructs
        assert g.comprehensive_verify() == []
        counts[route] = (g.node_count(), len(g.edges), len(g.paths))
    assert counts["anchored"] == counts["full"]


def test_max_excursion_and_cost_helpers():
    items = [(10, "="), (3, "I"), (2, "X"), (5, "D"), (4, "=")]
    # diagonal walks -3 then back to +2
    assert anchored.max_excursion(items) == 3
    from seqrush_tpu.ops.wfa import Penalties

    pen = Penalties(5, 8, 2, 24, 1)
    # 2 mismatches + I3 (min(8+6, 24+3)=14) + D5 (min(8+10,24+5)=18)
    assert anchored.cigar_cost(items, pen) == 10 + 14 + 18


def test_chain_jobs_native_matches_python_fallback(family, monkeypatch):
    """chain_jobs' one-call C++ path and its no-toolchain python fallback
    must produce identical per-job runs."""
    from seqrush_tpu.align import anchored

    seqs, pairs, _oracle = family
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    n = len(seqs)
    jobs = [(p, False, 1279, True) for p in range(len(pairs))]
    native_runs = anchored.chain_jobs(al, jobs, pairs)

    import seqrush_tpu.align.anchored as anch_mod

    def no_native(*a, **kw):
        raise ImportError("forced fallback")

    monkeypatch.setattr(
        "seqrush_tpu.native.chain_pairs_native", no_native, raising=True
    )
    py_runs = anchored.chain_jobs(al, jobs, pairs)
    assert len(native_runs) == len(py_runs)
    for a, b in zip(native_runs, py_runs):
        assert list(map(tuple, a)) == list(map(tuple, b))


def test_paf_roundtrip_with_wide_pairs(tmp_path):
    """PAF written from anchored wide-pair alignments (big I/D runs) must
    replay to a byte-identical graph — the checkpoint path carries the
    route's gap-heavy CIGARs faithfully."""
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU

    fam = synth_family()
    paf = str(tmp_path / "aln.paf")
    out1 = str(tmp_path / "direct.gfa")
    sr = SeqRushTPU(
        make_sequence_set(fam),
        Args(output=out1, output_alignments=paf, no_sort=True),
    )
    sr.align_and_unite()
    sr.write_gfa()

    out2 = str(tmp_path / "replayed.gfa")
    sr2 = SeqRushTPU(
        make_sequence_set(fam), Args(output=out2, paf=paf, no_sort=True)
    )
    sr2.align_and_unite()
    sr2.write_gfa()
    assert open(out1).read() == open(out2).read()


def test_bulk_host_core_route_matches_device(family):
    """The latency-scale bulk route (wide_host_total_cells) sends even the
    big inversion cores to the host C++ DP; scores must equal the
    device-core route's (both DP-exact) and host_windows must cover every
    window."""
    from seqrush_tpu.native import get_lib

    if get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    seqs, pairs, oracle = family
    al_host = WfaAligner(
        seqs, RunnerConfig(scores=SCORES, wide_host_total_cells=1 << 30)
    )
    res_host = al_host.align_pairs(pairs)
    al_dev = WfaAligner(
        seqs, RunnerConfig(scores=SCORES, wide_host_total_cells=0)
    )
    res_dev = al_dev.align_pairs(pairs)
    assert al_host.stats["anchored_pairs"] > 0
    assert al_host.stats["host_windows"] >= al_dev.stats["host_windows"]
    by_pair_dev = {(r.query_idx, r.target_idx): r for r in res_dev}
    assert len(res_host) == len(res_dev) == len(pairs)
    for r in res_host:
        o = by_pair_dev[(r.query_idx, r.target_idx)]
        assert r.score == o.score == oracle[(r.query_idx, r.target_idx)].score
        assert r.is_reverse == o.is_reverse


def test_flank_trim_batch_matches_sequential():
    """flank_trim_jobs (one flat comparison across all jobs' gaps) must be
    bit-identical to per-gap _flank_match over randomized run layouts."""
    from seqrush_tpu.align import anchored
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner

    rng = np.random.default_rng(31)
    fam = synth_family(n_seqs=4, length=1500, seed=41)
    seqs = make_sequence_set(fam)
    al = WfaAligner(seqs, RunnerConfig(scores=SCORES))
    pairs = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
    jobs = [(p, bool(p % 2), 255, False) for p in range(len(pairs))]
    runs_per_job = anchored.chain_jobs(al, jobs, pairs)
    flanks = anchored.flank_trim_jobs(al, jobs, pairs, runs_per_job)
    for (p, rc, _b, _f), runs, fl in zip(jobs, runs_per_job, flanks):
        if not runs:
            assert fl is None
            continue
        qi, tj = pairs[p]
        q = al.rc_codes[qi] if rc else al.codes[qi]
        t = al.codes[tj]
        ra = np.asarray(runs, np.int64).reshape(-1, 3)
        gq0 = np.concatenate([[0], ra[:, 0] + ra[:, 2]])
        gt0 = np.concatenate([[0], ra[:, 1] + ra[:, 2]])
        gq1 = np.concatenate([ra[:, 0], [q.size]])
        gt1 = np.concatenate([ra[:, 1], [t.size]])
        for g in range(gq0.size):
            pre, suf = anchored._flank_match(
                q, t, int(gq0[g]), int(gq1[g]), int(gt0[g]), int(gt1[g])
            )
            assert (int(fl[0][g]), int(fl[1][g])) == (pre, suf), (p, rc, g)


def test_anchored_job_cap_routes_banded_and_stays_exact():
    """Above anchored_max_jobs, moderately-wide jobs re-enter the banded
    queue (saturation regime); results must match the uncapped anchored
    route's scores exactly (both DP-exact)."""
    fam = synth_family(n_seqs=4, length=2304, seed=11)
    seqs = make_sequence_set(fam)
    n = len(seqs)
    pairs = np.array([[i, n - 1] for i in range(n - 1)] + [[n - 1, j] for j in range(n - 1)])
    al_cap = WfaAligner(seqs, RunnerConfig(scores=SCORES, anchored_max_jobs=2))
    res_cap = al_cap.align_pairs(pairs)
    al_ref = WfaAligner(seqs, RunnerConfig(scores=SCORES, anchored_max_jobs=0))
    res_ref = al_ref.align_pairs(pairs)
    assert len(res_cap) == len(res_ref) == len(pairs)
    by = {(r.query_idx, r.target_idx): r for r in res_ref}
    for r in res_cap:
        o = by[(r.query_idx, r.target_idx)]
        assert r.score == o.score and r.is_reverse == o.is_reverse
    # the cap actually diverted jobs (fewer anchored pairs than uncapped)
    assert al_cap.stats["anchored_pairs"] < al_ref.stats["anchored_pairs"]
