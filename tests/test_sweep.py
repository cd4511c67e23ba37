"""Seed-and-extend (sweepga-analog) backend tests: minimizers, anchoring,
chaining, gap fill, full-pipeline validity."""

import numpy as np

from seqrush_tpu.align.pairs import all_ordered_pairs
from seqrush_tpu.align.runner import RunnerConfig
from seqrush_tpu.align.sweep import SweepAligner
from seqrush_tpu.config import Args
from seqrush_tpu.ops import anchors
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.pos import encode_bases
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def test_packed_kmers_exact():
    codes = encode_bases(b"ACGTACGT")
    pos, vals = anchors.packed_kmers(codes, 4)
    assert pos.size == 5
    # ACGT packs to 0b00011011 = 27
    assert vals[0] == 0b00011011
    assert vals[4] == vals[0]  # periodic sequence


def test_kmers_skip_n():
    codes = encode_bases(b"ACGTNACGT")
    pos, vals = anchors.packed_kmers(codes, 4)
    # windows containing N (positions 1-4) are dropped
    assert 1 not in pos and 4 not in pos
    assert 0 in pos and 5 in pos


def test_minimizers_cover():
    codes = encode_bases(rand_seq(500, 0))
    pos, vals = anchors.minimizers(codes, 15, 10)
    assert pos.size >= 500 / 10 * 0.5  # roughly 2/(w+1) density
    gaps = np.diff(pos)
    assert gaps.max() <= 10 + 15  # windows guarantee coverage


def test_anchor_matches_identical():
    codes = encode_bases(rand_seq(300, 1))
    a = anchors.anchor_matches(codes, codes)
    assert a.shape[0] > 0
    assert (a[:, 0] == a[:, 1]).all()  # identical -> diagonal anchors


def test_chain_and_runs():
    codes = encode_bases(rand_seq(300, 2))
    a = anchors.anchor_matches(codes, codes)
    chain = anchors.chain_anchors(a)
    runs = anchors.chain_to_runs(chain, 15)
    # identical sequences should coalesce into few long runs
    assert sum(n for _, _, n in runs) >= 250


def test_sweep_aligner_records():
    base = rand_seq(800, 3)
    alt = bytearray(base)
    for pos in np.random.default_rng(4).integers(0, len(alt), size=8):
        alt[pos] = BASES[np.random.default_rng(int(pos)).integers(0, 4)]
    del alt[400:420]
    seqs = make_sequence_set([("a", base), ("b", bytes(alt))])
    al = SweepAligner(seqs, RunnerConfig())
    res = al.align_pairs(all_ordered_pairs(2))
    assert len(res) == 2
    for r in res:
        q = seqs[r.query_idx].data
        t = seqs[r.target_idx].data
        qi, ti = r.query_start, r.target_start
        for n, op in r.cigar:
            if op == "=":
                assert (q[qi : qi + n] == t[ti : ti + n]).all()
                qi += n
                ti += n
            elif op == "X":
                qi += n
                ti += n
            elif op == "I":
                qi += n
            elif op == "D":
                ti += n
        assert qi <= len(q) and ti <= len(t)


def test_sweepga_pipeline_validates():
    base = rand_seq(600, 5)
    alt = bytearray(base)
    alt[100] = BASES[(alt[100] + 1) % 4]
    del alt[300:310]
    seqs = make_sequence_set([("a", base), ("b", bytes(alt))])
    sr = SeqRushTPU(seqs, Args(aligner="sweepga", no_sort=True, output="/tmp/sw.gfa"))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []
    # most of the sequence united despite seed-and-extend sparsity
    assert g.node_count() < 1.2 * 600


def test_overlapping_anchor_runs_trimmed():
    """Different-diagonal anchor overlaps (repeats) are trimmed so runs never
    overlap on either sequence (regression: overlapping runs produced
    out-of-range unite positions)."""
    chain = np.array([[10, 10], [20, 40], [25, 60]], dtype=np.int64)
    runs = anchors.chain_to_runs(chain, 15)
    for (q0, t0, n0), (q1, t1, n1) in zip(runs[:-1], runs[1:]):
        assert q1 >= q0 + n0 and t1 >= t0 + n0
    # total consumption stays within bounds
    assert all(n > 0 for _, _, n in runs)


def test_filter_one_to_one_semantics():
    """Unit pins of the sweepga FilterConfig analog (sweepga_impl.rs:148-170):
    min_block_length drops short records; the query-axis sweep keeps only
    the best-scoring mapping where two records shadow the same query span."""
    from seqrush_tpu.align.sweep import _Mapping, filter_one_to_one

    # short record: block 40 < 100 -> dropped
    short = _Mapping(0, 0, 1, False, [(0, 0, 40)], qlen=500)
    assert filter_one_to_one([short]) == []

    # two mappings of the SAME query span to different target copies:
    # identical block length, one with more matched bases (higher
    # LogLengthIdentity score) — the sweep must keep exactly the better one
    better = _Mapping(0, 0, 1, False, [(0, 0, 200)], qlen=500)
    worse = _Mapping(0, 0, 1, False, [(0, 300, 80), (120, 420, 80)], qlen=500)
    kept = filter_one_to_one([worse, better])
    assert kept == [better]

    # same query spans but DIFFERENT query sequences: both survive
    other_q = _Mapping(1, 2, 1, False, [(0, 600, 200)], qlen=500)
    kept = filter_one_to_one([better, other_q])
    assert len(kept) == 2


def test_one_to_one_filter_changes_graph():
    """Repeat e2e: a query block matching TWO target copies produces two
    chains; OneToOne keeps one, so the filtered graph unites fewer target
    positions than an unfiltered run (VERDICT r2 #3 'Done' criterion)."""
    import seqrush_tpu.align.sweep as sweep_mod

    R = rand_seq(200, 60)
    spacer = rand_seq(150, 61)
    q = rand_seq(120, 62) + R + rand_seq(120, 63)
    t = spacer + R + spacer + R + spacer  # two identical copies of R

    def run(filtered):
        seqs = make_sequence_set([("q", q), ("t", t)])
        al = SweepAligner(seqs, RunnerConfig())
        if not filtered:
            orig = sweep_mod.filter_one_to_one
            sweep_mod.filter_one_to_one = lambda ms: [
                m for m in ms if m.block_len >= sweep_mod.MIN_BLOCK_LENGTH
            ]
            try:
                res = al.align_pairs(np.array([[0, 1]]))
            finally:
                sweep_mod.filter_one_to_one = orig
        else:
            res = al.align_pairs(np.array([[0, 1]]))
        return res

    unfiltered = run(filtered=False)
    filtered = run(filtered=True)
    # both target copies chain without the filter; OneToOne keeps one
    assert len(unfiltered) >= 2
    assert len(filtered) == 1
    # and the full pipeline stays golden-gated with the filter on
    seqs = make_sequence_set([("q", q), ("t", t)])
    sr = SeqRushTPU(seqs, Args(aligner="sweepga", no_sort=True, output="/tmp/oto.gfa"))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []


def test_frequency_threshold_prunes_repeat_seeds():
    """--frequency (FastGA -f analog, reference seqrush.rs:795-802): a seed
    occurring more than f times in the target index is skipped, shrinking
    the anchor list on repeat-rich pairs; the e2e run stays valid."""
    unit = rand_seq(80, 70)
    q = unit + rand_seq(100, 71)
    t = unit * 6  # every unit k-mer occurs 6x in the target index
    qc, tc = encode_bases(q), encode_bases(t)
    a_all = anchors.anchor_matches(qc, tc, 15, 10)
    a_cut = anchors.anchor_matches(qc, tc, 15, 10, max_freq=2)
    assert a_cut.shape[0] < a_all.shape[0]
    assert a_cut.shape[0] >= 0  # cutoff may drop all repeat seeds

    # wiring: Args.frequency reaches the backend through RunnerConfig
    seqs = make_sequence_set([("a", q + t), ("b", t + q)])
    sr = SeqRushTPU(
        seqs,
        Args(aligner="sweepga", frequency=3, no_sort=True, output="/tmp/freq.gfa"),
    )
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []


def test_multi_chain_covers_rearrangement():
    """A translocated block breaks colinearity: one chain can cover only one
    block, multiple chains (FastGA's multi-record behavior) cover both."""
    A = rand_seq(300, 80)
    B = rand_seq(300, 81)
    spacer = rand_seq(40, 82)
    q = A + spacer + B
    t = B + spacer + A  # blocks swapped
    seqs = make_sequence_set([("q", q), ("t", t)])
    al = SweepAligner(seqs, RunnerConfig())
    res = al.align_pairs(np.array([[0, 1]]))
    # at least two local records for the one pair (A-block and B-block)
    assert len(res) >= 2
    covered = sum(sum(n for n, op in r.cigar if op == "=") for r in res)
    assert covered >= 400  # both blocks contribute matches


def test_gap_fill_opcode_path_matches_runs():
    """The opcode-emission gap fill (RUN_MAX-overflow retry path, also
    forced by emit='ops') produces identical records to the runs path."""
    base = rand_seq(700, 90)
    alt = bytearray(base)
    for pos in np.random.default_rng(91).integers(0, len(alt), size=10):
        alt[pos] = BASES[np.random.default_rng(int(pos)).integers(0, 4)]
    del alt[300:330]
    seqs_named = [("a", base), ("b", bytes(alt))]
    out = {}
    for emit in ("auto", "ops"):
        seqs = make_sequence_set(seqs_named)
        al = SweepAligner(seqs, RunnerConfig(emit=emit))
        res = al.align_pairs(all_ordered_pairs(2))
        out[emit] = [(r.query_idx, r.target_idx, r.score, r.cigar) for r in res]
    assert out["auto"] == out["ops"]


def test_sweep_repeat_heavy_sequences_validate():
    """Repeat-rich sequences (which create different-diagonal anchor
    overlaps) still produce valid graphs through the sweep backend."""
    unit = rand_seq(60, 50)
    s1 = unit * 5
    s2 = (unit * 2) + rand_seq(30, 51) + (unit * 3)
    seqs = make_sequence_set([("a", s1), ("b", s2)])
    sr = SeqRushTPU(seqs, Args(aligner="sweepga", no_sort=True, output="/tmp/rep.gfa"))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []


def test_native_stitch_bit_equality_fuzz():
    """The C++ stitch (native.stitch_records) must be bit-identical to the
    Python stitch across randomized divergence content (SNPs, indels,
    duplications, inversions): same records, scores, CIGARs, starts
    (VERDICT r4 #4)."""
    import pytest

    from seqrush_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")

    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rng = np.random.default_rng(99)
    for trial in range(6):
        L = int(rng.integers(400, 1600))
        base = rand_seq(L, int(rng.integers(1 << 30)))
        named = [("s0", base)]
        for k in range(1, int(rng.integers(3, 6))):
            s = bytearray(base)
            for pos in rng.integers(0, len(s), size=int(rng.uniform(0.005, 0.04) * len(s))):
                s[pos] = BASES[rng.integers(0, 4)]
            for _ in range(int(rng.integers(0, 4))):
                pos = int(rng.integers(0, max(len(s) - 80, 1)))
                ln = int(rng.integers(1, 60))
                if rng.random() < 0.5:
                    del s[pos : pos + ln]
                else:
                    s[pos:pos] = BASES[rng.integers(0, 4, size=ln)].tobytes()
            if rng.random() < 0.3:
                a, b = len(s) // 3, 2 * len(s) // 3
                s[a:b] = bytes(s[a:b]).translate(comp)[::-1]
            named.append((f"s{k}", bytes(s)))
        seqs = make_sequence_set(named)
        pairs = all_ordered_pairs(len(seqs))
        al_n = SweepAligner(seqs, RunnerConfig())
        res_n = al_n.align_pairs(pairs)
        al_p = SweepAligner(seqs, RunnerConfig())
        al_p.force_python_stitch = True
        res_p = al_p.align_pairs(pairs)
        assert len(res_n) == len(res_p)
        for a, b in zip(res_n, res_p):
            assert (
                a.query_idx, a.target_idx, a.is_reverse, a.score,
                a.query_start, a.target_start,
            ) == (
                b.query_idx, b.target_idx, b.is_reverse, b.score,
                b.query_start, b.target_start,
            ), f"trial {trial}"
            assert a.cigar == b.cigar, f"trial {trial}"
