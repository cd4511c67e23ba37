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
