"""GFA isomorphism comparator tests + reference node-count regression pins.

The comparator backs the north-star check "GFA bit-identical modulo node
IDs" (BASELINE.md); the pins track the reference's documented node-count
facts (/root/reference/doc/ALGORITHM_COMPARISON.md:53-59) on a matched
synthetic workload so compaction quality can't silently regress.
"""

import numpy as np
import pytest

from seqrush_tpu.graph.bigraph import parse_gfa
from seqrush_tpu.tools.isomorphic import isomorphic, isomorphic_gfa

GFA_A = """H\tVN:Z:1.0
S\t1\tACG
S\t2\tT
S\t3\tGG
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
P\tp1\t1+,2+,3+\t*
P\tp2\t1+,3+\t*
"""

# same graph with permuted node IDs (1->7, 2->5, 3->2)
GFA_B = """H\tVN:Z:1.0
S\t7\tACG
S\t5\tT
S\t2\tGG
L\t7\t+\t5\t+\t0M
L\t5\t+\t2\t+\t0M
P\tp1\t7+,5+,2+\t*
P\tp2\t7+,2+\t*
"""

# same graph with node 2 stored strand-flipped (sequence RC'd, steps/edges
# flipped) — still the same bidirected graph
GFA_C = """H\tVN:Z:1.0
S\t1\tACG
S\t2\tA
S\t3\tGG
L\t1\t+\t2\t-\t0M
L\t2\t-\t3\t+\t0M
P\tp1\t1+,2-,3+\t*
P\tp2\t1+,3+\t*
"""

# different: p2 traverses node 2
GFA_D = """H\tVN:Z:1.0
S\t1\tACG
S\t2\tT
S\t3\tGG
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
P\tp1\t1+,2+,3+\t*
P\tp2\t1+,2+,3+\t*
"""


def test_identical_modulo_ids():
    ok, msg = isomorphic_gfa(GFA_A, GFA_B)
    assert ok, msg


def test_strand_flip_invariance():
    ok, msg = isomorphic_gfa(GFA_A, GFA_C)
    assert ok, msg


def test_detects_path_difference():
    ok, msg = isomorphic_gfa(GFA_A, GFA_D)
    assert not ok
    assert "p2" in msg


def test_detects_sequence_difference():
    ok, msg = isomorphic_gfa(GFA_A, GFA_A.replace("S\t2\tT", "S\t2\tC"))
    assert not ok


def test_detects_edge_difference():
    extra = GFA_A + "L\t1\t+\t3\t+\t0M\n"
    ok, msg = isomorphic_gfa(GFA_A, extra)
    assert not ok and "edge" in msg


def test_self_isomorphic_after_reparse():
    g = parse_gfa(GFA_A)
    ok, msg = isomorphic(g, parse_gfa(g.to_gfa_string()))
    assert ok, msg


# ---------------------------------------------------------------------------
# Reference node-count pins (ALGORITHM_COMPARISON.md:53-59 facts)
# ---------------------------------------------------------------------------


def _run(named, **kw):
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU
    from seqrush_tpu.sequences import make_sequence_set

    seqs = make_sequence_set(named)
    args = Args(output="/dev/null", min_match_length=0, **kw)
    sr = SeqRushTPU(seqs, args)
    sr.align_and_unite()
    return sr, sr.build_graph()


def test_three_identical_12bp_compact_to_one():
    """Reference fact: 3 identical 12 bp seqs -> 12 nodes -> 1 compacted
    (matches seqwish; ALGORITHM_COMPARISON.md:57)."""
    from seqrush_tpu.graph.compact import compact

    named = [(f"s{i}", b"ACGTACGTACGT") for i in range(3)]
    sr, g = _run(named)
    assert g.node_count() == 12
    compact(g)
    assert g.node_count() == 1


def test_hla_like_compaction_pins():
    """Matched synthetic 9-seq workload (bench.synth_hla): pin raw and
    compacted node counts as regressions.  Reference scale for comparison:
    9 real HLA seqs -> 5,208 raw -> 1,108 compacted (2.1%-of-raw per-bp
    node density; ALGORITHM_COMPARISON.md:53-59).  Values pinned from the
    current exact aligner; any drift means alignment or compaction changed
    behavior and must be investigated."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import synth_hla
    from seqrush_tpu.graph.compact import compact

    sr, g = _run(synth_hla(n_seqs=5, length=800, seed=7))
    raw = g.node_count()
    compact(g)
    compacted = g.node_count()
    # regression pins (exact values from the certified-exact aligner)
    assert raw == PINNED_RAW, f"raw node count drifted: {raw} != {PINNED_RAW}"
    assert compacted == PINNED_COMPACTED, (
        f"compacted node count drifted: {compacted} != {PINNED_COMPACTED}"
    )
    # sanity vs the reference's documented compaction ratio ballpark
    assert compacted / raw < 0.5


PINNED_RAW = 1192
PINNED_COMPACTED = 164
