"""Range-based (seqwish graph-sequence) node induction tests — behavior
mirrors /root/reference/src/range_builder.rs:39-200."""

import numpy as np

from seqrush_tpu.graph.range_builder import (
    AlignmentRange,
    RangeBasedGraphBuilder,
)


def path_seq(graph, path):
    out = bytearray()
    for h in path.steps:
        nid, rev = int(h) >> 1, int(h) & 1
        seq = bytes(graph.nodes[nid])
        out += seq[::-1] if rev else seq  # forward-only here
    return bytes(out)


def test_no_ranges_one_node_per_sequence():
    b = RangeBasedGraphBuilder()
    b.add_sequence("s1", b"ACGTACGT")
    b.add_sequence("s2", b"TTGG")
    g = b.build_graph()
    # boundaries: 0, 8, 12 (sequence starts/ends only) -> 2 nodes
    assert g.node_count() == 2
    assert [path_seq(g, p) for p in g.paths] == [b"ACGTACGT", b"TTGG"]
    assert len(g.paths[0].steps) == 1 and len(g.paths[1].steps) == 1


def test_range_boundaries_split_nodes():
    b = RangeBasedGraphBuilder()
    b.add_sequence("s1", b"ACGTACGT")
    b.add_alignment_range(AlignmentRange(2, 6, 2, 6, False))
    g = b.build_graph()
    # boundaries 0,2,6,8 -> 3 segments: ACG? no: [0,2)=AC [2,6)=GTAC [6,8)=GT
    assert g.node_count() == 3
    assert bytes(g.nodes[1]) == b"AC"
    assert bytes(g.nodes[2]) == b"GTAC"
    assert bytes(g.nodes[3]) == b"GT"
    assert path_seq(g, g.paths[0]) == b"ACGTACGT"
    # consecutive path steps produce 2 edges
    assert len(g.edges) == 2


def test_paths_reconstruct_with_cross_sequence_ranges():
    b = RangeBasedGraphBuilder()
    b.add_sequence("a", b"ACGTACGTAC")
    b.add_sequence("b", b"ACGTTCGTAC")
    # a[0:5] aligned to b[0:5]: boundaries at 0,5 and 10,15
    b.add_alignment_range(AlignmentRange(0, 5, 10, 15, False))
    b.add_alignment_range(AlignmentRange(10, 15, 0, 5, False))
    g = b.build_graph(verbose=False)
    assert [path_seq(g, p) for p in g.paths] == [b"ACGTACGTAC", b"ACGTTCGTAC"]
    # node ids are dense 1..N ascending by graph-sequence position
    assert g.node_ids() == list(range(1, g.node_count() + 1))


def test_ranges_from_runner_alignments():
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.graph.range_builder import ranges_from_alignments
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    seqs = make_sequence_set([("a", b"ACGTACGTACGTACGT"), ("b", b"ACGTACGAACGTACGT")])
    al = WfaAligner(seqs, RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1")))
    res = al.align_pairs(np.array([[0, 1]]))
    ranges = ranges_from_alignments(res, seqs)
    assert ranges, "SNP pair must produce match-run ranges"
    b = RangeBasedGraphBuilder()
    for name, s in [("a", b"ACGTACGTACGTACGT"), ("b", b"ACGTACGAACGTACGT")]:
        b.add_sequence(name, s)
    for r in ranges:
        b.add_alignment_range(r)
    g = b.build_graph()
    assert [path_seq(g, p) for p in g.paths] == [
        b"ACGTACGTACGTACGT", b"ACGTACGAACGTACGT",
    ]
