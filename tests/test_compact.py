"""Compaction tests — behavior from the reference suites
(src/compaction_tests.rs, docs/compaction_algorithm.md cases) expressed
against the array implementation."""

import numpy as np

from seqrush_tpu.graph.bigraph import BidirectedGraph
from seqrush_tpu.graph.compact import compact


def H(nid, rev=False):
    return (nid << 1) | int(rev)


def linear_graph(seqs):
    g = BidirectedGraph()
    for i, s in enumerate(seqs, start=1):
        g.add_node(i, s)
    steps = [H(i) for i in range(1, len(seqs) + 1)]
    for a, b in zip(steps, steps[1:]):
        g.add_edge(a, b)
    g.add_path("p", np.array(steps, dtype=np.int64))
    return g


def path_seqs(g):
    return {p.name: g.path_sequence(p).tobytes() for p in g.paths}


def test_simple_linear_chain():
    g = linear_graph([b"A", b"C", b"G", b"T"])
    before = path_seqs(g)
    compact(g)
    assert g.node_count() == 1
    seq = next(iter(g.nodes.values()))
    assert seq.tobytes() == b"ACGT"
    assert path_seqs(g) == before
    assert len(g.edges) == 0


def test_branching_blocks_merge():
    # 1 -> 2 -> 4 and 1 -> 3 -> 4 (a bubble): nothing fully linear
    g = BidirectedGraph()
    for i, s in enumerate([b"A", b"C", b"G", b"T"], start=1):
        g.add_node(i, s)
    g.add_edge(H(1), H(2))
    g.add_edge(H(1), H(3))
    g.add_edge(H(2), H(4))
    g.add_edge(H(3), H(4))
    g.add_path("p1", np.array([H(1), H(2), H(4)], dtype=np.int64))
    g.add_path("p2", np.array([H(1), H(3), H(4)], dtype=np.int64))
    before = path_seqs(g)
    compact(g)
    assert path_seqs(g) == before
    # bubble interior can't merge with shared ends
    assert g.node_count() == 4


def test_partial_chain_merges():
    # 1 -> 2 -> 3 -> 4, with a second path entering at 3: only 1-2 merges
    g = BidirectedGraph()
    for i, s in enumerate([b"AA", b"CC", b"GG", b"TT", b"NN"], start=1):
        g.add_node(i, s)
    g.add_path("p1", np.array([H(1), H(2), H(3), H(4)], dtype=np.int64))
    g.add_path("p2", np.array([H(5), H(3), H(4)], dtype=np.int64))
    g.verify_path_edges()
    before = path_seqs(g)
    compact(g)
    assert path_seqs(g) == before
    # {1,2} merge; {3,4} merge; 5 stays
    assert g.node_count() == 3


def test_reverse_traversal_chain():
    # path p1 goes 1+ 2+; path p2 traverses the chain in reverse: 2- 1-
    g = BidirectedGraph()
    g.add_node(1, b"AC")
    g.add_node(2, b"GT")
    g.add_path("p1", np.array([H(1), H(2)], dtype=np.int64))
    g.add_path("p2", np.array([H(2, True), H(1, True)], dtype=np.int64))
    g.verify_path_edges()
    before = path_seqs(g)
    compact(g)
    assert path_seqs(g) == before
    assert g.node_count() == 1
    (nid,) = g.nodes
    # p1 forward: ACGT; p2 is its reverse complement
    assert g.nodes[nid].tobytes() in (b"ACGT", b"ACGT"[::-1].translate(bytes.maketrans(b"ACGT", b"TGCA")))


def test_mid_chain_path_start_blocks():
    # p2 starts in the middle of p1's chain -> break at that node
    g = BidirectedGraph()
    for i, s in enumerate([b"A", b"C", b"G"], start=1):
        g.add_node(i, s)
    g.add_path("p1", np.array([H(1), H(2), H(3)], dtype=np.int64))
    g.add_path("p2", np.array([H(2), H(3)], dtype=np.int64))
    g.verify_path_edges()
    before = path_seqs(g)
    compact(g)
    assert path_seqs(g) == before
    # 1 stays alone; 2-3 merge
    assert g.node_count() == 2


def test_repeated_chain_occurrence():
    # path visits the chain twice: 1 2 1 2 — both occurrences replaced
    g = BidirectedGraph()
    g.add_node(1, b"A")
    g.add_node(2, b"C")
    g.add_path("p", np.array([H(1), H(2), H(1), H(2)], dtype=np.int64))
    g.verify_path_edges()
    before = path_seqs(g)
    compact(g)
    assert path_seqs(g) == before


def test_identical_12bp_to_one_node():
    """3 identical 12 bp seqs: 12 1bp nodes -> 1 compacted node
    (doc/ALGORITHM_COMPARISON.md:57)."""
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU
    from seqrush_tpu.sequences import make_sequence_set

    seq = b"ACGTACGTTGCA"
    seqs = make_sequence_set([(f"s{i}", seq) for i in range(3)])
    sr = SeqRushTPU(seqs, Args(no_sort=True, output="/tmp/c.gfa"))
    sr.align_and_unite()
    graph = sr.write_gfa()
    assert graph.node_count() == 1
    assert sr.validate_paths_match_sequences(graph) == []
