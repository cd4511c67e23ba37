"""Embedded graph tests (reference tests/test_embedded_graph.rs semantics)."""

import numpy as np

from seqrush_tpu.graph.bigraph import BidirectedGraph
from seqrush_tpu.graph.embedded import EmbeddedGraph, from_bidirected
from seqrush_tpu.layout.variants import linear_sgd_order, simple_sgd_order


def H(n, r=False):
    return (n << 1) | int(r)


def build_linear():
    e = EmbeddedGraph()
    for i, s in enumerate([b"AC", b"GT", b"CA"], start=1):
        e.add_node(i, s)
    p = e.add_path("p")
    for i in (1, 2, 3):
        e.extend_path(p, i)
    return e


def test_step_navigation():
    e = build_linear()
    assert e.get_next_steps(H(1)) == [H(2)]
    assert e.get_next_steps(H(2)) == [H(3)]
    assert e.get_prev_steps(H(3)) == [H(2)]
    # implied complement traversal
    assert e.get_next_steps(H(3, True)) == [H(2, True)]


def test_perfect_neighbors():
    e = build_linear()
    assert e.are_perfect_neighbors(H(1), H(2))
    assert e.are_perfect_neighbors(H(2), H(3))
    assert not e.are_perfect_neighbors(H(1), H(3))
    pairs = e.find_perfect_pairs()
    assert (H(1), H(2)) in pairs


def test_compaction_preserves_path_sequence():
    e = build_linear()
    before = e.get_path_sequence(0)
    e.compact()
    assert len(e.node_seqs) == 1
    assert e.get_path_sequence(0) == before


def test_branching_blocks_compaction():
    e = EmbeddedGraph()
    for i, s in enumerate([b"A", b"C", b"G"], start=1):
        e.add_node(i, s)
    p1 = e.add_path("p1")
    for i in (1, 2):
        e.extend_path(p1, i)
    p2 = e.add_path("p2")
    for i in (3, 2):
        e.extend_path(p2, i)
    before = [e.get_path_sequence(k) for k in range(2)]
    e.compact()
    assert [e.get_path_sequence(k) for k in range(2)] == before
    assert len(e.node_seqs) == 3  # node 2 has two predecessors


def test_roundtrip_bidirected():
    e = build_linear()
    g = e.to_bidirected()
    e2 = from_bidirected(g)
    assert e2.get_path_sequence(0) == e.get_path_sequence(0)


def test_layout_variants_linear_recovery():
    g = BidirectedGraph()
    rng = np.random.default_rng(1)
    perm = rng.permutation(12) + 1
    for nid in perm:
        g.add_node(int(nid), b"ACGT")
    g.add_path("p", np.array([H(int(x)) for x in perm], dtype=np.int64))
    want = [int(x) for x in perm]
    for fn, iters in ((linear_sgd_order, 100), (simple_sgd_order, 200)):
        got = [h >> 1 for h in fn(g, iterations=iters)]
        # local relaxations should recover the path order (or its reverse)
        assert got == want or got == want[::-1], fn.__name__
