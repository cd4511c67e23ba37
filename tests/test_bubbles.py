"""Bubble-chain final ordering (layout/bubbles.py) — the reference's
documented-but-unbuilt povu proposal (/root/reference/docs/
povu_guided_sorting.md).  Pins the anchor-chain semantics, segment
containment, the no-chain fallback, and the topo_mode="bubble" route."""

import numpy as np

from seqrush_tpu.graph.bigraph import BidirectedGraph
from seqrush_tpu.layout.bubbles import bubble_chain_order
from seqrush_tpu.layout.ygs import YgsParams, ygs_sort


def H(nid, rev=False):
    return (nid << 1) | int(rev)


def _bubble_graph():
    """Anchors 1 -> 3 -> 5 shared once by both paths; a SNP bubble {2, 4}
    between anchors 1 and 3 (path A takes 2, path B takes 4)."""
    g = BidirectedGraph()
    for nid, seq in [(1, b"AAAA"), (2, b"C"), (3, b"GGGG"), (4, b"T"), (5, b"AA")]:
        g.add_node(nid, seq)
    g.add_edge(H(1), H(2))
    g.add_edge(H(2), H(3))
    g.add_edge(H(1), H(4))
    g.add_edge(H(4), H(3))
    g.add_edge(H(3), H(5))
    g.add_path("a", np.array([H(1), H(2), H(3), H(5)], dtype=np.int64))
    g.add_path("b", np.array([H(1), H(4), H(3), H(5)], dtype=np.int64))
    return g


def test_anchor_chain_order_and_bubble_containment():
    order = bubble_chain_order(_bubble_graph())
    assert order is not None
    ids = [h >> 1 for h in order]
    assert sorted(ids) == [1, 2, 3, 4, 5]
    # anchors keep chain order; variant nodes land strictly inside their
    # bubble (between anchors 1 and 3), never past a later anchor
    assert ids.index(1) < ids.index(2) < ids.index(3) < ids.index(5)
    assert ids.index(1) < ids.index(4) < ids.index(3)
    # forward handles only
    assert all(h & 1 == 0 for h in order)


def test_offset_orders_within_segment():
    """Two non-anchor nodes in ONE segment sort by genomic offset from the
    left anchor, regardless of node id."""
    g = BidirectedGraph()
    # path: 1 -> 9 -> 2 -> 5  (9 precedes 2 inside the bubble of 1..5)
    for nid, seq in [(1, b"AAAA"), (9, b"CC"), (2, b"GG"), (5, b"TTTT")]:
        g.add_node(nid, seq)
    g.add_edge(H(1), H(9))
    g.add_edge(H(9), H(2))
    g.add_edge(H(2), H(5))
    g.add_edge(H(1), H(5))
    g.add_path("a", np.array([H(1), H(9), H(2), H(5)], dtype=np.int64))
    g.add_path("b", np.array([H(1), H(5)], dtype=np.int64))
    order = bubble_chain_order(g)
    assert order is not None
    ids = [h >> 1 for h in order]
    assert ids == [1, 9, 2, 5]  # id order would put 2 before 9


def test_no_chain_returns_none():
    """A node repeated within a path is no anchor; with < 2 anchors the
    function declines (callers fall back to the reference topo)."""
    g = BidirectedGraph()
    g.add_node(1, b"AAAA")
    g.add_node(2, b"CC")
    g.add_edge(H(1), H(2))
    g.add_edge(H(2), H(1))
    g.add_path("a", np.array([H(1), H(2), H(1)], dtype=np.int64))
    assert bubble_chain_order(g) is None


def test_majority_vote_picks_dominant_segment():
    """A node seen in two different segments goes to the majority one."""
    g = BidirectedGraph()
    for nid, seq in [(1, b"AAAA"), (2, b"GGGG"), (3, b"TTTT"), (7, b"C")]:
        g.add_node(nid, seq)
    for a, b in [(1, 2), (2, 3), (1, 7), (7, 2), (2, 7), (7, 3)]:
        g.add_edge(H(a), H(b))
    # node 7 once between anchors 1-2 (path a), twice between 2-3 (b, c)
    g.add_path("a", np.array([H(1), H(7), H(2), H(3)], dtype=np.int64))
    g.add_path("b", np.array([H(1), H(2), H(7), H(3)], dtype=np.int64))
    g.add_path("c", np.array([H(1), H(2), H(7), H(3)], dtype=np.int64))
    order = bubble_chain_order(g)
    assert order is not None
    ids = [h >> 1 for h in order]
    assert ids.index(2) < ids.index(7) < ids.index(3)


def test_ygs_topo_mode_bubble_preserves_paths():
    """topo_mode='bubble' through the full Ygs pipeline: golden invariant
    plus sequential ids after the sort."""
    g = _bubble_graph()
    before = {p.name: g.path_sequence(p).tobytes() for p in g.paths}
    params = YgsParams.from_graph(g)
    params.topo_mode = "bubble"
    ygs_sort(g, params)
    after = {p.name: g.path_sequence(p).tobytes() for p in g.paths}
    assert before == after
    assert sorted(g.nodes) == list(range(1, len(g.nodes) + 1))
