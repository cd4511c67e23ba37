"""Grooming (the 'g' phase of Ygs): remove spurious inverting links.

Behavioral port of the reference's ODGI-style BFS groom (/root/reference/
src/groom.rs:49-313, 613-685):

* seeds = head nodes (fallback: lowest node id, forward);
* BFS follows stored edges whose ``from`` equals the current handle exactly
  (no implied complements), in sorted edge order;
* first visit wins: a node reached via its reverse orientation is flipped;
* apply = reverse-complement flipped node sequences and XOR orientations in
  edges and path steps; node order is unchanged (reorder=False in Ygs).
"""

from __future__ import annotations

from collections import deque

from .bigraph import BidirectedGraph


def groom_order(graph: BidirectedGraph) -> list[int]:
    """Returns handles in current node order with flip bits set for nodes
    whose first visit was via reverse orientation."""
    # sorted outgoing adjacency on stored edges (groom.rs:285-291)
    out_adj: dict[int, list[int]] = {}
    for (f, t) in sorted(graph.edges):
        out_adj.setdefault(f, []).append(t)

    visited: set[int] = set()
    flipped: set[int] = set()

    seeds = graph.find_head_nodes()
    if not seeds and graph.nodes:
        seeds = [min(graph.nodes) << 1]

    all_ids = sorted(graph.nodes)
    current_seeds = list(seeds)
    while len(visited) < len(all_ids):
        if not current_seeds:
            for nid in all_ids:
                if nid not in visited:
                    current_seeds = [nid << 1]  # forward, like ODGI
                    break
            if not current_seeds:
                break
        _bfs(current_seeds, out_adj, visited, flipped)
        current_seeds = []

    return [
        (nid << 1) | 1 if nid in flipped else (nid << 1) for nid in all_ids
    ]


def _bfs(seeds, out_adj, visited, flipped) -> None:
    queue = deque()
    for seed in seeds:
        nid = seed >> 1
        if nid not in visited:
            queue.append(seed)
            visited.add(nid)
            if seed & 1:
                flipped.add(nid)
    while queue:
        current = queue.popleft()
        for nxt in out_adj.get(current, ()):
            nid = nxt >> 1
            if nid not in visited:
                visited.add(nid)
                if nxt & 1:
                    flipped.add(nid)
                queue.append(nxt)


def apply_grooming(graph: BidirectedGraph, groomed_handles: list[int]) -> None:
    """Flip the marked nodes (groom.rs apply_grooming_with_reorder,
    reorder=False as used by Ygs)."""
    flips = {h >> 1 for h in groomed_handles if h & 1}
    graph.flip_nodes(flips)


def groom(graph: BidirectedGraph) -> None:
    apply_grooming(graph, groom_order(graph))
