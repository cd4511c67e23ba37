"""Exact-ODGI topological ordering (the 's' phase of Ygs).

Line-for-behavior reimplementation of the reference's modified Kahn's
algorithm (/root/reference/src/bidirected_ops.rs:1390-1599), which itself
replicates ``odgi sort`` 's':

* heads (no incoming edges to either orientation) seed the ready set,
  sorted by earliest path position then node id (bidirected_ops.rs:1345-1352);
* the ready set pops the minimum handle (BTreeSet semantics = handle code
  order: node id, then orientation);
* edges are treated exactly as stored (no implied complements), iterated in
  sorted (from, to) order;
* when the ready set drains with nodes left (cycles), seeds discovered during
  traversal are taken in node-id order, then an arbitrary minimum unvisited
  handle (forward before reverse);
* nodes are emitted as forward handles at first visit.

Indexed adjacency replaces the reference's O(V*E) full edge rescans while
preserving identical iteration order.
"""

from __future__ import annotations

import heapq

import numpy as np

from .bigraph import BidirectedGraph


def exact_odgi_topological_order(
    graph: BidirectedGraph,
    use_heads: bool = True,
    use_tails: bool = False,
) -> list[int]:
    if not graph.nodes:
        return []

    edges = sorted(graph.edges)  # (from, to) ascending == reference sort order
    out_adj: dict[int, list[int]] = {}  # from-handle -> edge indices
    in_adj: dict[int, list[int]] = {}  # to-handle -> edge indices
    for idx, (f, t) in enumerate(edges):
        out_adj.setdefault(f, []).append(idx)
        in_adj.setdefault(t, []).append(idx)
    masked = np.zeros(len(edges), dtype=bool)
    in_count = {h: len(v) for h, v in in_adj.items()}  # unmasked incoming per handle

    sorted_out: list[int] = []
    visited_nodes: set[int] = set()
    unvisited: set[int] = set()
    for nid in graph.nodes:
        unvisited.add(nid << 1)
        unvisited.add((nid << 1) | 1)

    ready: list[int] = []  # heap of handles (BTreeSet min-pop)
    in_ready: set[int] = set()
    seeds: list[int] = []

    def push_ready(h: int) -> None:
        if h not in in_ready:
            heapq.heappush(ready, h)
            in_ready.add(h)
        unvisited.discard(h)
        unvisited.discard(h ^ 1)

    if use_heads:
        for h in graph.find_head_nodes():
            push_ready(h)
    elif use_tails:
        for h in graph.find_tail_nodes():
            push_ready(h)

    while unvisited or ready:
        if not ready:
            # break into a cycle: seeds in (node id, orientation) order first
            found = False
            if seeds:
                seeds.sort(key=lambda h: (h >> 1, h & 1))
                h = seeds.pop(0)
                if h in unvisited:
                    push_ready(h)
                    found = True
            if not found and not ready and unvisited:
                h = min(unvisited, key=lambda x: (x >> 1, x & 1))
                push_ready(h)

        while ready:
            handle = heapq.heappop(ready)
            in_ready.discard(handle)

            nid = handle >> 1
            if nid not in visited_nodes:
                visited_nodes.add(nid)
                sorted_out.append(nid << 1)  # emit forward orientation

            # mask incoming edges of this handle
            for idx in in_adj.get(handle, ()):  # already in sorted edge order
                if not masked[idx]:
                    masked[idx] = True
                    in_count[handle] -= 1

            # follow outgoing edges
            for idx in out_adj.get(handle, ()):
                if masked[idx]:
                    continue
                masked[idx] = True
                nxt = edges[idx][1]
                in_count[nxt] -= 1
                if nxt in unvisited:
                    if in_count.get(nxt, 0) <= 0:
                        push_ready(nxt)
                    else:
                        if nxt not in seeds:
                            seeds.append(nxt)

    return sorted_out


def apply_exact_odgi_ordering(graph: BidirectedGraph) -> None:
    graph.apply_ordering(exact_odgi_topological_order(graph, True, False))
