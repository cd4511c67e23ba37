"""Bubble-chain final ordering from path-anchor decomposition.

The reference documents (but never built) a povu-guided hybrid sort
(/root/reference/docs/povu_guided_sorting.md): decompose the graph into a
linear chain of bubbles, order locally inside each bubble, and keep the
chain itself for the global order — eliminating SGD's catastrophic-edge
mode where a displaced block lands kilobases from every path context
(the reference's A-3105 analysis: one edge jumping 43.9% of the graph).

This implementation derives the chain from PATH evidence instead of an
external bubble tool, which is both simpler and exactly aligned with the
layout metric (measure_layout_quality scores consecutive path steps):

  1. Anchors = nodes that occur exactly once in EVERY path; a greedy
     dominance chain (strictly increasing step rank in every path) keeps
     a maximal consistent subsequence, so along every path the kept
     anchors appear precisely in chain order.
  2. Every non-anchor occurrence votes for the segment between the chain
     anchors that surround it in its path, carrying the genomic offset
     from the segment's left anchor (well-defined even for reversed
     traversals: anchors bound the excursion on both sides).
  3. A node's segment is the majority vote; its intra-segment position
     the mean offset of the winning-segment votes.  Final order is
     segment-by-segment along the chain — displaced blocks cannot leave
     their bubble.

Pure ordering function: no graph mutation, no RNG.  Used as a candidate
in layout/ygs.py's metric-scored final-order selection (topo_mode="best")
and directly via topo_mode="bubble".
"""

from __future__ import annotations

import numpy as np

from ..graph.bigraph import BidirectedGraph


def bubble_chain_order(graph: BidirectedGraph) -> list[int] | None:
    """Forward-handle ordering from the path-anchor bubble chain, or None
    when no usable chain exists (fewer than 2 consistent anchors)."""
    if not graph.paths or not graph.nodes:
        return None
    node_len = {nid: len(seq) for nid, seq in graph.nodes.items()}

    paths_nodes: list[np.ndarray] = []
    paths_off: list[np.ndarray] = []
    for path in graph.paths:
        ns = (np.asarray(path.steps) >> 1).astype(np.int64)
        if ns.size == 0:
            continue
        lens = np.array([node_len[int(n)] for n in ns], dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        paths_nodes.append(ns)
        paths_off.append(off)
    P = len(paths_nodes)
    if P == 0:
        return None

    # occurrence counts per path; anchor candidates occur once in every path
    counts: dict[int, np.ndarray] = {}
    for p, ns in enumerate(paths_nodes):
        ids, c = np.unique(ns, return_counts=True)
        for nid, k in zip(ids.tolist(), c.tolist()):
            row = counts.get(nid)
            if row is None:
                row = counts[nid] = np.zeros(P, dtype=np.int64)
            row[p] = k
    cand = sorted(n for n, row in counts.items() if bool(np.all(row == 1)))
    if len(cand) < 2:
        return None

    # step rank of each candidate in each path
    rank = np.empty((len(cand), P), dtype=np.int64)
    cand_idx = {n: i for i, n in enumerate(cand)}
    for p, ns in enumerate(paths_nodes):
        for k, nid in enumerate(ns.tolist()):
            i = cand_idx.get(nid)
            if i is not None:
                rank[i, p] = k

    # greedy dominance chain: sorted by mean rank, keep a candidate iff its
    # rank exceeds the last kept anchor's rank in EVERY path — the kept
    # anchors then appear in chain order along every path
    order = sorted(range(len(cand)), key=lambda i: (float(rank[i].mean()), cand[i]))
    chain: list[int] = []
    last = np.full(P, -1, dtype=np.int64)
    for i in order:
        if bool(np.all(rank[i] > last)):
            chain.append(cand[i])
            last = rank[i]
    if len(chain) < 2:
        return None
    chain_pos = {n: c for c, n in enumerate(chain)}

    # segment votes: (segment index, offset from the segment's left anchor);
    # segment -1 = before the first anchor, c = between anchors c and c+1,
    # len(chain)-1 = after the last anchor
    seg_votes: dict[int, dict[int, list[float]]] = {}
    for ns, off in zip(paths_nodes, paths_off):
        cur_seg = -1
        left_off = None
        first_anchor_off = None
        pending: list[tuple[int, float]] = []  # leading-segment occurrences
        for k, nid in enumerate(ns.tolist()):
            c = chain_pos.get(nid)
            if c is not None:
                if first_anchor_off is None:
                    first_anchor_off = float(off[k])
                    for pn, po in pending:
                        seg_votes.setdefault(pn, {}).setdefault(-1, []).append(
                            po - first_anchor_off
                        )
                    pending = []
                cur_seg = c
                left_off = float(off[k])
                continue
            if left_off is None:
                pending.append((int(nid), float(off[k])))
            else:
                seg_votes.setdefault(int(nid), {}).setdefault(cur_seg, []).append(
                    float(off[k]) - left_off
                )
        # every path contains every chain anchor, so first_anchor_off is
        # always set and no pending occurrence survives the loop

    # resolve: majority segment, mean offset inside it (ties: smaller seg)
    segments: dict[int, list[tuple[float, int]]] = {}
    placed = set(chain)
    for nid in graph.nodes:
        if nid in placed:
            continue
        votes = seg_votes.get(nid)
        if not votes:
            continue  # not on any anchored path span; appended at the end
        seg = max(votes, key=lambda s: (len(votes[s]), -s))
        mean_off = float(np.mean(votes[seg]))
        segments.setdefault(seg, []).append((mean_off, nid))
        placed.add(nid)

    out: list[int] = []
    for mean_off, nid in sorted(segments.get(-1, [])):
        out.append(nid)
    for c, anchor in enumerate(chain):
        out.append(anchor)
        for mean_off, nid in sorted(segments.get(c, [])):
            out.append(nid)
    for nid in sorted(graph.nodes):
        if nid not in placed:
            out.append(nid)
    return [n << 1 for n in out]
