"""Seed-and-extend aligner backend ("sweepga" analog).

The reference's sweepga backend shells out to FastGA (k-mer index
seed-and-extend) and plane-sweep-filters the PAF 1:1
(/root/reference/src/aligner/sweepga_impl.rs, docs/sweepga_integration.md).
Here the same capability is native: minimizer anchors + colinear chaining
(ops/anchors.py) select one best chain per pair (the 1:1 filtering analog),
and the inter-anchor gaps are aligned exactly with the banded Gotoh kernel
in one batch.  The output is a full AlignmentResult whose CIGAR covers the
chain span (local alignment with query/target starts, like FastGA records).

For near-identical long sequences this does asymptotically less work than
all-pairs global alignment: anchors are O(L/w), and only divergent gaps
touch the DP kernel.
"""

from __future__ import annotations

import numpy as np

from ..ops import anchors as anchors_mod
from ..ops import nw
from ..ops.wfa import Penalties
from .runner import AlignmentResult, RunnerConfig, WfaAligner, _next_pow2, _round_up


class SweepAligner(WfaAligner):
    """Minimizer-chain + gap-fill aligner; drop-in for WfaAligner."""

    def __init__(self, seqs, config: RunnerConfig | None = None, k: int = 15, w: int = 10):
        super().__init__(seqs, config)
        self.k = k
        self.w = w

    def align_pairs(self, pairs: np.ndarray) -> list[AlignmentResult]:
        import time

        t0 = time.time()
        if len(pairs) == 0:
            return []
        is_rev = self.choose_orientations(pairs)
        sc = self.cfg.scores
        pen = Penalties(
            sc.mismatch_penalty,
            sc.gap1_open,
            sc.gap1_extend,
            sc.gap2_open if sc.has_two_piece else None,
            sc.gap2_extend if sc.has_two_piece else None,
        )

        # phase 1: chains per pair (host; vectorized numpy per pair)
        per_pair = []
        gap_jobs = []  # (pair_idx, gap_idx_in_pair, qwin, twin)
        for p, (qi, tj) in enumerate(pairs):
            q = self.rc_codes[qi] if is_rev[p] else self.codes[qi]
            t = self.codes[tj]
            a = anchors_mod.anchor_matches(q, t, self.k, self.w)
            chain = anchors_mod.chain_anchors(a, self.k)
            runs = anchors_mod.chain_to_runs(chain, self.k) if chain.size else []
            per_pair.append((q, t, runs))
            for g, ((q0, t0_, n0), (q1, t1_, _)) in enumerate(zip(runs[:-1], runs[1:])):
                gq0, gt0 = q0 + n0, t0_ + n0
                if q1 > gq0 or t1_ > gt0:
                    gap_jobs.append((p, g, q[gq0:q1], t[gt0:t1_]))

        # phase 2: batched gap fill with the Gotoh kernel
        gap_cigars: dict[tuple[int, int], list[tuple[int, str]]] = {}
        if gap_jobs:
            maxq = max(j[2].size for j in gap_jobs)
            maxt = max(j[3].size for j in gap_jobs)
            B = max(_next_pow2(len(gap_jobs)), 8)
            lq = _round_up(max(maxq, 1), 128)
            lt = _round_up(max(maxt, 1), 128)
            Q = np.full((B, lq), nw.QPAD, np.uint8)
            T = np.full((B, lt), nw.TPAD, np.uint8)
            qlens = np.zeros(B, np.int32)
            tlens = np.zeros(B, np.int32)
            for b, (_, _, qw, tw) in enumerate(gap_jobs):
                Q[b, : qw.size] = qw
                T[b, : tw.size] = tw
                qlens[b] = qw.size
                tlens[b] = tw.size
            band = min(
                _round_up(int(np.abs(qlens - tlens).max()) + 65, 128) - 1, max(lq, lt) + 1
            )
            tmax = _round_up(int((qlens + tlens).max()) + 1, 256)
            scores, tb = nw.nw_align_device(
                Q,
                T,
                qlens,
                tlens,
                mismatch=pen.mismatch,
                o1=pen.gap1_open,
                e1=pen.gap1_extend,
                o2=pen.gap2_open if pen.two_piece else -1,
                e2=pen.gap2_extend if pen.two_piece else -1,
                band=band,
                tmax=tmax,
                with_traceback=True,
            )
            tb = np.asarray(tb)
            for b, (p, g, qw, tw) in enumerate(gap_jobs):
                items = nw.traceback_pair(tb[b], int(qlens[b]), int(tlens[b]), band)
                gap_cigars[(p, g)] = nw.resolve_matches(items, qw, tw)

        # phase 3: stitch chain spans into local alignment records
        results = []
        for p, (qi, tj) in enumerate(pairs):
            q, t, runs = per_pair[p]
            if not runs:
                self.stats["dropped"] += 1
                continue
            items: list[tuple[int, str]] = []

            def push(n, op):
                if n <= 0:
                    return
                if items and items[-1][1] == op:
                    items[-1] = (items[-1][0] + n, op)
                else:
                    items.append((n, op))

            for g, (q0, t0_, n0) in enumerate(runs):
                push(n0, "=")
                if g < len(runs) - 1:
                    q1, t1_, _ = runs[g + 1]
                    gq0, gt0 = q0 + n0, t0_ + n0
                    if (p, g) in gap_cigars:
                        for n, op in gap_cigars[(p, g)]:
                            push(n, op)
                    else:
                        # touching/overlapping next run handled by coalescing
                        push(q1 - gq0, "I")
                        push(t1_ - gt0, "D")
            results.append(
                AlignmentResult(
                    int(qi),
                    int(tj),
                    bool(is_rev[p]),
                    score=_cigar_cost(items, pen),
                    cigar=items,
                    query_start=int(runs[0][0]),
                    target_start=int(runs[0][1]),
                )
            )
        self.stats["alignments"] += len(results)
        self.stats["wall_s"] += time.time() - t0
        return results


def _cigar_cost(items, pen: Penalties) -> int:
    s = 0
    for n, op in items:
        if op == "X":
            s += n * pen.mismatch
        elif op in "ID":
            g1 = pen.gap1_open + n * pen.gap1_extend
            s += min(g1, pen.gap2_open + n * pen.gap2_extend) if pen.two_piece else g1
    return s
