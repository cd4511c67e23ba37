"""CIGAR gap analysis + inversion-aware re-alignment.

Ports the semantics of the reference's cigar_analysis
(/root/reference/src/cigar_analysis.rs:23-147) and the inversion-aware
pipeline (/root/reference/src/inversion_aware_seqrush.rs:163-251): after a
forward alignment, large divergent gaps (both sides unaligned, similar
sizes) are candidate inversion sites; each candidate window is re-aligned
with the target window reverse-complemented, and if the inverted alignment
scores well (reference rule: better than half the forward score over the
window) its match runs are united with reverse orientation.

Convention note: the reference file uses WFA2's swapped I/D; here ops follow
the package standard ('I' consumes query, 'D' consumes target) with the same
gap semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Gap:
    query_start: int
    query_end: int
    target_start: int
    target_end: int
    gap_type: str  # "divergent" | "query_only" | "target_only"


def find_potential_inversion_sites(
    cigar_items: list[tuple[int, str]], min_gap_size: int
) -> list[Gap]:
    """Find large unaligned regions between *anchor* match runs.

    Extension over the reference: match runs shorter than min_gap_size do not
    terminate a gap region — an inverted segment often contains short spurious
    forward matches that split the divergent region into I/D halves; absorbing
    them recovers the full window (strict superset of the reference's
    detection: single-op gaps classify identically).
    """
    gaps: list[Gap] = []
    q = t = 0
    # region accumulators (None = not in a gap region)
    rq_start = rt_start = None
    rq_end = rt_end = 0

    def close_region():
        nonlocal rq_start, rt_start
        if rq_start is None:
            return
        q_gap = rq_end - rq_start
        t_gap = rt_end - rt_start
        if q_gap >= min_gap_size and t_gap >= min_gap_size:
            gaps.append(Gap(rq_start, rq_end, rt_start, rt_end, "divergent"))
        elif q_gap >= min_gap_size:
            gaps.append(Gap(rq_start, rq_end, rt_start, rt_start, "query_only"))
        elif t_gap >= min_gap_size:
            gaps.append(Gap(rq_start, rq_start, rt_start, rt_end, "target_only"))
        rq_start = rt_start = None

    for count, op in cigar_items:
        is_anchor = op in ("M", "=") and count >= min_gap_size
        if is_anchor:
            close_region()
            q += count
            t += count
            continue
        if rq_start is None:
            rq_start, rt_start = q, t
        if op in ("M", "=", "X"):
            q += count
            t += count
        elif op == "I":
            q += count
        elif op == "D":
            t += count
        rq_end, rt_end = q, t
    close_region()
    return gaps


def is_potential_inversion(gap: Gap, min_inversion_size: int) -> bool:
    """Divergent, both sides >= min size, size ratio <= 1.5
    (cigar_analysis.rs:130-147)."""
    if gap.gap_type != "divergent":
        return False
    qs = gap.query_end - gap.query_start
    ts = gap.target_end - gap.target_start
    if min(qs, ts) == 0:
        return False
    ratio = max(qs, ts) / min(qs, ts)
    return qs >= min_inversion_size and ts >= min_inversion_size and ratio <= 1.5


def inversion_patch_alignments(results, aligner, min_match_length: int):
    """For each forward alignment, re-align candidate inversion windows with
    the target window RC'd; returns patch unite-pairs (u, v) Pos arrays.

    Acceptance rule from the reference
    (/root/reference/src/inversion_aware_seqrush.rs:179-212): the inverted
    window alignment must complete AND score strictly less than HALF THE
    FULL FORWARD ALIGNMENT's score (``inv_score < score / 2``, integer
    division) — a patch over a window of a nearly-identical pair (small
    forward score) is held to a much stricter bar than one inside a
    divergent alignment.
    """
    from ..ops import wfa
    from ..ops.wfa import Penalties

    sc = aligner.cfg.scores
    pen = Penalties(
        sc.mismatch_penalty,
        sc.gap1_open,
        sc.gap1_extend,
        sc.gap2_open if sc.has_two_piece else None,
        sc.gap2_extend if sc.has_two_piece else None,
    )
    min_size = max(2 * min_match_length, 20)

    jobs = []  # (res, gap, q_codes_window, rc_t_codes_window)
    for res in results:
        if res.is_reverse:
            continue  # reference only patches forward alignments
        for gap in find_potential_inversion_sites(res.cigar, min_size):
            if not is_potential_inversion(gap, min_size):
                continue
            qw = aligner.codes[res.query_idx][gap.query_start : gap.query_end]
            tw = aligner.codes[res.target_idx][gap.target_start : gap.target_end]
            from ..pos import reverse_complement_codes

            rc_tw = reverse_complement_codes(tw).copy()
            jobs.append((res, gap, qw, rc_tw))
    if not jobs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    from ..ops import nw

    B = max(1 << (len(jobs) - 1).bit_length(), 8)
    lq = max(j[2].size for j in jobs)
    lt = max(j[3].size for j in jobs)
    Q = np.full((B, lq + 1), nw.QPAD, np.uint8)
    T = np.full((B, lt + 1), nw.TPAD, np.uint8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b, (_, _, qw, rc_tw) in enumerate(jobs):
        Q[b, : qw.size] = qw
        T[b, : rc_tw.size] = rc_tw
        qlens[b] = qw.size
        tlens[b] = rc_tw.size
    band = min(max(lq, lt) + 1, max(64, int(np.abs(qlens - tlens).max()) + 64))
    tmax = int((qlens + tlens).max()) + 1
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
    scores = np.asarray(scores)
    tb = np.asarray(tb)

    us, vs = [], []
    for b, (res, gap, qw, rc_tw) in enumerate(jobs):
        # reference acceptance: completed AND inv_score < forward_score / 2
        # (inversion_aware_seqrush.rs:190)
        if scores[b] < 0 or int(scores[b]) >= res.score // 2:
            continue
        items = nw.traceback_pair(tb[b], int(qlens[b]), int(tlens[b]), band)
        items = nw.resolve_matches(items, qw, rc_tw)
        qseq = aligner.seqs[res.query_idx]
        tseq = aligner.seqs[res.target_idx]
        t_win_len = gap.target_end - gap.target_start
        for run_q, run_t, n in wfa.cigar_match_runs(items):
            if n < max(min_match_length, 1):
                continue
            i = np.arange(n, dtype=np.int64)
            # query forward positions within the window
            u = (np.int64(qseq.offset + gap.query_start + run_q) + i) << 1
            # rc-window position run_t+i maps to target local
            # gap.target_start + (t_win_len - 1 - (run_t+i)), reverse orient
            t_local = np.int64(gap.target_start + t_win_len - 1) - (np.int64(run_t) + i)
            v = ((np.int64(tseq.offset) + t_local) << 1) | 1
            us.append(u)
            vs.append(v)
    if not us:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(us), np.concatenate(vs)
