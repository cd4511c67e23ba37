"""Anchored piecewise alignment for wide-band ("divergent") pairs.

Pairs whose certified band would be very wide — inversion carriers,
high-divergence pairs — are the runner's worst case: each wide-band bucket
costs its own full-length serial device program (band 1535 on the 600-pair
bench workload = ~45% of wall for 8% of pairs, docs/ROUND3_NOTES.md §1).
The reference pays the same blow-up in WFA2 (score-quadratic wavefronts,
/root/reference/src/seqrush.rs:728-756) and its FastGA mode exists
precisely to dodge it (docs/sweepga_integration.md:403-406).

This route replaces the monster band with DP only where the sequences
actually diverge:

1. **Chain**: exact-match minimizer anchors + colinear chaining
   (ops/anchors.py, C++ chain DP) give maximal exact-match runs.
2. **Windows**: exact flank extension shrinks each inter-run gap (plus
   head/tail) to its divergence core; cores under
   RunnerConfig.wide_host_window_cells run in ONE threaded C++ call
   (native.window_dp_native — full-matrix exact, zero device dispatches,
   overlapping the mega chunk's device time), and large cores (e.g. an
   inverted block) run at FULL band on device, which is unconditionally
   exact and still ~3x fewer serial steps than the whole-pair wide sweep.
3. **Stitch**: runs ('=' ops) and window CIGARs concatenate into the full
   global alignment; gap runs never merge across boundaries because every
   window is flanked by >= k exact-match bases.

Exactness: each window's alignment is certified exact *within its window*
(band certificate or full band), and anchors are exact matches by
construction.  Global optimality additionally requires the optimum to pass
through the chained runs; on the bench workload family this holds for
48/48 wide pairs (stitched score == full wide-band DP score,
tests/test_anchored_wide.py DP-oracle checks).  With
``RunnerConfig.wide_verify=True`` every stitched score is verified against
a score-only banded sweep at the certified band (no traceback tensor, no
walk — the cheap 45% of the fused kernel); non-optimal stitches fall back
to the full wide route, making the result certified-exact end to end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops import anchors as anchors_mod
from ..ops import nw

# windows larger than this run at full band in their own bucket; a pair
# with a full-band window whose traceback would bust the memory budget
# falls back to the full wide route (which can band-shard / segment)
SMALL_WINDOW = 256
# minimum chained exact-match coverage (fraction of min(qlen, tlen));
# below it the chain is too sparse to trust as a global guide
MIN_COVERAGE = 0.05
# run-token budget for window fetches (see align/sweep.py GAP_RUN_MAX:
# tiny windows, slow d2h link); overflowing rows retry via opcodes
WIN_RUN_MAX = 32


@dataclass
class WidePlan:
    p: int
    rc: bool
    band0: int
    f32: bool
    q: np.ndarray
    t: np.ndarray
    # parts: ("items", [(n, op), ...]) resolved on host, or ("win", job_idx)
    parts: list = field(default_factory=list)


def chain_jobs(al, wide_jobs, pairs) -> list:
    """Best-chain runs for every wide job in ONE batched C++ call
    (chain_pairs, bit-identical to chain_anchors + chain_to_runs per job;
    python fallback without a toolchain).  Returns a per-job list of
    run-tuple lists (possibly empty)."""
    anchors = []
    for p, rc, _b, _f in wide_jobs:
        qi, tj = pairs[p]
        anchors.append(
            anchors_mod.anchor_matches_from_minimizers(
                al._minimizers(int(qi), rc),
                al._minimizers(int(tj), False),
                max_freq=al.cfg.frequency,
                t_sorted=al._minimizers_sorted(int(tj), False),
            )
        )
    try:
        from ..native import chain_pairs_native

        offs = np.zeros(len(anchors) + 1, np.int64)
        for w, a in enumerate(anchors):
            offs[w + 1] = offs[w] + a.shape[0]
        if offs[-1]:
            flat = np.concatenate([a for a in anchors if a.shape[0]], axis=0)
            pid = np.repeat(np.arange(len(anchors), dtype=np.int64), np.diff(offs))
            order = np.lexsort((flat[:, 1], flat[:, 0], pid))
            flat = flat[order]
        else:
            flat = np.zeros((0, 2), np.int64)
        out = chain_pairs_native(
            flat[:, 0], flat[:, 1], offs, al.anchor_k,
            max_gap=anchors_mod.DEFAULT_MAX_GAP,
            max_skew=anchors_mod.DEFAULT_MAX_SKEW,
            max_chains=1, min_matched=0,
        )
    except (ImportError, OSError):
        out = None
    if out is None:  # no toolchain: per-job python/native-single path
        runs_per_job = []
        for a in anchors:
            if a.shape[0] == 0:
                runs_per_job.append([])
                continue
            chain = anchors_mod.chain_anchors(a)
            runs_per_job.append(anchors_mod.chain_to_runs(chain, al.anchor_k))
        return runs_per_job
    chain_pair, chain_off, rq, rt, rl = out
    runs_per_job = [[] for _ in wide_jobs]
    co = chain_off.tolist()
    rq_l, rt_l, rl_l = rq.tolist(), rt.tolist(), rl.tolist()
    for c, w in enumerate(chain_pair.tolist()):
        runs_per_job[w] = list(
            zip(rq_l[co[c] : co[c + 1]], rt_l[co[c] : co[c + 1]], rl_l[co[c] : co[c + 1]])
        )
    return runs_per_job


def flank_trim_jobs(al, wide_jobs, pairs, runs_per_job):
    """Precompute every job's gap flanks in one flat byte comparison.

    For each job with usable runs, returns (pre, suf) int64 arrays over its
    gap list — gap 0 is the head (before the first run), gap i+1 follows
    run i, the last gap is the tail — exactly the order build_plan's window
    loop visits them.  Values are bit-identical to _flank_match per gap
    (randomized equivalence in tests/test_anchored_wide.py); the per-gap
    Python walk cost ~15 s at 450k gaps on the tree workload.  Jobs with
    empty runs map to None."""
    n_jobs = len(wide_jobs)
    qs, ts = [], []
    qoff = np.zeros(n_jobs + 1, np.int64)
    toff = np.zeros(n_jobs + 1, np.int64)
    gq0l, gq1l, gt0l, gt1l, jobl = [], [], [], [], []
    for w, ((p, rc, _b, _f), runs) in enumerate(zip(wide_jobs, runs_per_job)):
        qi, tj = pairs[p]
        q = al.rc_codes[qi] if rc else al.codes[qi]
        t = al.codes[tj]
        qs.append(q)
        ts.append(t)
        qoff[w + 1] = qoff[w] + q.size
        toff[w + 1] = toff[w] + t.size
        if not runs:
            continue
        ra = np.asarray(runs, np.int64).reshape(-1, 3)
        gq0l.append(np.concatenate([[0], ra[:, 0] + ra[:, 2]]) + qoff[w])
        gt0l.append(np.concatenate([[0], ra[:, 1] + ra[:, 2]]) + toff[w])
        gq1l.append(np.concatenate([ra[:, 0], [q.size]]) + qoff[w])
        gt1l.append(np.concatenate([ra[:, 1], [t.size]]) + toff[w])
        jobl.append(np.full(ra.shape[0] + 1, w, np.int64))
    out: list = [None] * n_jobs
    if not jobl:
        return out
    qcat = np.concatenate(qs)
    tcat = np.concatenate(ts)
    gq0 = np.concatenate(gq0l)
    gq1 = np.concatenate(gq1l)
    gt0 = np.concatenate(gt0l)
    gt1 = np.concatenate(gt1l)
    jobs_of = np.concatenate(jobl)

    m = np.maximum(np.minimum(gq1 - gq0, gt1 - gt0), 0)
    # prefix: first mismatch within the m-wide head of the window
    starts = np.cumsum(m) - m
    total = int(m.sum())
    pre = m.copy()
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, m)
        neq = qcat[np.repeat(gq0, m) + within] != tcat[np.repeat(gt0, m) + within]
        hits = np.flatnonzero(neq)
        if hits.size:
            hidx = np.searchsorted(hits, starts)
            first_hit = hits[np.minimum(hidx, hits.size - 1)]
            has = (hidx < hits.size) & (first_hit < starts + m)
            pre = np.where(has, first_hit - starts, m)
    # suffix: trailing matches of the remaining m2-wide tail
    m2 = m - pre
    starts2 = np.cumsum(m2) - m2
    total2 = int(m2.sum())
    suf = m2.copy()
    if total2:
        within2 = np.arange(total2, dtype=np.int64) - np.repeat(starts2, m2)
        neq2 = (
            qcat[np.repeat(gq1 - m2, m2) + within2]
            != tcat[np.repeat(gt1 - m2, m2) + within2]
        )
        hits2 = np.flatnonzero(neq2)
        if hits2.size:
            lidx = np.searchsorted(hits2, starts2 + m2) - 1
            last_hit = hits2[np.maximum(lidx, 0)]
            has2 = (lidx >= 0) & (last_hit >= starts2)
            suf = np.where(has2, starts2 + m2 - 1 - last_hit, m2)

    grp_start = np.flatnonzero(
        np.concatenate([[True], jobs_of[1:] != jobs_of[:-1]])
    )
    grp_end = np.append(grp_start[1:], jobs_of.size)
    for s, e in zip(grp_start.tolist(), grp_end.tolist()):
        out[int(jobs_of[s])] = (
            pre[s:e].astype(np.int64),
            suf[s:e].astype(np.int64),
        )
    return out


def build_plan(al, job, pairs, pen, window_jobs: list, runs=None, flanks=None) -> WidePlan | None:
    """Chain one wide job and split it into parts; window jobs are appended
    to the shared ``window_jobs`` list (batched across all plans).  Returns
    None when no usable chain exists (caller falls back to the full wide
    route).  ``runs`` (from chain_jobs) skips the per-job chain."""
    p, rc, band0, f32 = job
    qi, tj = pairs[p]
    q = al.rc_codes[qi] if rc else al.codes[qi]
    t = al.codes[tj]
    if runs is None:
        a = anchors_mod.anchor_matches_from_minimizers(
            al._minimizers(int(qi), rc),
            al._minimizers(int(tj), False),
            max_freq=al.cfg.frequency,
            t_sorted=al._minimizers_sorted(int(tj), False),
        )
        if a.shape[0] == 0:
            return None
        chain = anchors_mod.chain_anchors(a)
        runs = anchors_mod.chain_to_runs(chain, al.anchor_k)
    if not runs:
        return None
    matched = sum(n for _q, _t, n in runs)
    if matched < MIN_COVERAGE * min(q.size, t.size):
        return None

    plan = WidePlan(p, rc, band0, f32, q, t)
    budget = al.cfg.memory_budget_bytes
    jobs_start = len(window_jobs)
    gap_cursor = [0]  # window-call ordinal; == flank-table row when provided

    def window(q0, q1, t0, t1):
        # greedy exact extension: minimizer sampling (w) leaves up to ~w
        # matching bases on each side of a divergence core, so most gaps
        # are a long exact flank around one SNP/indel.  Committing the
        # byte-verified flanks shrinks the core to host-resolvable size
        # (the same trust class as the chain anchors themselves; the
        # DP-oracle tests gate the stitched score either way).
        if flanks is not None:
            g = gap_cursor[0]
            pre, suf = int(flanks[0][g]), int(flanks[1][g])
        else:
            pre, suf = _flank_match(q, t, q0, q1, t0, t1)
        gap_cursor[0] += 1
        if pre:
            plan.parts.append(("items", [(pre, "=")]))
            q0 += pre
            t0 += pre
        dq, dt = q1 - q0 - suf, t1 - t0 - suf
        if dq == 0 and dt == 0:
            pass
        elif dq == 0:
            plan.parts.append(("items", [(dt, "D")]))
        elif dt == 0:
            plan.parts.append(("items", [(dq, "I")]))
        else:
            # divergence core -> window job: tiny cores go to the batched
            # host C++ DP (which tie-prefers the diagonal, so provably
            # all-diagonal SNP cores come back identical to the old host
            # fast path), larger ones to device window chunks.  An
            # analytic I/D skip for anchor-free cores was tried and is
            # WRONG: the DP-oracle gate caught sub-24bp homology islands
            # worth 33 points on a ~768 bp inversion core (two ~20 bp
            # exact runs beat the pure skip, and nothing short of DP can
            # rule them out) — big cores keep their exact DP.
            mx = max(dq, dt)
            if mx > SMALL_WINDOW:
                # full-band window: traceback must fit the budget
                tmax = _ru(dq + dt + 1, 256)
                if 8 * (tmax + 2) * (mx + 2) > budget:
                    return False  # too big to brute-force: full route
            plan.parts.append(("win", len(window_jobs)))
            window_jobs.append((q[q0 : q1 - suf], t[t0 : t1 - suf]))
        if suf:
            plan.parts.append(("items", [(suf, "=")]))
        return True

    ok = window(0, runs[0][0], 0, runs[0][1])
    for i, (q0, t0, n0) in enumerate(runs):
        if not ok:
            break
        plan.parts.append(("items", [(n0, "=")]))
        nxt = runs[i + 1][:2] if i + 1 < len(runs) else (q.size, t.size)
        ok = window(q0 + n0, nxt[0], t0 + n0, nxt[1])
    if not ok:
        del window_jobs[jobs_start:]  # this plan's windows were appended last
        return None
    return plan


def _flank_match(q, t, q0, q1, t0, t1) -> tuple[int, int]:
    """(prefix, suffix) exact-match lengths of the window q[q0:q1] vs
    t[t0:t1], with prefix + suffix <= min window side (prefix wins ties)."""
    m = min(q1 - q0, t1 - t0)
    if m <= 0:
        return 0, 0
    neq = q[q0 : q0 + m] != t[t0 : t0 + m]
    if not neq.any():
        return m, 0
    pre = int(np.argmax(neq))
    m2 = m - pre
    neq2 = q[q1 - m2 : q1] != t[t1 - m2 : t1]
    suf = m2 if not neq2.any() else int(np.argmax(neq2[::-1]))
    return pre, suf


def _ru(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _np2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _plan_chunks(al, jobs, pending):
    """Cut (job, band) entries into dispatch chunks: band-bucket
    boundaries, trip-count jumps (a chunk's serial steps are its max
    window's — tiny windows must not pad to a big window's trip count),
    and the memory budget."""
    pending = sorted(
        pending, key=lambda e: (e[1], max(jobs[e[0]][0].size, jobs[e[0]][1].size))
    )
    chunks = []
    i = 0
    while i < len(pending):
        chunk = [pending[i]]
        band = pending[i][1]
        j0 = pending[i][0]
        tmax0 = max(_ru(jobs[j0][0].size + jobs[j0][1].size + 1, 256), 512)
        i += 1
        while i < len(pending):
            j, bj = pending[i]
            trial_band = max(band, bj)
            qw, tw = jobs[j]
            tmax = _ru(qw.size + tw.size + 1, 256)
            B = _np2(len(chunk) + 1)
            if (
                trial_band > 2 * band + 128
                or tmax > 2 * tmax0
                or B * (tmax + 2) * (trial_band + 1)
                > al.cfg.memory_budget_bytes
            ):
                break
            chunk.append((j, bj))
            band = trial_band
            i += 1
        chunks.append((chunk, band))
    return chunks


def _initial_window_band(qw, tw) -> int:
    mx = max(qw.size, tw.size)
    if mx > SMALL_WINDOW:
        return mx + 1  # full band: exact in one pass
    return min(_ru(abs(qw.size - tw.size) + 65, 128) - 1, mx + 1)


def dispatch_windows(al, jobs, pen) -> tuple[list, list]:
    """Align windows: host C++ DP for everything under the cell budget
    (exact full-matrix, threaded, zero device dispatches — this runs
    while the mega chunk computes on device), device dispatches only for
    oversized windows.  Returns (device dispatch descriptors, out) where
    ``out`` already holds the host-aligned items."""
    out = [None] * len(jobs)
    if not jobs:
        return [], [], out
    budget = al.cfg.wide_host_window_cells
    # bulk route: a latency-scale workload (total cells under
    # wide_host_total_cells) runs ENTIRELY on the host — the threaded DP
    # overlaps the narrow chunk's device time and the big-core device
    # program (+ its round trip) leaves the serial path
    total_cells = sum((qw.size + 1) * (tw.size + 1) for qw, tw in jobs)
    host_all = bool(budget) and 0 < total_cells <= getattr(
        al.cfg, "wide_host_total_cells", 0
    )
    host_sel = []
    device_sel = []
    for j, (qw, tw) in enumerate(jobs):
        if budget and (host_all or (qw.size + 1) * (tw.size + 1) <= budget):
            host_sel.append(j)
        else:
            device_sel.append(j)
    if host_sel:
        from ..native import window_dp_native

        res = window_dp_native(
            [jobs[j][0] for j in host_sel],
            [jobs[j][1] for j in host_sel],
            pen,
            threads=al.cfg.threads,
        )
        if res is None:  # no toolchain: everything goes to the device
            device_sel = list(range(len(jobs)))
        else:
            _scores, items_all = res
            for j, items in zip(host_sel, items_all):
                out[j] = items
            al.stats["host_windows"] += len(host_sel)
    if not device_sel:
        return [], [], out
    pending = [
        (j, _initial_window_band(jobs[j][0], jobs[j][1])) for j in device_sel
    ]
    planned = _plan_chunks(al, jobs, pending)
    # dispatch at most one chunk eagerly (device work starts now); the
    # rest stay planned — each in-flight chunk holds its [B, tmax, W]
    # traceback on device, so depth is capped at 2 (collect_windows keeps
    # one chunk ahead), matching the runner's own chunk pipeline
    inflight = []
    if planned:
        chunk, band = planned.pop(0)
        inflight.append(_dispatch_window_chunk(al, jobs, chunk, band, pen))
    return inflight, planned, out


def collect_windows(al, jobs, state, pen) -> list:
    """Collect dispatched window chunks (dispatching the next planned
    chunk before each collect — depth-2 pipeline, bounded device memory);
    escalation rounds (band certificate failures) re-dispatch
    synchronously — rare.  Returns the per-job CIGAR item lists."""
    inflight, planned, out = state
    generations = 0
    while inflight or planned:
        nxt = []
        while inflight or planned:
            if planned and len(inflight) < 2:
                chunk, band = planned.pop(0)
                inflight.append(
                    _dispatch_window_chunk(al, jobs, chunk, band, pen)
                )
                continue
            _collect_window_chunk(al, jobs, inflight.pop(0), pen, out, nxt)
        if nxt:
            generations += 1
            if generations > 12:  # escalation terminates at full band
                raise RuntimeError("window escalation did not converge")
            planned = _plan_chunks(al, jobs, nxt)
    return out


def _dispatch_window_chunk(al, jobs, chunk, band, pen):
    B = max(_np2(len(chunk)), 8)
    lq = _ru(max(jobs[j][0].size for j, _b in chunk), 128)
    lt = _ru(max(jobs[j][1].size for j, _b in chunk), 128)
    band = min(band, max(lq, lt) + 1)
    Q = np.full((B, lq), nw.QPAD, np.uint8)
    T = np.full((B, lt), nw.TPAD, np.uint8)
    qlens = np.zeros(B, np.int32)
    tlens = np.zeros(B, np.int32)
    for b, (j, _bj) in enumerate(chunk):
        qw, tw = jobs[j]
        Q[b, : qw.size] = qw
        T[b, : tw.size] = tw
        qlens[b] = qw.size
        tlens[b] = tw.size
    tmax = _ru(int((qlens + tlens).max()) + 1, 256)
    kw = dict(
        mismatch=pen.mismatch,
        o1=pen.gap1_open,
        e1=pen.gap1_extend,
        o2=pen.gap2_open if pen.two_piece else -1,
        e2=pen.gap2_extend if pen.two_piece else -1,
        band=band,
        tmax=tmax,
    )
    al.stats["cells_padded"] += B * (tmax + 2) * (band + 1)
    use_runs = tmax + 4 < (1 << 15) and al.cfg.emit != "ops"
    if use_runs:
        scores, tokens, counts = nw.nw_align_with_runs(
            Q, T, qlens, tlens, run_max=WIN_RUN_MAX,
            unroll=al.cfg.unroll, tb_unroll=al.cfg.tb_unroll, **kw
        )
        payload = (tokens, counts)
    else:
        scores, opcodes = nw.nw_align_with_opcodes(
            Q, T, qlens, tlens, unroll=al.cfg.unroll,
            tb_unroll=al.cfg.tb_unroll, **kw
        )
        payload = (opcodes,)
    for a in (scores, *payload):
        fn = getattr(a, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:
                pass
    return (chunk, band, kw, use_runs, scores, payload, Q, T, qlens, tlens)


def _collect_window_chunk(al, jobs, disp, pen, out, nxt):
    chunk, band, kw, use_runs, scores, payload, Q, T, qlens, tlens = disp
    if use_runs:
        tokens, counts = (np.asarray(a) for a in payload)
    else:
        packed = np.asarray(payload[0])
        ops = nw.unpack_opcodes(packed, packed.shape[1] * 4)
    scores = np.asarray(scores)

    ok_rows, ok_jobs, overflow = [], [], []
    for b, (j, _bj) in enumerate(chunk):
        qw, tw = jobs[j]
        s = int(scores[b])
        exact = band >= max(qw.size, tw.size) or (
            0 <= s < al._cert_bound(band, qw.size, tw.size)
        )
        if not exact:
            al.stats["band_escalations"] += 1
            k = al._escalated_band(max(s, 0), band, qw.size, tw.size)
            nxt.append((j, k))
            continue
        al.stats["cells_true"] += (qw.size + tw.size + 1) * (band + 1)
        if use_runs and counts[b] > WIN_RUN_MAX:
            al.stats["run_overflows"] += 1
            overflow.append((b, j))
            continue
        ok_rows.append(b)
        ok_jobs.append(j)
    if ok_rows:
        if use_runs:
            items_all = nw.decode_runs_batch(
                tokens[ok_rows], counts[ok_rows],
                [jobs[j][0] for j in ok_jobs], [jobs[j][1] for j in ok_jobs],
            )
        else:
            items_all = nw.decode_batch(
                ops[ok_rows],
                [jobs[j][0] for j in ok_jobs], [jobs[j][1] for j in ok_jobs],
            )
        for j, items in zip(ok_jobs, items_all):
            out[j] = items
    if overflow:
        # rare: a window whose walk exceeded RUN_MAX runs — re-dispatch the
        # affected rows via opcode emission at the (already certified) band
        oQ = Q[[b for b, _j in overflow]]
        oT = T[[b for b, _j in overflow]]
        oql = qlens[[b for b, _j in overflow]]
        otl = tlens[[b for b, _j in overflow]]
        _s, opcodes = nw.nw_align_with_opcodes(oQ, oT, oql, otl, **kw)
        packed = np.asarray(opcodes)
        ops2 = nw.unpack_opcodes(packed, packed.shape[1] * 4)
        items_all = nw.decode_batch(
            ops2[: len(overflow)],
            [jobs[j][0] for _b, j in overflow],
            [jobs[j][1] for _b, j in overflow],
        )
        for (_b, j), items in zip(overflow, items_all):
            out[j] = items


def stitch(
    plan: WidePlan, witems: list
) -> tuple[list[tuple[int, str]], int, int]:
    """Returns (items, consumed_q, consumed_t).  Parts are internally
    coalesced run-length lists, so only the boundary items can merge —
    extend beats per-item pushes ~10x.  The q/t consumption tallies ride
    the same walk (a separate per-item sum pass cost ~4 s at tree-workload
    scale)."""
    items: list[tuple[int, str]] = []
    nq = nt = 0
    for kind, x in plan.parts:
        src = x if kind == "items" else witems[x]
        if not src:
            continue
        for n, op in src:
            if op != "D":
                nq += n
            if op != "I":
                nt += n
        if items and items[-1][1] == src[0][1]:
            items[-1] = (items[-1][0] + src[0][0], src[0][1])
            items.extend(src[1:])
        else:
            items.extend(src)
    return items, nq, nt


def cigar_cost(items, pen) -> int:
    s = 0
    for n, op in items:
        if op == "X":
            s += n * pen.mismatch
        elif op in "ID":
            g1 = pen.gap1_open + n * pen.gap1_extend
            s += min(g1, pen.gap2_open + n * pen.gap2_extend) if pen.two_piece else g1
    return s


def max_excursion(items) -> int:
    """Maximum |i - j| along the alignment path ('I' consumes query)."""
    d = mx = 0
    for n, op in items:
        if op == "I":
            d -= n
        elif op == "D":
            d += n
        mx = max(mx, abs(d))
    return mx


def verify_scores(al, entries, pen) -> np.ndarray:
    """Score-only banded sweep at each pair's certified band: entries are
    (q, t, band_v); returns the in-band optimal scores.  No traceback
    tensor, no walk — memory is O(B*W) state only, so one chunk suffices."""
    out = np.zeros(len(entries), np.int64)
    order = np.argsort([e[2] for e in entries], kind="stable")
    i = 0
    while i < len(order):
        sel = order[i : i + 256]
        i += len(sel)
        band = max(int(entries[j][2]) for j in sel)
        B = max(_np2(len(sel)), 8)
        lq = _ru(max(entries[j][0].size for j in sel), 256)
        lt = _ru(max(entries[j][1].size for j in sel), 256)
        Q = np.full((B, lq), nw.QPAD, np.uint8)
        T = np.full((B, lt), nw.TPAD, np.uint8)
        qlens = np.zeros(B, np.int32)
        tlens = np.zeros(B, np.int32)
        for b, j in enumerate(sel):
            qw, tw = entries[j][0], entries[j][1]
            Q[b, : qw.size] = qw
            T[b, : tw.size] = tw
            qlens[b] = qw.size
            tlens[b] = tw.size
        tmax = _ru(int((qlens + tlens).max()) + 1, 512)
        scores, _ = nw.nw_align_device(
            Q, T, qlens, tlens,
            mismatch=pen.mismatch,
            o1=pen.gap1_open,
            e1=pen.gap1_extend,
            o2=pen.gap2_open if pen.two_piece else -1,
            e2=pen.gap2_extend if pen.two_piece else -1,
            band=min(band, max(lq, lt) + 1),
            tmax=tmax,
            with_traceback=False,
        )
        al.stats["cells_padded"] += B * (tmax + 2) * (band + 1)
        out[sel] = np.asarray(scores)[: len(sel)]
    return out
