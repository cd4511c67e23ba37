"""Batched wavefront alignment (WFA) on TPU via JAX/XLA.

TPU-native re-design of the reference's alignment kernel (the C WFA2 library
behind lib_wfa2; see /root/reference/src/wfa.rs:41-75 for its configuration:
two-piece affine penalties, end-to-end span, no heuristic).  Instead of one
sequential C routine per pair on a CPU thread, a whole *batch* of pairs runs
in lockstep on device:

* state is dense: five wavefront offset vectors (M, I1, I2, D1, D2) over a
  static diagonal band, shape [B, NDIAG], advanced by a single
  ``lax.while_loop`` over scores shared by the batch (finished pairs freeze);
* greedy extension has three bit-identical strategies (``ext_mode``): a
  precomputed per-diagonal run-length table consulted in full, a carried
  512-wide window of that table with exact full-table fallback, or the
  chunked base-compare loop;
* per-score wavefronts append to history tensors [B, S+1, NDIAG] (int16) in
  HBM, from which the optimal path is re-derived by backtrace.

NOTE: the production default aligner is the banded anti-diagonal Gotoh sweep
(ops/nw.py) — per-diagonal random access in the extend step is hostile to
TPU (no efficient gather); this kernel remains as the score-adaptive option
and cross-check.

Conventions (match the reference's post-conversion CIGAR, wfa.rs:5-38):
  query = pattern (v), target = text (h); diagonal k = h - v; offset = h.
  'I' consumes query only, 'D' consumes target only, '=' match, 'X' mismatch.

Recurrences (gap-affine two-piece, scores are penalties, match = 0):
  D1[s,k] = max(M[s-o1-e1, k-1], D1[s-e1, k-1]) + 1      (consume target)
  I1[s,k] = max(M[s-o1-e1, k+1], I1[s-e1, k+1])          (consume query)
  (D2/I2 analogous with o2/e2)
  M[s,k] = max(M[s-x, k] + 1, I1, I2, D1, D2), then greedy-extend.
Alignment completes the first time M[s, k_final] == tlen (k_final = tlen-qlen).

Banding: diagonals are restricted to |k| <= band.  Any alignment whose
optimal path stays within the band is scored exactly; callers size the band
from sequence-length mismatch plus an indel allowance and can escalate.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NULL = jnp.int32(-(2**30))
NULL16 = -(2**15)  # int16 storage null
QPAD = 6  # base-code pad for query (codes 0..5 are real)
TPAD = 7  # distinct pad for target so pads never match

EXTEND_CHUNK = 64


@dataclass(frozen=True)
class Penalties:
    mismatch: int
    gap1_open: int
    gap1_extend: int
    gap2_open: int | None = None
    gap2_extend: int | None = None

    @property
    def two_piece(self) -> bool:
        return self.gap2_open is not None


def _pad_to(x: np.ndarray, length: int, value: int) -> np.ndarray:
    out = np.full(length, value, dtype=np.uint8)
    out[: x.size] = x
    return out


def pack_batch(
    q_list: list[np.ndarray], t_list: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad base-code sequences to a common length (+extend chunk slack)."""
    lq = max((q.size for q in q_list), default=1)
    lt = max((t.size for t in t_list), default=1)
    Q = np.stack([_pad_to(q, lq + EXTEND_CHUNK, QPAD) for q in q_list])
    T = np.stack([_pad_to(t, lt + EXTEND_CHUNK, TPAD) for t in t_list])
    qlens = np.array([q.size for q in q_list], dtype=np.int32)
    tlens = np.array([t.size for t in t_list], dtype=np.int32)
    return Q, T, qlens, tlens


# -----------------------------------------------------------------------------
# Device kernel
# -----------------------------------------------------------------------------


def _build_ext_table(Q, T, band):
    """Precompute ext[b, d, h] = length of the exact-match run along diagonal
    d starting at target offset h (query position h - k_d).

    One-time O(B * NDIAG * L) setup replacing the per-score-step chunked
    extend loop: wavefront extension becomes a single [B, NDIAG] gather.
    Built from a structured skew-gather (q index = h + 2*band - d) and a
    log-doubling suffix run-length scan.
    """
    B, Lt = T.shape
    NDIAG = 2 * band + 1
    # pad Q with `band` leading pads so negative v indices hit pad
    Qp = jnp.concatenate(
        [jnp.full((B, band), QPAD, dtype=Q.dtype), Q, jnp.full((B, band + 1), QPAD, dtype=Q.dtype)],
        axis=1,
    )
    d = jnp.arange(NDIAG, dtype=jnp.int32)[:, None]
    h = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    qidx = jnp.clip(h + 2 * band - d, 0, Qp.shape[1] - 1)  # [NDIAG, Lt]
    qg = Qp[:, qidx]  # [B, NDIAG, Lt]
    eq = qg == T[:, None, :]

    # suffix consecutive-ones count via log doubling
    ext = eq.astype(jnp.int16)
    step = 1
    while step < Lt:
        shifted = jnp.concatenate(
            [ext[:, :, step:], jnp.zeros((B, NDIAG, step), dtype=jnp.int16)], axis=2
        )
        ext = jnp.where(ext == step, ext + shifted, ext)
        step *= 2
    return ext


def _extend_with_table(M, ext, tlens):
    """Extend offsets by a full-table masked reduction (XLA-TPU gathers are
    degenerate, a masked reduce is the fast formulation of a per-row pick)."""
    active = M > NULL
    off = jnp.clip(M, 0, ext.shape[2] - 1)
    h = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 2)
    adv = jnp.sum(
        jnp.where(h == off[:, :, None], ext, 0).astype(jnp.int32), axis=2
    )
    return jnp.where(active, M + adv, M)


WINDOW = 512  # windowed-extension width (exactness-preserving cache)


def _window_rebase(ext, M):
    """Re-center each row's window at its current offset.

    Uses the XLA gather (slow but infrequent: only on window escapes)."""
    Lt = ext.shape[2]
    base = jnp.clip(jnp.where(M > NULL, M, 0), 0, max(Lt - WINDOW, 0))
    idx = jnp.clip(base[:, :, None] + jnp.arange(WINDOW, dtype=jnp.int32), 0, Lt - 1)
    W = jnp.take_along_axis(ext, idx, axis=2)
    return base, W


def _extend_windowed(M, base, W):
    """Window lookup: per-step cost O(B*NDIAG*WINDOW) instead of O(..*Lt).

    Returns (advance, in_window, needs_full) — a row needs the full table
    when its offset left the window or its match run reaches the window edge
    (the run may continue beyond what the window can prove)."""
    rel = M - base
    valid = M > NULL
    in_win = valid & (rel >= 0) & (rel < WINDOW)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, W.shape, 2)
    sel = iota_w == jnp.clip(rel, 0, WINDOW - 1)[:, :, None]
    adv = jnp.sum(jnp.where(sel, W, 0).astype(jnp.int32), axis=2)
    at_edge = in_win & (adv >= (WINDOW - rel))
    needs_full = valid & (~in_win | at_edge)
    return adv, in_win & ~at_edge, needs_full


def _extend_all(M, ks, Q, T, qlens, tlens):
    """Greedy diagonal extension for all pairs/diagonals at once.

    M: [B, NDIAG] int32 offsets (h); ks: [NDIAG] diagonal values.
    Returns extended offsets.
    """
    E = EXTEND_CHUNK
    ar = jnp.arange(E, dtype=jnp.int32)

    def cond(state):
        M, active = state
        return jnp.any(active)

    def body(state):
        M, active = state
        h = jnp.where(active, M, 0)
        v = h - ks[None, :]
        idx_t = jnp.clip(h[:, :, None] + ar, 0, T.shape[1] - 1)
        idx_q = jnp.clip(v[:, :, None] + ar, 0, Q.shape[1] - 1)
        tb = jnp.take_along_axis(T[:, None, :], idx_t, axis=2)
        qb = jnp.take_along_axis(Q[:, None, :], idx_q, axis=2)
        eq = (tb == qb).astype(jnp.int32)
        adv = jnp.sum(jnp.cumprod(eq, axis=2), axis=2)
        adv = jnp.where(active, adv, 0)
        M2 = M + adv
        return M2, active & (adv == E)

    active0 = M > NULL
    M, _ = jax.lax.while_loop(cond, body, (M, active0))
    return M


def _valid_mask(off, ks, qlens, tlens):
    """A wavefront cell is real iff 0<=h<=tlen and 0<=v<=qlen."""
    h = off
    v = off - ks[None, :]
    ok = (h >= 0) & (h <= tlens[:, None]) & (v >= 0) & (v <= qlens[:, None])
    return jnp.where(ok, off, NULL)


def _hist_row(H, s_idx, valid):
    """Read history row s_idx mod H-rows ([B, NDIAG] int32), NULL if invalid.

    History buffers hold either the full score range (keep_history) or a
    rolling window just large enough for the deepest recurrence lookback
    (score-only mode); in both cases row ``s`` lives at ``s % H.shape[1]``.
    """
    nrows = H.shape[1]
    row_idx = jnp.where(s_idx >= 0, s_idx % nrows, 0)
    row = jax.lax.dynamic_slice_in_dim(H, row_idx, 1, axis=1)[:, 0, :]
    row = row.astype(jnp.int32)
    row = jnp.where(row <= NULL16, NULL, row)
    return jnp.where(valid, row, NULL)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mismatch", "o1", "e1", "o2", "e2", "smax", "band", "keep_history", "ext_mode",
    ),
)
def wfa_align_device(
    Q,
    T,
    qlens,
    tlens,
    score_caps,
    *,
    mismatch: int,
    o1: int,
    e1: int,
    o2: int,
    e2: int,
    smax: int,
    band: int,
    keep_history: bool,
    ext_mode: str = "windowed",
):
    """Run batched WFA.  Returns (scores, done, histories).

    scores[b] = optimal alignment score, or -1 if not reached within
    min(smax, score_caps[b]).  histories: dict of int16 [B, smax+1, NDIAG]
    (empty dict when keep_history=False).
    """
    B = Q.shape[0]
    two_piece = o2 >= 0
    NDIAG = 2 * band + 1
    ks = jnp.arange(-band, band + 1, dtype=jnp.int32)
    d_final = (tlens - qlens) + band  # index of final diagonal per pair

    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    score_caps = score_caps.astype(jnp.int32)

    def store16(x):
        return jnp.clip(x, NULL16, 2**15 - 1).astype(jnp.int16)

    windowed = ext_mode == "windowed"
    if ext_mode in ("windowed", "full"):
        ext_table = _build_ext_table(Q, T, band)

        def extend(M):
            return _extend_with_table(M, ext_table, tlens)
    else:
        def extend(M):
            return _extend_all(M, ks, Q, T, qlens, tlens)

    # s = 0: M on diagonal 0 extends from offset 0.
    M0 = jnp.broadcast_to(jnp.where(ks[None, :] == 0, jnp.int32(0), NULL), (B, NDIAG))
    M0 = _valid_mask(M0, ks, qlens, tlens)
    M0 = extend(M0)
    if windowed:
        base0, W0 = _window_rebase(ext_table, M0)

    final_off0 = jnp.take_along_axis(M0, d_final[:, None], axis=1)[:, 0]
    done0 = final_off0 == tlens
    scores0 = jnp.where(done0, 0, -1)

    nhist = 5 if two_piece else 3
    if keep_history:
        hist_rows = smax + 1
    else:
        # rolling window: deepest lookback in the recurrences, plus 1
        hist_rows = max(mismatch, o1 + e1, (o2 + e2) if two_piece else 0) + 1
    hists0 = [jnp.full((B, hist_rows, NDIAG), NULL16, dtype=jnp.int16) for _ in range(nhist)]
    hists0[0] = hists0[0].at[:, 0, :].set(store16(M0))

    nullwf = jnp.full((B, NDIAG), NULL, dtype=jnp.int32)
    if windowed:
        state0 = (jnp.int32(1), done0, scores0, tuple(hists0), base0, W0)
    else:
        state0 = (jnp.int32(1), done0, scores0, tuple(hists0))

    def shift(row, direction):
        """shift offsets along diagonal axis: direction=+1 reads k-1 (from
        lower diagonal), -1 reads k+1."""
        if direction == +1:
            return jnp.concatenate([jnp.full((B, 1), NULL, jnp.int32), row[:, :-1]], axis=1)
        else:
            return jnp.concatenate([row[:, 1:], jnp.full((B, 1), NULL, jnp.int32)], axis=1)

    def cond(state):
        s, done = state[0], state[1]
        return (s <= smax) & ~jnp.all(done)

    def body(state):
        if windowed:
            s, done, scores, hists, base, W = state
        else:
            s, done, scores, hists = state
        if two_piece:
            HM, HI1, HD1, HI2, HD2 = hists
        else:
            HM, HI1, HD1 = hists

        m_x = _hist_row(HM, s - mismatch, s >= mismatch)
        m_o1 = _hist_row(HM, s - o1 - e1, s >= o1 + e1)
        i1_e = _hist_row(HI1, s - e1, s >= e1)
        d1_e = _hist_row(HD1, s - e1, s >= e1)

        I1 = jnp.maximum(shift(m_o1, -1), shift(i1_e, -1))
        D1 = jnp.maximum(shift(m_o1, +1), shift(d1_e, +1))
        D1 = jnp.where(D1 > NULL, D1 + 1, NULL)

        if two_piece:
            m_o2 = _hist_row(HM, s - o2 - e2, s >= o2 + e2)
            i2_e = _hist_row(HI2, s - e2, s >= e2)
            d2_e = _hist_row(HD2, s - e2, s >= e2)
            I2 = jnp.maximum(shift(m_o2, -1), shift(i2_e, -1))
            D2 = jnp.maximum(shift(m_o2, +1), shift(d2_e, +1))
            D2 = jnp.where(D2 > NULL, D2 + 1, NULL)
        else:
            I2 = nullwf
            D2 = nullwf

        I1 = _valid_mask(I1, ks, qlens, tlens)
        D1 = _valid_mask(D1, ks, qlens, tlens)
        I2 = _valid_mask(I2, ks, qlens, tlens)
        D2 = _valid_mask(D2, ks, qlens, tlens)

        Mmis = jnp.where(m_x > NULL, m_x + 1, NULL)
        M = jnp.maximum(jnp.maximum(Mmis, jnp.maximum(I1, D1)), jnp.maximum(I2, D2))
        M = _valid_mask(M, ks, qlens, tlens)
        if windowed:
            adv, ok_win, needs_full = _extend_windowed(M, base, W)

            def full_path(args):
                M, base, W = args
                Mext = _extend_with_table(M, ext_table, tlens)
                nbase, nW = _window_rebase(ext_table, Mext)
                return Mext, nbase, nW

            def win_path(args):
                M, base, W = args
                return jnp.where(ok_win, M + adv, M), base, W

            M, base, W = jax.lax.cond(
                jnp.any(needs_full), full_path, win_path, (M, base, W)
            )
        else:
            M = extend(M)

        final_off = jnp.take_along_axis(M, d_final[:, None], axis=1)[:, 0]
        newly_done = (~done) & (final_off == tlens) & (s <= score_caps)
        scores = jnp.where(newly_done, s, scores)
        done = done | newly_done | (s >= score_caps)

        def put(H, row):
            return jax.lax.dynamic_update_slice_in_dim(
                H, store16(row)[:, None, :], s % H.shape[1], axis=1
            )

        HM = put(HM, M)
        HI1 = put(HI1, I1)
        HD1 = put(HD1, D1)
        if two_piece:
            HI2 = put(HI2, I2)
            HD2 = put(HD2, D2)

        hists = (HM, HI1, HD1, HI2, HD2) if two_piece else (HM, HI1, HD1)
        if windowed:
            return (s + 1, done, scores, hists, base, W)
        return (s + 1, done, scores, hists)

    final_state = jax.lax.while_loop(cond, body, state0)
    s, done, scores, hists = final_state[:4]

    out_h = {}
    if keep_history:
        names = ["M", "I1", "D1", "I2", "D2"] if two_piece else ["M", "I1", "D1"]
        out_h = dict(zip(names, hists))
    return scores, out_h


# -----------------------------------------------------------------------------
# Host-side backtrace
# -----------------------------------------------------------------------------

# Tie-break precedence among co-optimal predecessors of an M cell.  WFA2's
# backtrace has its own fixed order; ours is deterministic and documented:
# mismatch, then short-gap deletions/insertions, then long-gap.
_M_ORDER = ("X", "D1", "I1", "D2", "I2")


def backtrace_pair(
    hist: dict[str, np.ndarray],
    score: int,
    qlen: int,
    tlen: int,
    band: int,
    pen: Penalties,
) -> list[tuple[int, str]]:
    """Recover the optimal alignment as a list of (count, op) CIGAR items.

    Ops: '=' match, 'X' mismatch, 'I' consume-query, 'D' consume-target.
    Uses the native C++ backtrace (csrc/seqrush_native.cpp) when available;
    the pure-Python path below is the behavioral specification.
    """
    try:
        from ..native import backtrace_native

        items = backtrace_native(
            hist,
            int(score),
            int(qlen),
            int(tlen),
            int(band),
            pen.mismatch,
            pen.gap1_open,
            pen.gap1_extend,
            pen.gap2_open if pen.two_piece else -1,
            pen.gap2_extend if pen.two_piece else -1,
        )
        if items is not None:
            return items
    except Exception:
        pass
    HM = hist["M"].astype(np.int32)
    HI1 = hist["I1"].astype(np.int32)
    HD1 = hist["D1"].astype(np.int32)
    two = pen.two_piece and "I2" in hist
    HI2 = hist["I2"].astype(np.int32) if two else None
    HD2 = hist["D2"].astype(np.int32) if two else None
    N16 = NULL16

    def h(H, s, d):
        if H is None or s < 0 or d < 0 or d >= HM.shape[1]:
            return None
        v = int(H[s, d])
        return None if v <= N16 else v

    x, o1, e1 = pen.mismatch, pen.gap1_open, pen.gap1_extend
    o2, e2 = (pen.gap2_open, pen.gap2_extend) if two else (None, None)

    ops: list[str] = []  # reversed ops, one char per base step
    s = int(score)
    k = tlen - qlen
    d = k + band
    off = tlen
    matrix = "M"

    while True:
        if matrix == "M":
            if s == 0:
                # initial extension from the origin: all matches
                ops.extend("=" * off)
                break
            cands: dict[str, int | None] = {
                "X": (h(HM, s - x, d) + 1) if h(HM, s - x, d) is not None else None,
                "D1": h(HD1, s, d),
                "I1": h(HI1, s, d),
                "D2": h(HD2, s, d) if two else None,
                "I2": h(HI2, s, d) if two else None,
            }
            best = max(v for v in cands.values() if v is not None)
            n_match = off - best
            assert n_match >= 0, "backtrace: extend underflow"
            ops.extend("=" * n_match)
            off = best
            for name in _M_ORDER:
                if cands[name] == best:
                    choice = name
                    break
            if choice == "X":
                ops.append("X")
                s, off, matrix = s - x, off - 1, "M"
            else:
                matrix = choice
        elif matrix in ("D1", "D2"):
            o, e = (o1, e1) if matrix == "D1" else (o2, e2)
            HD = HD1 if matrix == "D1" else HD2
            ops.append("D")
            prev_off = off - 1
            m_pred = h(HM, s - o - e, d - 1)
            if m_pred is not None and m_pred == prev_off:
                s, d, off, matrix = s - o - e, d - 1, prev_off, "M"
            else:
                d_pred = h(HD, s - e, d - 1)
                assert d_pred is not None and d_pred == prev_off, "backtrace: broken D chain"
                s, d, off = s - e, d - 1, prev_off
        else:  # I1 / I2
            o, e = (o1, e1) if matrix == "I1" else (o2, e2)
            HI = HI1 if matrix == "I1" else HI2
            ops.append("I")
            m_pred = h(HM, s - o - e, d + 1)
            if m_pred is not None and m_pred == off:
                s, d, matrix = s - o - e, d + 1, "M"
            else:
                i_pred = h(HI, s - e, d + 1)
                assert i_pred is not None and i_pred == off, "backtrace: broken I chain"
                s, d = s - e, d + 1

    # ops collected end->start; reverse and run-length encode
    ops.reverse()
    out: list[tuple[int, str]] = []
    for op in ops:
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + 1, op)
        else:
            out.append((1, op))
    return out


def cigar_string(items: list[tuple[int, str]]) -> str:
    return "".join(f"{n}{op}" for n, op in items)


def cigar_match_runs(items: list[tuple[int, str]]) -> list[tuple[int, int, int]]:
    """(q_start, t_start, length) for every '='-run of a CIGAR."""
    runs = []
    q = t = 0
    for n, op in items:
        if op == "=":
            runs.append((q, t, n))
            q += n
            t += n
        elif op == "X":
            q += n
            t += n
        elif op == "I":
            q += n
        elif op == "D":
            t += n
    return runs


# -----------------------------------------------------------------------------
# Reference DP (for tests): exact two-piece affine global alignment score
# -----------------------------------------------------------------------------


def affine2p_score_dp(q: np.ndarray, t: np.ndarray, pen: Penalties) -> int:
    """O(nm) Needleman-Wunsch with two-piece affine gaps; penalties positive."""
    INF = 10**9
    n, m = len(q), len(t)
    x, o1, e1 = pen.mismatch, pen.gap1_open, pen.gap1_extend
    two = pen.two_piece
    o2, e2 = (pen.gap2_open, pen.gap2_extend) if two else (INF, INF)
    M = np.full((n + 1, m + 1), INF, dtype=np.int64)
    I1 = np.full_like(M, INF)
    D1 = np.full_like(M, INF)
    I2 = np.full_like(M, INF)
    D2 = np.full_like(M, INF)
    M[0, 0] = 0
    for i in range(n + 1):
        for j in range(m + 1):
            best = M[i, j]
            if i > 0:
                I1[i, j] = min(M[i - 1, j] + o1 + e1, I1[i - 1, j] + e1)
                if two:
                    I2[i, j] = min(M[i - 1, j] + o2 + e2, I2[i - 1, j] + e2)
            if j > 0:
                D1[i, j] = min(M[i, j - 1] + o1 + e1, D1[i, j - 1] + e1)
                if two:
                    D2[i, j] = min(M[i, j - 1] + o2 + e2, D2[i, j - 1] + e2)
            best = min(best, I1[i, j], D1[i, j], I2[i, j], D2[i, j])
            if i > 0 and j > 0:
                sub = 0 if q[i - 1] == t[j - 1] else x
                best = min(best, M[i - 1, j - 1] + sub)
            M[i, j] = min(M[i, j], best)
    return int(M[n, m])
