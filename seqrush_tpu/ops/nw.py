"""Banded anti-diagonal Gotoh alignment (two-piece affine) — the
speed-of-light TPU formulation.

The WFA formulation (ops/wfa.py) is score-adaptive but needs per-diagonal
random access for its extend step, which TPUs cannot gather efficiently.
This kernel instead sweeps the full banded DP matrix by anti-diagonals:

* cell (i, j) lives on anti-diagonal t = i + j at lane l = i - i0(t), where
  i0(t) anchors a static band of width W around the main diagonal strip
  |i - j| <= K;
* every dependency is a lane shift of the previous one or two anti-diagonal
  rows (never a gather), and the substitution comparison is one dynamic
  slice of the query and of the reversed target per step;
* per step work is 6 x [B, W] elementwise min/add — pure VPU — and one
  packed uint8 [B, W] traceback row appended to HBM;
* the loop has a static trip count (max qlen+tlen over the batch) and a
  tiny body, so it compiles fast and runs at VPU speed.

Scores are exact whenever the optimal path stays within the band (the same
guarantee the banded WFA gives).  The traceback decodes on the host (C++ or
numpy) into the same standard CIGAR ops as ops/wfa.py ('I' consumes query,
'D' consumes target), with the same documented tie order (X, D1, I1, D2, I2).

DP (penalties, match = 0):
  H[i,j]  = min(H[i-1,j-1] + sub(i,j), I1, I2, D1, D2 at [i,j])
  I1[i,j] = min(H[i-1,j] + o1 + e1, I1[i-1,j] + e1)      (consume query)
  D1[i,j] = min(H[i,j-1] + o1 + e1, D1[i,j-1] + e1)      (consume target)
  (I2/D2 with o2/e2)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.int32(2**28)
QPAD = 6
TPAD = 7
# streamed substitution windows in _sweep_v3 (carried [B, W] windows +
# one-lane shifts instead of per-row dynamic slices).  Trace-time flag for
# kernel A/B measurement only — call jax.clear_caches() after flipping.
STREAM_WINDOWS = True
# streamed traceback rows in _tb_scan_tbw (tb consumed as reversed scan
# inputs instead of one dynamic slice per walk step).  Same A/B contract.
STREAM_WALK = True
# band-tiling measurement-only flags (trace-time, clear caches after
# flipping): TILED_HALO=False drops the sweep's cross-tile halo columns,
# TILED_SIB=False drops the walk's sibling byte-sharing rolls — both
# produce WRONG wide-pair results and exist solely to attribute the tiled
# kernel's per-step cost between its coupling mechanisms on real hardware.
TILED_HALO = True
TILED_SIB = True
# walk byte-extraction in narrow dtypes (uint8 masked-max + int16 lanes,
# exact — see _tb_scan_tbw).  Trace-time A/B flag, same contract as
# STREAM_WINDOWS: flip + jax.clear_caches() for measurement only.
WALK_U8 = True
# blocked-stripe walk (0 = off, else the block size S): the reverse walk
# consumes S traceback rows per scan step, extracting a [B, 2S+1]-lane
# stripe around each pair's block-entry lane with ONE int8 dot_general
# (MXU) instead of S per-row [B, W] masked reductions — exact because the
# walk's lane moves at most one per anti-diagonal row, so an S-row block
# never leaves the stripe.  The S micro-steps then update on [B, 2S+1]
# arrays.  Requires t_total % S == 0 and STREAM_WALK (callers fall back to
# the per-row walk otherwise).  Trace-time flag, same A/B contract.
WALK_BLOCK = 0

# traceback byte layout: bits 0-2 H choice (0=match/mismatch diag, 1=D1,
# 2=I1, 3=D2, 4=I2, 7=invalid); bit 3 I1 opened; bit 4 I2 opened;
# bit 5 D1 opened; bit 6 D2 opened
H_DIAG, H_D1, H_I1, H_D2, H_I2 = 0, 1, 2, 3, 4


def _i0_of(t, K):
    """Band anchor: first query index on anti-diagonal t (static schedule)."""
    return jnp.maximum((t - K + 1) // 2, 0)


def _dtype_inf(dtype):
    """Saturation value acting as +infinity for the given DP dtype.

    int16 mode saturates real scores too (see INT16_CUTOFF): every add is
    followed by a clamp to INF, so values never overflow (INF + max penalty
    stays below the dtype max) and any pair whose reported score reaches the
    cutoff must be re-run in int32.
    """
    return INF if dtype == jnp.int32 else jnp.int16(30000)


# scores at or above this in int16 mode are unreliable (saturation); the
# runner re-dispatches such pairs with dtype=int32
INT16_CUTOFF = 28000


def _sweep_tbw(
    Q, T, qlens, tlens, *,
    mismatch, o1, e1, o2, e2, band, tmax, with_traceback, dtype=jnp.int32,
    unroll=4,
):
    """Forward banded sweep; traceback rows in [t, B, W] layout via scan.

    The band anchor i0(t) = max((t-K+1)//2, 0) advances by 0 for t <= K and
    then alternates 1,0,1,0,... with t parity.  Exploiting that, the sweep
    splits into:

    * phase A (t in [1, TA], TA = min(K, tmax)): i0 = 0 — every dependency
      read is a fixed lane shift;
    * phase B (t > K): macro-steps of two rows with a statically known
      (dp=1 then dp=0) shift pattern and dpp = 1 throughout.

    This removes the 3-way `where(delta == ...)` select per dependency that
    the round-1 kernel paid on every row (2 extra shifted copies + 2 selects
    x 7 reads), roughly halving the per-row op count.

    Returns (scores [B] int32, tb [T_total+1, B, W] uint8, T_total) where
    T_total >= tmax (phase B rounds the row count up to an even pair).
    """
    B, Lq = Q.shape
    Lt = T.shape[1]
    K = band
    W = K + 1
    two = o2 >= 0
    NEG = _dtype_inf(dtype)

    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)

    Qp = jnp.pad(Q, ((0, 0), (1, W)), constant_values=QPAD)
    Trev = jnp.pad(T[:, ::-1], ((0, 0), (W, W)), constant_values=TPAD)

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]

    def row(val):
        return jnp.full((B, W), val, dtype=dtype)

    H1 = row(NEG).at[:, 0].set(0)  # t=0: only (0,0)
    H2 = row(NEG)
    I1r = row(NEG)
    D1r = row(NEG)
    I2r = row(NEG)
    D2r = row(NEG)
    scores = jnp.full((B,), -1, dtype=jnp.int32)

    inf_col = jnp.full((B, 1), NEG, dtype)

    def shift_right(x):
        return jnp.concatenate([inf_col, x[:, :-1]], axis=1)

    def shift_left(x):
        return jnp.concatenate([x[:, 1:], inf_col], axis=1)

    def compute_row(t, i0, deps, sub):
        """One anti-diagonal given already-framed dependency rows."""
        h_up, h_left, h_diag, i1_up, d1_left, i2_up, d2_left = deps
        I1n = jnp.minimum(h_up + (o1 + e1), i1_up + e1)
        i1_opened = (h_up + (o1 + e1)) <= (i1_up + e1)
        D1n = jnp.minimum(h_left + (o1 + e1), d1_left + e1)
        d1_opened = (h_left + (o1 + e1)) <= (d1_left + e1)
        if two:
            I2n = jnp.minimum(h_up + (o2 + e2), i2_up + e2)
            i2_opened = (h_up + (o2 + e2)) <= (i2_up + e2)
            D2n = jnp.minimum(h_left + (o2 + e2), d2_left + e2)
            d2_opened = (h_left + (o2 + e2)) <= (d2_left + e2)
        else:
            I2n = jnp.full((B, W), NEG, dtype)
            D2n = jnp.full((B, W), NEG, dtype)
            i2_opened = jnp.zeros((B, W), bool)
            d2_opened = jnp.zeros((B, W), bool)

        Hn = h_diag + sub
        choice = jnp.full((B, W), H_DIAG, jnp.uint8)
        for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            choice = jnp.where(better, jnp.uint8(tag), choice)

        i = i0 + lanes
        j = t - i
        valid = (i >= 0) & (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])
        Hn = jnp.where(valid, jnp.minimum(Hn, NEG), NEG)
        I1n = jnp.where(valid, jnp.minimum(I1n, NEG), NEG)
        D1n = jnp.where(valid, jnp.minimum(D1n, NEG), NEG)
        I2n = jnp.where(valid, jnp.minimum(I2n, NEG), NEG)
        D2n = jnp.where(valid, jnp.minimum(D2n, NEG), NEG)

        packed = (
            choice
            | (i1_opened.astype(jnp.uint8) << 3)
            | (i2_opened.astype(jnp.uint8) << 4)
            | (d1_opened.astype(jnp.uint8) << 5)
            | (d2_opened.astype(jnp.uint8) << 6)
        )
        return Hn, I1n, D1n, I2n, D2n, packed

    def capture_score(scores, t, i0, Hn):
        fin_lane = qlens[:, None] - i0
        at_final = (t == (qlens + tlens))[:, None] & (lanes == fin_lane)
        fin_val = jnp.min(jnp.where(at_final, Hn.astype(jnp.int32), INF), axis=1)
        return jnp.where(
            (t == (qlens + tlens)) & (scores < 0) & (fin_val < INF), fin_val, scores
        )

    def sub_at(t, i0):
        qwin = jax.lax.dynamic_slice_in_dim(
            Qp, jnp.clip(i0, 0, Qp.shape[1] - W), W, axis=1
        )
        twin = jax.lax.dynamic_slice_in_dim(
            Trev, jnp.clip(Lt - t + i0 + W, 0, Trev.shape[1] - W), W, axis=1
        )
        return jnp.where(qwin == twin, 0, mismatch).astype(dtype)

    # ---- phase A: t in [1, TA], i0 = 0: up/diag = shift_right, left = id --
    TA = min(K, tmax)

    def body_a(carry, t):
        H1, H2, I1r, D1r, I2r, D2r, scores = carry
        deps = (
            shift_right(H1), H1, shift_right(H2),
            shift_right(I1r), D1r, shift_right(I2r), D2r,
        )
        Hn, I1n, D1n, I2n, D2n, packed = compute_row(t, 0, deps, sub_at(t, 0))
        scores = capture_score(scores, t, 0, Hn)
        carry = (Hn, H1, I1n, D1n, I2n, D2n, scores)
        return carry, packed if with_traceback else jnp.zeros((B, 0), jnp.uint8)

    carry = (H1, H2, I1r, D1r, I2r, D2r, scores)
    ts_a = jnp.arange(1, TA + 1, dtype=jnp.int32)
    carry, tb_a = jax.lax.scan(body_a, carry, ts_a, unroll=unroll)

    # ---- phase B: t in [TA+1, TA+2M], macro-steps of (dp=1, dp=0) rows ----
    M = max(0, -(-(tmax - TA) // 2))
    T_total = TA + 2 * M

    def body_b(carry, m):
        H1, H2, I1r, D1r, I2r, D2r, scores = carry
        # row 1: t1 = TA + 1 + 2m, dp = 1, dpp = 1:
        #   up/diag lane delta 0 (identity), left delta +1 (shift_left)
        t1 = TA + 1 + 2 * m
        i0_1 = (t1 - K + 1) // 2
        deps = (H1, shift_left(H1), H2, I1r, shift_left(D1r), I2r, shift_left(D2r))
        Hn, I1n, D1n, I2n, D2n, p1 = compute_row(t1, i0_1, deps, sub_at(t1, i0_1))
        scores = capture_score(scores, t1, i0_1, Hn)
        H2, H1 = H1, Hn
        I1r, D1r, I2r, D2r = I1n, D1n, I2n, D2n
        # row 2: t2 = t1 + 1, dp = 0, dpp = 1:
        #   up delta -1 (shift_right), left delta 0, diag delta 0
        t2 = t1 + 1
        i0_2 = i0_1  # dp = 0
        deps = (shift_right(H1), H1, H2, shift_right(I1r), D1r, shift_right(I2r), D2r)
        Hn, I1n, D1n, I2n, D2n, p2 = compute_row(t2, i0_2, deps, sub_at(t2, i0_2))
        scores = capture_score(scores, t2, i0_2, Hn)
        carry = (Hn, H1, I1n, D1n, I2n, D2n, scores)
        ys = (
            jnp.stack([p1, p2]) if with_traceback else jnp.zeros((2, B, 0), jnp.uint8)
        )
        return carry, ys

    if M > 0:
        ms = jnp.arange(M, dtype=jnp.int32)
        carry, tb_b = jax.lax.scan(body_b, carry, ms, unroll=max(unroll // 2, 1))
    scores = carry[6]

    if not with_traceback:
        return scores, None, T_total

    parts = [jnp.zeros((1, B, W), jnp.uint8), tb_a]
    if M > 0:
        parts.append(tb_b.reshape(2 * M, B, W))
    tb = jnp.concatenate(parts, axis=0)  # [T_total + 1, B, W]
    return scores, tb, T_total


def _sweep_v3(
    Q, T, qlens, tlens, *,
    mismatch, o1, e1, o2, e2, band, tmax, with_traceback, dtype=jnp.int32,
    unroll=2, t_snap=None,
):
    """Forward banded sweep, v3: minimal fusion-breaking ops per row.

    Same DP and traceback-byte semantics as _sweep_tbw (the behavioral
    specification), restructured for the measured TPU cost model (the scan
    body is latency-bound on op dispatch, flat in B and W):

    * the six DP rows live in ONE stacked [6, B, W] carry, so each row's
      dependency framing is a single shifted copy of the whole stack
      (one concatenate) instead of 3-4 per-array shifts;
    * int32 mode drops the per-row validity clamp entirely: invalid cells
      (i > qlen, j > tlen, or j < 0) start at NEG=2^28 and only ever gain
      small penalty increments (<= ~33/row, bounded by tmax << 2^31), and
      the DP flow is monotone in (i, j) so they can never reach the final
      cell (i = qlen, j = tlen) — the clamp existed only to stop int16
      overflow, so int16 mode keeps it;
    * score capture is one predicated copy per row into a carried FIN row
      ([B, W]); the per-pair final lane is extracted once after the loop;
    * phase A's query window is static (i0 = 0) and hoisted out of the loop.

    t_snap (optional [B] int32): per-row snapshot anti-diagonal for the
    bidirectional fold (nw_align_fold).  When given, the sweep additionally
    captures, per row b: the full stacked carry at t == t_snap[b]
    (SNAP [6, B, W]: H(t), H(t-1), I1, D1, I2, D2 — each in its own lane
    frame) and the H diagonal-arrival candidate h_diag + sub at
    t == t_snap[b] (DIAGA) and t == t_snap[b] + 1 (DIAGB).  Returns change
    from (scores, tb, T_total) to (scores, tb, (SNAP, DIAGA, DIAGB),
    T_total).  Captures are predicated copies fused into the row body.
    """
    B, Lq = Q.shape
    Lt = T.shape[1]
    K = band
    W = K + 1
    two = o2 >= 0
    NEG = _dtype_inf(dtype)
    clamp = dtype == jnp.int16

    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)

    Qp = jnp.pad(Q, ((0, 0), (1, W)), constant_values=QPAD)
    Trev = jnp.pad(T[:, ::-1], ((0, 0), (W, W)), constant_values=TPAD)

    # streamed substitution windows: the window start moves by EXACTLY -1
    # per row (target side) / +1 per macro step (query side), so the
    # per-row dynamic_slice windows can instead be carried [B, W] arrays
    # updated by a one-lane shift whose incoming column is a precomputed
    # scan input — removing 3 fusion-breaking dynamic-slice regions per
    # macro step from the serial body (the measured per-step cost is
    # per-REGION sequencing overhead, docs/ROUND2_NOTES.md).  Dead rows
    # whose v3 window start would have clipped have no valid lanes (their
    # i0 > qlen for every lane), so the streamed values there may differ
    # without affecting any score, FIN capture, or walked traceback cell.
    stream = STREAM_WINDOWS and t_snap is None
    if stream:
        TA_s = min(K, tmax)
        M_s = max(0, -(-(tmax - TA_s) // 2))
        # extend paddings so the streams never index out of bounds
        eq = max(0, M_s - Lq)
        Qps = jnp.pad(Q, ((0, 0), (1, W + eq)), constant_values=QPAD)
        et = max(0, K + M_s - Lt - W)
        TrevS = jnp.pad(T[:, ::-1], ((0, 0), (W + et, W)), constant_values=TPAD)
        # phase A incoming target columns: old coords Lt+W-t, t = 1..TA
        tcols_a = TrevS[:, et + Lt + W - TA_s : et + Lt + W][:, ::-1].T
        # phase B: query cols at W+m, target cols at Lt+W-K-1-m (old coords)
        qcols_b = Qps[:, W : W + M_s].T
        tcols_b = TrevS[:, et + Lt + W - K - M_s : et + Lt + W - K][:, ::-1].T
        qwin0 = Qps[:, :W]
        twin0 = TrevS[:, et + Lt + W : et + Lt + 2 * W]

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]
    fin_t = qlens + tlens  # [B]

    # stacked DP state: rows [H1, H2, I1, D1, I2, D2]
    H0 = jnp.full((B, W), NEG, dtype).at[:, 0].set(0)
    S = jnp.stack([
        H0,
        jnp.full((B, W), NEG, dtype),
        jnp.full((B, W), NEG, dtype),
        jnp.full((B, W), NEG, dtype),
        jnp.full((B, W), NEG, dtype),
        jnp.full((B, W), NEG, dtype),
    ])
    FIN = jnp.where((fin_t == 0)[:, None], H0, jnp.full((B, W), NEG, dtype))

    inf_col6 = jnp.full((6, B, 1), NEG, dtype)

    def sr6(S):
        return jnp.concatenate([inf_col6, S[:, :, :-1]], axis=2)

    def sl6(S):
        return jnp.concatenate([S[:, :, 1:], inf_col6], axis=2)

    def compute_row(t, i0, deps, sub, valid_fn):
        h_up, h_left, h_diag, i1_up, d1_left, i2_up, d2_left = deps
        I1n = jnp.minimum(h_up + (o1 + e1), i1_up + e1)
        i1_opened = (h_up + (o1 + e1)) <= (i1_up + e1)
        D1n = jnp.minimum(h_left + (o1 + e1), d1_left + e1)
        d1_opened = (h_left + (o1 + e1)) <= (d1_left + e1)
        if two:
            I2n = jnp.minimum(h_up + (o2 + e2), i2_up + e2)
            i2_opened = (h_up + (o2 + e2)) <= (i2_up + e2)
            D2n = jnp.minimum(h_left + (o2 + e2), d2_left + e2)
            d2_opened = (h_left + (o2 + e2)) <= (d2_left + e2)
        else:
            I2n = jnp.full((B, W), NEG, dtype)
            D2n = jnp.full((B, W), NEG, dtype)
            i2_opened = jnp.zeros((B, W), bool)
            d2_opened = jnp.zeros((B, W), bool)

        Hn = h_diag + sub
        choice = jnp.full((B, W), H_DIAG, jnp.uint8)
        for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            choice = jnp.where(better, jnp.uint8(tag), choice)

        Hdiag = h_diag + sub  # M-arrival candidate (fold snapshot; else DCE'd)
        if clamp:
            valid = valid_fn()
            Hn = jnp.where(valid, jnp.minimum(Hn, NEG), NEG)
            I1n = jnp.where(valid, jnp.minimum(I1n, NEG), NEG)
            D1n = jnp.where(valid, jnp.minimum(D1n, NEG), NEG)
            I2n = jnp.where(valid, jnp.minimum(I2n, NEG), NEG)
            D2n = jnp.where(valid, jnp.minimum(D2n, NEG), NEG)
            Hdiag = jnp.where(valid, jnp.minimum(Hdiag, NEG), NEG)

        packed = (
            choice
            | (i1_opened.astype(jnp.uint8) << 3)
            | (i2_opened.astype(jnp.uint8) << 4)
            | (d1_opened.astype(jnp.uint8) << 5)
            | (d2_opened.astype(jnp.uint8) << 6)
        )
        return Hn, I1n, D1n, I2n, D2n, packed, Hdiag

    def twin_at(t, i0):
        return jax.lax.dynamic_slice_in_dim(
            Trev, jnp.clip(Lt - t + i0 + W, 0, Trev.shape[1] - W), W, axis=1
        )

    # fold snapshots: SNAP holds the stacked carry at t == t_snap per row;
    # DIAGA/DIAGB hold the M-arrival candidate at t_snap / t_snap + 1.
    # t_snap == 0 snapshots the initial state (origin row).
    fold = t_snap is not None
    if fold:
        t_snap = t_snap.astype(jnp.int32)
        SNAP = jnp.where((t_snap == 0)[None, :, None], S, NEG)
        DIAGA = jnp.full((B, W), NEG, dtype)
        DIAGB = jnp.full((B, W), NEG, dtype)

    def snap_update(snaps, t, Sn, Hdiag):
        if not fold:
            return snaps
        SNAP, DIAGA, DIAGB = snaps
        hit = (t == t_snap)[:, None]
        SNAP = jnp.where(hit[None], Sn, SNAP)
        DIAGA = jnp.where(hit, Hdiag, DIAGA)
        DIAGB = jnp.where((t == t_snap + 1)[:, None], Hdiag, DIAGB)
        return SNAP, DIAGA, DIAGB

    snaps0 = (SNAP, DIAGA, DIAGB) if fold else ()

    # ---- phase A: t in [1, TA], i0 = 0 -----------------------------------
    TA = min(K, tmax)
    qwin_a = Qp[:, :W] if not stream else qwin0  # static: i0 = 0 in phase A

    def body_a(carry, xs):
        if stream:
            S, FIN, snaps, Twin = carry
            t, tcol = xs
            Twin = jnp.concatenate([tcol[:, None], Twin[:, :-1]], axis=1)
            twin = Twin
        else:
            S, FIN, snaps = carry
            t = xs
            twin = twin_at(t, 0)
        R = sr6(S)
        deps = (R[0], S[0], R[1], R[2], S[3], R[4], S[5])
        sub = jnp.where(qwin_a == twin, 0, mismatch).astype(dtype)

        def valid_fn():
            i = lanes
            j = t - i
            return (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])

        Hn, I1n, D1n, I2n, D2n, packed, Hdiag = compute_row(t, 0, deps, sub, valid_fn)
        FIN = jnp.where((t == fin_t)[:, None], Hn, FIN)
        Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        snaps = snap_update(snaps, t, Sn, Hdiag)
        out = (Sn, FIN, snaps, Twin) if stream else (Sn, FIN, snaps)
        return out, packed if with_traceback else jnp.zeros((B, 0), jnp.uint8)

    ts_a = jnp.arange(1, TA + 1, dtype=jnp.int32)
    if stream:
        carry = (S, FIN, snaps0, twin0)
        carry, tb_a = jax.lax.scan(
            body_a, carry, (ts_a, tcols_a), unroll=unroll
        )
    else:
        carry = (S, FIN, snaps0)
        carry, tb_a = jax.lax.scan(body_a, carry, ts_a, unroll=unroll)

    # ---- phase B: macro-steps of (dp=1, dp=0) rows ------------------------
    M = max(0, -(-(tmax - TA) // 2))
    T_total = TA + 2 * M

    def body_b(carry, xs):
        if stream:
            S, FIN, snaps, qwin, Twin = carry
            m, qcol, tcol = xs
            qwin = jnp.concatenate([qwin[:, 1:], qcol[:, None]], axis=1)
            twin1 = Twin  # t1's window == previous row's (start unchanged)
        else:
            S, FIN, snaps = carry
            m = xs
        t1 = TA + 1 + 2 * m
        i0 = (t1 - K + 1) // 2
        if not stream:
            qwin = jax.lax.dynamic_slice_in_dim(
                Qp, jnp.clip(i0, 0, Qp.shape[1] - W), W, axis=1
            )
            twin1 = twin_at(t1, i0)
        # row 1: dp = 1, dpp = 1 — up/diag identity, left shift_left
        L = sl6(S)
        deps = (S[0], L[0], S[1], S[2], L[3], S[4], L[5])
        sub = jnp.where(qwin == twin1, 0, mismatch).astype(dtype)

        def valid1():
            i = i0 + lanes
            j = t1 - i
            return (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])

        Hn, I1n, D1n, I2n, D2n, p1, Hdiag = compute_row(t1, i0, deps, sub, valid1)
        FIN = jnp.where((t1 == fin_t)[:, None], Hn, FIN)
        S = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        snaps = snap_update(snaps, t1, S, Hdiag)
        # row 2: t2 = t1 + 1, dp = 0, dpp = 1 — up shift_right, left/diag id
        t2 = t1 + 1
        if stream:
            Twin = jnp.concatenate([tcol[:, None], Twin[:, :-1]], axis=1)
            twin2 = Twin
        else:
            twin2 = twin_at(t2, i0)
        R = sr6(S)
        deps = (R[0], S[0], S[1], R[2], S[3], R[4], S[5])
        sub = jnp.where(qwin == twin2, 0, mismatch).astype(dtype)

        def valid2():
            i = i0 + lanes
            j = t2 - i
            return (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])

        Hn, I1n, D1n, I2n, D2n, p2, Hdiag = compute_row(t2, i0, deps, sub, valid2)
        FIN = jnp.where((t2 == fin_t)[:, None], Hn, FIN)
        Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        snaps = snap_update(snaps, t2, Sn, Hdiag)
        ys = (
            jnp.stack([p1, p2]) if with_traceback else jnp.zeros((2, B, 0), jnp.uint8)
        )
        out = (Sn, FIN, snaps, qwin, Twin) if stream else (Sn, FIN, snaps)
        return out, ys

    if M > 0:
        ms = jnp.arange(M, dtype=jnp.int32)
        if stream:
            S_c, FIN_c, snaps_c, Twin_c = carry
            carry = (S_c, FIN_c, snaps_c, qwin_a, Twin_c)
            carry, tb_b = jax.lax.scan(
                body_b, carry, (ms, qcols_b, tcols_b),
                unroll=max(unroll // 2, 1),
            )
        else:
            carry, tb_b = jax.lax.scan(
                body_b, carry, ms, unroll=max(unroll // 2, 1)
            )
    S, FIN, snaps_out = carry[0], carry[1], carry[2]

    # extract per-pair final-lane score (one masked reduce, outside the loop)
    i0_fin = jnp.maximum((fin_t - K + 1) // 2, 0)
    fin_lane = qlens - i0_fin
    fin_val = jnp.min(
        jnp.where(lanes == fin_lane[:, None], FIN.astype(jnp.int32), INF), axis=1
    )
    finished = (fin_t <= T_total) & (fin_val < INF)
    scores = jnp.where(finished, fin_val, -1)

    if not with_traceback:
        if fold:
            return scores, None, snaps_out, T_total
        return scores, None, T_total

    parts = [jnp.zeros((1, B, W), jnp.uint8), tb_a]
    if M > 0:
        parts.append(tb_b.reshape(2 * M, B, W))
    tb = jnp.concatenate(parts, axis=0)  # [T_total + 1, B, W]
    if fold:
        return scores, tb, snaps_out, T_total
    return scores, tb, T_total


@functools.partial(
    jax.jit,
    static_argnames=("mismatch", "o1", "e1", "o2", "e2", "band", "tmax", "with_traceback"),
)
def nw_align_device(
    Q,
    T,
    qlens,
    tlens,
    *,
    mismatch: int,
    o1: int,
    e1: int,
    o2: int,
    e2: int,
    band: int,
    tmax: int,
    with_traceback: bool,
):
    """Banded two-piece-affine global alignment for a batch of pairs.

    Q [B, Lq] / T [B, Lt]: base codes padded with QPAD/TPAD.
    band: half-width K; lanes cover i in [i0(t), i0(t)+W).
    tmax: static anti-diagonal count (>= max qlen+tlen).
    Returns (scores [B] int32, traceback [B, tmax+1, W] uint8 or empty).

    Compatibility wrapper over the phase-split sweep (_sweep_tbw); the hot
    path (nw_align_with_opcodes) keeps the traceback in [t, B, W] layout and
    never materializes this transpose.
    """
    scores, tb, _ = _sweep_tbw(
        Q, T, qlens, tlens,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, tmax=tmax, with_traceback=with_traceback,
    )
    if not with_traceback:
        return scores, jnp.zeros((Q.shape[0], 1, 1), dtype=jnp.uint8)
    return scores, jnp.transpose(tb[: tmax + 1], (1, 0, 2))


# -----------------------------------------------------------------------------
# Host traceback
# -----------------------------------------------------------------------------


def _i0_host(t, K):
    return max((t - K + 1) // 2, 0)


def traceback_pair(
    tb: np.ndarray, qlen: int, tlen: int, band: int
) -> list[tuple[int, str]]:
    """Decode one pair's packed traceback into run-length CIGAR items.

    Prefers the native C++ walk (csrc/seqrush_native.cpp nw_traceback); the
    Python loop below is the behavioral specification."""
    try:
        from ..native import nw_traceback_native

        items = nw_traceback_native(tb, qlen, tlen, band)
        if items is not None:
            return items
    except Exception:
        pass
    K = band
    W = K + 1
    ops: list[str] = []
    i, j = qlen, tlen
    state = "H"
    while i > 0 or j > 0:
        t = i + j
        l = i - _i0_host(t, K)
        if not (0 <= l < W):
            # out-of-band walk = corrupted traceback; fail loudly (matches
            # the C++ twin's -1 error return in csrc nw_traceback)
            raise AssertionError(
                f"traceback escaped the band at t={t} (lane {l}, W={W})"
            )
        b = int(tb[t, l])
        if state == "H":
            choice = b & 7
            if choice == H_DIAG:
                # bases are not visible here; emit 'M' and let
                # resolve_matches() split into '='/'X' against the sequences
                ops.append("M")
                i -= 1
                j -= 1
            elif choice == H_D1:
                state = "D1"
            elif choice == H_I1:
                state = "I1"
            elif choice == H_D2:
                state = "D2"
            elif choice == H_I2:
                state = "I2"
            else:
                raise AssertionError("invalid traceback cell")
        elif state in ("I1", "I2"):
            opened = bool(b & (8 if state == "I1" else 16))
            ops.append("I")
            i -= 1
            if opened:
                state = "H"
        else:  # D1 / D2
            opened = bool(b & (32 if state == "D1" else 64))
            ops.append("D")
            j -= 1
            if opened:
                state = "H"
    ops.reverse()
    # run-length encode (M placeholders resolved by resolve_matches)
    out: list[tuple[int, str]] = []
    for op in ops:
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + 1, op)
        else:
            out.append((1, op))
    return out


def resolve_matches(
    items: list[tuple[int, str]], q: np.ndarray, t: np.ndarray
) -> list[tuple[int, str]]:
    """Split 'M' runs into '='/'X' by comparing bases (vectorized: the inner
    loop runs over equal/unequal segments, not bases)."""
    out: list[tuple[int, str]] = []
    qi = ti = 0
    q = np.asarray(q)
    t = np.asarray(t)

    def push(n, op):
        if n <= 0:
            return
        if out and out[-1][1] == op:
            out[-1] = (out[-1][0] + n, op)
        else:
            out.append((n, op))

    for n, op in items:
        if op == "M":
            eq = q[qi : qi + n] == t[ti : ti + n]
            idx = np.flatnonzero(np.diff(eq)) + 1
            bounds = np.concatenate([[0], idx, [n]])
            for s_b, e_b in zip(bounds[:-1], bounds[1:]):
                push(int(e_b - s_b), "=" if eq[s_b] else "X")
            qi += n
            ti += n
        else:
            push(n, op)
            if op == "I":
                qi += n
            elif op == "D":
                ti += n
    return out


# -----------------------------------------------------------------------------
# Device-side traceback: reverse scan over anti-diagonals
# -----------------------------------------------------------------------------

OP_NONE, OP_M, OP_I, OP_D = 0, 1, 2, 3


@functools.partial(jax.jit, static_argnames=("band", "tmax"))
def traceback_scan_device(tb, qlens, tlens, *, band: int, tmax: int):
    """Walk every pair's optimal path on device; returns 2-bit-packed
    opcodes [B, ceil((tmax+1)/4)] (see pack_opcodes / unpack_opcodes).

    The host walk (traceback_pair) reads one packed byte per step, which
    forces the whole [B, tmax, W] byte tensor across the host link.  The walk
    visits at most one cell per anti-diagonal, so a reverse scan over t reads
    each row once (a dynamic slice), selects each pair's byte with a one-hot
    over W lanes, and emits a 2-bit opcode per (pair, t):
    0 none, 1 M (diagonal), 2 I (consume query), 3 D (consume target).
    Only the [B, tmax+1] opcode tensor leaves the device (~W times smaller).
    Gap-state switches consume the same byte as the gap op itself, matching
    traceback_pair exactly.
    """
    B = tb.shape[0]
    W = band + 1
    K = band
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    cur_t0 = qlens + tlens
    l0 = qlens - i0_of(cur_t0)
    mat0 = jnp.zeros(B, jnp.int32)  # 0 H, 1 D1, 2 I1, 3 D2, 4 I2
    done0 = cur_t0 == 0

    def body(state, td):
        cur_t, l, mat, done = state
        row = jax.lax.dynamic_slice_in_dim(tb, td, 1, axis=1)[:, 0, :].astype(jnp.int32)
        active = (~done) & (cur_t == td)
        b = jnp.sum(jnp.where(lanes == l[:, None], row, 0), axis=1)

        i0_t = i0_of(td)
        i = i0_t + l
        j = td - i

        choice = b & 7
        is_h = mat == 0
        # which gap family acts this step (either entered from H or ongoing)
        go_d1 = (is_h & (choice == H_D1)) | (mat == 1)
        go_i1 = (is_h & (choice == H_I1)) | (mat == 2)
        go_d2 = (is_h & (choice == H_D2)) | (mat == 3)
        go_i2 = (is_h & (choice == H_I2)) | (mat == 4)
        diag = is_h & (choice == H_DIAG)

        opened = jnp.where(
            go_d1, (b >> 5) & 1,
            jnp.where(go_i1, (b >> 3) & 1,
                      jnp.where(go_d2, (b >> 6) & 1, (b >> 4) & 1)),
        ).astype(jnp.bool_)

        gap_d = go_d1 | go_d2
        gap_i = go_i1 | go_i2

        op = jnp.where(diag, OP_M, jnp.where(gap_i, OP_I, jnp.where(gap_d, OP_D, OP_NONE)))
        ni = jnp.where(diag | gap_i, i - 1, i)
        nj = jnp.where(diag | gap_d, j - 1, j)
        nmat = jnp.where(
            diag | opened,
            0,
            jnp.where(go_d1, 1, jnp.where(go_i1, 2, jnp.where(go_d2, 3, 4))),
        )

        nt = ni + nj
        nl = ni - i0_of(nt)
        ndone = (ni == 0) & (nj == 0)

        cur_t = jnp.where(active, nt, cur_t)
        l = jnp.where(active, nl, l)
        mat = jnp.where(active, nmat, mat)
        done = done | (active & ndone)
        emitted = jnp.where(active, op, OP_NONE).astype(jnp.uint8)
        return (cur_t, l, mat, done), emitted

    tds = jnp.arange(tmax, 0, -1, dtype=jnp.int32)
    _, ops_rev = jax.lax.scan(body, (cur_t0, l0, mat0, done0), tds)
    # ops_rev[k] corresponds to anti-diagonal tds[k]; re-index to [B, tmax+1]
    ops = jnp.concatenate(
        [jnp.zeros((1, B), jnp.uint8), ops_rev[::-1]], axis=0
    ).T
    return pack_opcodes(ops)


def pack_opcodes(ops):
    """2-bit-pack a [B, L] opcode tensor (values 0..3) to [B, ceil(L/4)].

    Opcode streams are the largest per-dispatch device->host transfer; the
    host link through the axon tunnel moves ~15 MB/s (measured,
    docs/PROFILE_TPU_V3.json d2h_opcodes), so shrinking the fetch 4x takes
    ~32 ms off every chunk.  One reshape + dot on device, outside the scan.
    """
    B, L = ops.shape
    pad = (-L) % 4
    if pad:
        ops = jnp.pad(ops, ((0, 0), (0, pad)))
    g = ops.reshape(B, -1, 4).astype(jnp.int32)
    packed = g[:, :, 0] | (g[:, :, 1] << 2) | (g[:, :, 2] << 4) | (g[:, :, 3] << 6)
    return packed.astype(jnp.uint8)


def unpack_opcodes(packed: np.ndarray, length: int) -> np.ndarray:
    """Host inverse of pack_opcodes: [B, ceil(L/4)] -> [B, length] uint8."""
    packed = np.asarray(packed)
    B = packed.shape[0]
    out = np.empty((B, packed.shape[1], 4), np.uint8)
    for k in range(4):
        out[:, :, k] = (packed >> (2 * k)) & 3
    return out.reshape(B, -1)[:, :length]


def decode_opcodes(op_row: np.ndarray) -> list[tuple[int, str]]:
    """[tmax+1] opcodes -> run-length items with 'M' placeholders (ascending
    t = forward sequence order); resolve with resolve_matches()."""
    codes = np.asarray(op_row)
    nz = codes[codes != OP_NONE]
    if nz.size == 0:
        return []
    syms = np.array([0, ord("M"), ord("I"), ord("D")], dtype=np.uint8)[nz]
    # run-length encode
    change = np.empty(nz.size, dtype=bool)
    change[0] = True
    change[1:] = syms[1:] != syms[:-1]
    starts = np.nonzero(change)[0]
    ends = np.append(starts[1:], nz.size)
    return [(int(e - s), chr(syms[s])) for s, e in zip(starts, ends)]


_SYM_CHARS = ("", "=", "X", "I", "D")


def decode_batch(
    ops: np.ndarray,
    qs: list[np.ndarray],
    ts: list[np.ndarray],
) -> list[list[tuple[int, str]]]:
    """Vectorized whole-batch equivalent of per-pair decode_opcodes +
    resolve_matches.

    ops [B, L] uint8 (0 none, 1 M, 2 I, 3 D) in ascending anti-diagonal
    order; qs/ts are the per-row base-code arrays.  Returns one run-length
    CIGAR item list per row with 'M' already split into '='/'X'.

    This replaces the per-pair Python decode on the hot path: cursor
    positions come from two cumsums, the M-step base comparison is one
    fancy-index gather, and run boundaries fall out of a single RLE over
    the flattened symbol stream (rows separated by sentinel tokens).  The
    only Python loop runs over CIGAR runs (~50-150 per pair), not bases.
    Measured on the 600-pair saturation workload this cuts the host decode
    phase from ~1.0 s single-threaded to <0.1 s.
    """
    ops = np.asarray(ops)
    B, L = ops.shape
    if B == 0:
        return []
    Lq = max(1, max(q.size for q in qs))
    Lt = max(1, max(t.size for t in ts))
    # distinct pads: an M step beyond either sequence (cannot happen for a
    # valid walk) decodes as 'X', never a fabricated '='
    Qh = np.full((B, Lq), 254, np.uint8)
    Th = np.full((B, Lt), 255, np.uint8)
    for b, (q, t) in enumerate(zip(qs, ts)):
        Qh[b, : q.size] = q
        Th[b, : t.size] = t

    is_m = ops == OP_M
    qcons = is_m | (ops == OP_I)
    tcons = is_m | (ops == OP_D)
    # index of the query/target base consumed at each step (0-based)
    qpos = np.cumsum(qcons, axis=1, dtype=np.int32)
    np.subtract(qpos, qcons, out=qpos)
    tpos = np.cumsum(tcons, axis=1, dtype=np.int32)
    np.subtract(tpos, tcons, out=tpos)

    # symbol codes: 0 none, 1 '=', 2 'X', 3 'I', 4 'D'  (see _SYM_CHARS)
    sym = np.zeros((B, L), np.uint8)
    bm, lm = np.nonzero(is_m)
    if bm.size:
        eq = Qh[bm, np.minimum(qpos[bm, lm], Lq - 1)] == Th[
            bm, np.minimum(tpos[bm, lm], Lt - 1)
        ]
        sym[bm, lm] = np.where(eq, 1, 2).astype(np.uint8)
    sym[ops == OP_I] = 3
    sym[ops == OP_D] = 4

    # flatten with per-row sentinel breaks, drop inactive steps, RLE
    flat = np.concatenate([np.full((B, 1), 5, np.uint8), sym], axis=1).ravel()
    keep = flat != 0
    comp = flat[keep]
    rowid = np.repeat(np.arange(B, dtype=np.int32), L + 1)[keep]
    change = np.empty(comp.size, dtype=bool)
    change[0] = True
    change[1:] = comp[1:] != comp[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, comp.size))
    vals = comp[starts]
    rows = rowid[starts]

    out: list[list[tuple[int, str]]] = [[] for _ in range(B)]
    for r, v, n in zip(rows.tolist(), vals.tolist(), lengths.tolist()):
        if v == 5:
            continue
        out[r].append((int(n), _SYM_CHARS[v]))
    return out


# -----------------------------------------------------------------------------
# Segmented sweep: long-sequence support with bounded per-segment memory
# -----------------------------------------------------------------------------
# The reference requires whole pairs in memory (README.md:225).  Here pairs of
# arbitrary length stream through fixed-size segments of SEG anti-diagonals:
# the six DP state rows carry across segment calls and are checkpointed at
# segment boundaries; the reverse opcode scan recomputes one segment's
# traceback at a time from its checkpoint and carries the walk state the
# other way.  Peak memory is O(B * SEG * W) regardless of sequence length
# (the forward sweep runs twice — compute for memory, as in remat).


@functools.partial(
    jax.jit,
    static_argnames=("mismatch", "o1", "e1", "o2", "e2", "band", "seg"),
)
def _nw_segment(
    Q, T, qlens, tlens, t0, H1, H2, I1r, D1r, I2r, D2r, scores,
    *, mismatch, o1, e1, o2, e2, band, seg,
):
    """Sweep anti-diagonals [t0+1, t0+seg]; returns updated state + tb rows."""
    B, Lq = Q.shape
    Lt = T.shape[1]
    K = band
    W = K + 1
    two = o2 >= 0
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    W_pad = K + 1
    Qp = jnp.pad(Q, ((0, 0), (1, W_pad)), constant_values=QPAD)
    Trev = jnp.pad(T[:, ::-1], ((0, 0), (W_pad, W_pad)), constant_values=TPAD)

    def shift_right(x):
        return jnp.concatenate([jnp.full((B, 1), INF, jnp.int32), x[:, :-1]], axis=1)

    def frame(x, delta):
        sr = shift_right(x)
        sl = jnp.concatenate([x[:, 1:], jnp.full((B, 1), INF, jnp.int32)], axis=1)
        return jnp.where(delta == -1, sr, jnp.where(delta == 0, x, sl))

    def body(carry, k):
        H1, H2, I1r, D1r, I2r, D2r, scores = carry
        t = t0 + 1 + k
        i0 = _i0_of(t, K)
        dp = i0 - _i0_of(t - 1, K)
        dpp = i0 - _i0_of(t - 2, K)
        i = i0 + lanes
        j = t - i
        h_up = frame(H1, dp - 1)
        h_left = frame(H1, dp)
        h_diag = frame(H2, dpp - 1)
        i1_up = frame(I1r, dp - 1)
        d1_left = frame(D1r, dp)
        qwin = jax.lax.dynamic_slice_in_dim(Qp, jnp.clip(i0, 0, Qp.shape[1] - W), W, axis=1)
        twin = jax.lax.dynamic_slice_in_dim(
            Trev, jnp.clip(Lt - t + i0 + W, 0, Trev.shape[1] - W), W, axis=1
        )
        sub = jnp.where(qwin == twin, 0, mismatch).astype(jnp.int32)
        I1n = jnp.minimum(h_up + (o1 + e1), i1_up + e1)
        i1_opened = (h_up + (o1 + e1)) <= (i1_up + e1)
        D1n = jnp.minimum(h_left + (o1 + e1), d1_left + e1)
        d1_opened = (h_left + (o1 + e1)) <= (d1_left + e1)
        if two:
            i2_up = frame(I2r, dp - 1)
            d2_left = frame(D2r, dp)
            I2n = jnp.minimum(h_up + (o2 + e2), i2_up + e2)
            i2_opened = (h_up + (o2 + e2)) <= (i2_up + e2)
            D2n = jnp.minimum(h_left + (o2 + e2), d2_left + e2)
            d2_opened = (h_left + (o2 + e2)) <= (d2_left + e2)
        else:
            I2n = jnp.full((B, W), INF, jnp.int32)
            D2n = jnp.full((B, W), INF, jnp.int32)
            i2_opened = jnp.zeros((B, W), bool)
            d2_opened = jnp.zeros((B, W), bool)
        Hn = h_diag + sub
        choice = jnp.full((B, W), H_DIAG, jnp.uint8)
        for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            choice = jnp.where(better, jnp.uint8(tag), choice)
        valid = (i >= 0) & (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])
        Hn = jnp.where(valid, jnp.minimum(Hn, INF), INF)
        I1n = jnp.where(valid, jnp.minimum(I1n, INF), INF)
        D1n = jnp.where(valid, jnp.minimum(D1n, INF), INF)
        I2n = jnp.where(valid, jnp.minimum(I2n, INF), INF)
        D2n = jnp.where(valid, jnp.minimum(D2n, INF), INF)
        fin_lane = qlens[:, None] - i0
        at_final = (t == (qlens + tlens))[:, None] & (lanes == fin_lane)
        fin_val = jnp.min(jnp.where(at_final, Hn, INF), axis=1)
        scores = jnp.where(
            (t == (qlens + tlens)) & (scores < 0) & (fin_val < INF), fin_val, scores
        )
        packed = (
            choice
            | (i1_opened.astype(jnp.uint8) << 3)
            | (i2_opened.astype(jnp.uint8) << 4)
            | (d1_opened.astype(jnp.uint8) << 5)
            | (d2_opened.astype(jnp.uint8) << 6)
        )
        return (Hn, H1, I1n, D1n, I2n, D2n, scores), packed

    carry, tb_seg = jax.lax.scan(
        body, (H1, H2, I1r, D1r, I2r, D2r, scores), jnp.arange(seg, dtype=jnp.int32)
    )
    # tb_seg: [seg, B, W] -> [B, seg, W]
    return carry, jnp.transpose(tb_seg, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("band", "seg"))
def _tb_scan_segment(tb_seg, t0, cur_t, l, mat, done, *, band, seg):
    """Reverse opcode scan over one segment's rows [t0+1, t0+seg]."""
    B = tb_seg.shape[0]
    K = band
    W = K + 1
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    def body(state, k):
        cur_t, l, mat, done = state
        td = t0 + seg - k  # seg-local reverse order
        row = jax.lax.dynamic_slice_in_dim(tb_seg, seg - 1 - k, 1, axis=1)[:, 0, :].astype(jnp.int32)
        active = (~done) & (cur_t == td)
        b = jnp.sum(jnp.where(lanes == l[:, None], row, 0), axis=1)
        i0_t = i0_of(td)
        i = i0_t + l
        j = td - i
        choice = b & 7
        is_h = mat == 0
        go_d1 = (is_h & (choice == H_D1)) | (mat == 1)
        go_i1 = (is_h & (choice == H_I1)) | (mat == 2)
        go_d2 = (is_h & (choice == H_D2)) | (mat == 3)
        go_i2 = (is_h & (choice == H_I2)) | (mat == 4)
        diag = is_h & (choice == H_DIAG)
        opened = jnp.where(
            go_d1, (b >> 5) & 1,
            jnp.where(go_i1, (b >> 3) & 1, jnp.where(go_d2, (b >> 6) & 1, (b >> 4) & 1)),
        ).astype(jnp.bool_)
        gap_d = go_d1 | go_d2
        gap_i = go_i1 | go_i2
        op = jnp.where(diag, OP_M, jnp.where(gap_i, OP_I, jnp.where(gap_d, OP_D, OP_NONE)))
        ni = jnp.where(diag | gap_i, i - 1, i)
        nj = jnp.where(diag | gap_d, j - 1, j)
        nmat = jnp.where(
            diag | opened, 0,
            jnp.where(go_d1, 1, jnp.where(go_i1, 2, jnp.where(go_d2, 3, 4))),
        )
        nt = ni + nj
        nl = ni - i0_of(nt)
        ndone = (ni == 0) & (nj == 0)
        cur_t = jnp.where(active, nt, cur_t)
        l = jnp.where(active, nl, l)
        mat = jnp.where(active, nmat, mat)
        done = done | (active & ndone)
        return (cur_t, l, mat, done), jnp.where(active, op, OP_NONE).astype(jnp.uint8)

    state, ops_rev = jax.lax.scan(
        body, (cur_t, l, mat, done), jnp.arange(seg, dtype=jnp.int32)
    )
    # ops_rev[k] is anti-diagonal t0+seg-k -> reorder ascending [B, seg]
    return state, ops_rev[::-1].T


def nw_align_long(
    Q, T, qlens, tlens, pen, band: int, seg: int = 2048
) -> tuple[np.ndarray, list[list[tuple[int, str]]]]:
    """Arbitrary-length banded alignment via fixed-size segments.

    Returns (scores [B], per-pair run-length items with 'M' placeholders).
    Peak device memory is O(B * seg * W) for real: the forward pass keeps
    only the six DP carry rows checkpointed at each segment boundary
    (O(n_seg * B * W), no traceback), and the reverse walk recomputes one
    segment's [B, seg, W] traceback at a time from its checkpoint before
    scanning it.  Cost: the forward sweep runs twice; memory no longer grows
    with sequence length.  Only [B, seg] opcodes transfer per segment.
    """
    B, Lq = Q.shape
    K = band
    W = K + 1
    qlens = np.asarray(qlens, dtype=np.int32)
    tlens = np.asarray(tlens, dtype=np.int32)
    tmax = int((qlens + tlens).max())
    n_seg = -(-tmax // seg)

    kw = dict(
        mismatch=pen.mismatch,
        o1=pen.gap1_open,
        e1=pen.gap1_extend,
        o2=pen.gap2_open if pen.two_piece else -1,
        e2=pen.gap2_extend if pen.two_piece else -1,
        band=band,
        seg=seg,
    )
    lanes0 = jnp.arange(W, dtype=jnp.int32)[None, :]
    H1 = jnp.broadcast_to(jnp.where(lanes0 == 0, 0, INF), (B, W)).astype(jnp.int32)
    H2 = jnp.full((B, W), INF, jnp.int32)
    I1r = jnp.full((B, W), INF, jnp.int32)
    D1r = jnp.full((B, W), INF, jnp.int32)
    I2r = jnp.full((B, W), INF, jnp.int32)
    D2r = jnp.full((B, W), INF, jnp.int32)
    scores = jnp.full((B,), -1, jnp.int32)

    # forward: checkpoint the small carry state at each segment start;
    # per-segment tracebacks are NOT retained (recomputed during reverse)
    checkpoints = []
    state = (H1, H2, I1r, D1r, I2r, D2r, scores)
    for s_i in range(n_seg):
        t0 = s_i * seg
        checkpoints.append(state)
        state, tb_seg = _nw_segment(Q, T, qlens, tlens, t0, *state, **kw)
        del tb_seg  # discard: the forward pass only needs the carry
    scores = np.asarray(state[6])

    # reverse walk across segments, recomputing one segment's traceback at a
    # time from its checkpoint (classic gradient-checkpointing shape)
    cur_t = jnp.asarray(qlens + tlens, dtype=jnp.int32)
    l = jnp.asarray(qlens, jnp.int32) - jnp.maximum(
        (cur_t - K + 1) // 2, 0
    )
    mat = jnp.zeros(B, jnp.int32)
    done = jnp.asarray(cur_t == 0)
    ops_parts = []
    for s_i in reversed(range(n_seg)):
        t0 = s_i * seg
        _, tb_seg = _nw_segment(Q, T, qlens, tlens, t0, *checkpoints[s_i], **kw)
        (cur_t, l, mat, done), ops_seg = _tb_scan_segment(
            tb_seg, t0, cur_t, l, mat, done, band=band, seg=seg
        )
        ops_parts.append(np.asarray(ops_seg))
    ops_parts.reverse()  # ascending t order
    opcodes = np.concatenate([np.zeros((B, 1), np.uint8)] + ops_parts, axis=1)
    items = [decode_opcodes(opcodes[b]) for b in range(B)]
    return scores, items


# max run-length tokens per pair in the compacted run list (emit="runs").
# M runs break only at indel ops (mismatches stay inside M), so accepted
# alignments have ~2*indel_events+1 runs — tens, not hundreds; pairs whose
# walk produces more retry through the opcode path (runner._runs_off_set).
RUN_MAX = 128
# run lengths are capped at 14 bits per token (longer runs split into
# multiple tokens; the host decoder re-merges adjacent same-op runs)
_RUN_LEN_MAX = (1 << 14) - 1


def _tb_scan_tbw(
    tb, qlens, tlens, *, band: int, t_total: int, unroll: int = 4, start=None,
    emit: str = "ops", run_max: int = RUN_MAX,
):
    """Reverse opcode scan over a [t, B, W]-layout traceback (row slice =
    one static-shape dynamic_slice on axis 0; no transpose materialized).

    emit="ops" (default) returns the per-step opcode tensor [B, t_total+1].
    emit="runs" instead run-length-encodes INSIDE the walk (the scan carries
    a (sym, len) accumulator; completed runs emit as 16-bit tokens
    op | len << 2) and compacts the sparse emissions with one top_k whose
    int32 key packs (position << 16 | token) — no per-pair gathers.  Returns
    (tokens [B, run_max] int32 in walk order = REVERSE alignment order, 0
    beyond each pair's count; counts [B] int32).  counts > run_max means the
    compaction dropped runs and the pair must re-run via opcodes.  Requires
    t_total < 2^15 (the position field); callers route longer programs to
    emit="ops".

    start (optional (cur_t0, l0, mat0) [B]-arrays): per-row walk start for
    the bidirectional fold — anti-diagonal, lane, and material
    (0 H, 1 D1, 2 I1, 3 D2, 4 I2).  Default walks every row from its final
    cell (qlen + tlen, final lane, H)."""
    B = tb.shape[1]
    W = band + 1
    K = band
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    # the per-step byte extraction is the walk's dominant [B, W] work
    # (measured 56% of the whole fused program, docs/PROFILE_TILED2.json):
    # keep it in the narrowest dtypes the VPU packs densest — int16 lane
    # indices (valid whenever every lane value fits 15 bits; |l| <= t_total)
    # and a uint8 masked-max in place of the int32 masked-sum (exactly one
    # lane can match, so max == sum and never overflows)
    lane_dt = jnp.int16 if WALK_U8 and t_total + 1 < (1 << 15) else jnp.int32
    lanes = jnp.arange(W, dtype=lane_dt)[None, :]

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    runs_mode = emit == "runs"
    if runs_mode and t_total + 1 >= (1 << 15):
        raise ValueError("emit='runs' needs t_total < 32767 (top_k key packing)")

    if start is None:
        cur_t0 = qlens + tlens
        l0 = qlens - i0_of(cur_t0)
        mat0 = jnp.zeros(B, jnp.int32)  # 0 H, 1 D1, 2 I1, 3 D2, 4 I2
    else:
        cur_t0, l0, mat0 = (a.astype(jnp.int32) for a in start)
    done0 = cur_t0 <= 0
    state0 = (cur_t0, l0, mat0, done0)
    if runs_mode:
        state0 = state0 + (jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))

    stream = STREAM_WALK

    def extract(row, l):
        """Byte at lane l per pair, as a masked [B, W] reduction (gathers
        are degenerate on TPU)."""
        mask = lanes == l.astype(lane_dt)[:, None]
        if WALK_U8:
            return jnp.max(jnp.where(mask, row, jnp.uint8(0)), axis=1).astype(
                jnp.int32
            )
        return jnp.sum(jnp.where(mask, row.astype(jnp.int32), 0), axis=1)

    def update(state, td, b):
        """One walk step given the extracted traceback byte b [B] int32 —
        shared by the per-row and blocked walks (identical semantics)."""
        cur_t, l, mat, done = state[:4]
        active = (~done) & (cur_t == td)

        i0_t = i0_of(td)
        i = i0_t + l
        j = td - i

        choice = b & 7
        is_h = mat == 0
        go_d1 = (is_h & (choice == H_D1)) | (mat == 1)
        go_i1 = (is_h & (choice == H_I1)) | (mat == 2)
        go_d2 = (is_h & (choice == H_D2)) | (mat == 3)
        go_i2 = (is_h & (choice == H_I2)) | (mat == 4)
        diag = is_h & (choice == H_DIAG)

        opened = jnp.where(
            go_d1, (b >> 5) & 1,
            jnp.where(go_i1, (b >> 3) & 1,
                      jnp.where(go_d2, (b >> 6) & 1, (b >> 4) & 1)),
        ).astype(jnp.bool_)

        gap_d = go_d1 | go_d2
        gap_i = go_i1 | go_i2

        op = jnp.where(diag, OP_M, jnp.where(gap_i, OP_I, jnp.where(gap_d, OP_D, OP_NONE)))
        ni = jnp.where(diag | gap_i, i - 1, i)
        nj = jnp.where(diag | gap_d, j - 1, j)
        nmat = jnp.where(
            diag | opened,
            0,
            jnp.where(go_d1, 1, jnp.where(go_i1, 2, jnp.where(go_d2, 3, 4))),
        )

        nt = ni + nj
        nl = ni - i0_of(nt)
        ndone = (ni == 0) & (nj == 0)

        cur_t = jnp.where(active, nt, cur_t)
        l = jnp.where(active, nl, l)
        mat = jnp.where(active, nmat, mat)
        done = done | (active & ndone)
        if not runs_mode:
            emitted = jnp.where(active, op, OP_NONE).astype(jnp.uint8)
            return (cur_t, l, mat, done), emitted
        # run accumulator: extend on same-op steps, close + restart on
        # op changes (and at the 14-bit length cap; the host re-merges)
        run_sym, run_len = state[4], state[5]
        opa = jnp.where(active, op, OP_NONE)
        has = opa != OP_NONE
        same = has & (opa == run_sym) & (run_len < _RUN_LEN_MAX)
        close = has & ~same
        out_tok = jnp.where(close, run_sym | (run_len << 2), 0)
        run_len = jnp.where(same, run_len + 1, jnp.where(has, 1, run_len))
        run_sym = jnp.where(close, opa, run_sym)
        return (cur_t, l, mat, done, run_sym, run_len), out_tok

    def body(state, xs):
        if stream:
            td, row = xs
        else:
            td = xs
            row = jax.lax.dynamic_slice_in_dim(tb, td, 1, axis=0)[0]
        return update(state, td, extract(row, state[1]))

    S = WALK_BLOCK
    blocked = bool(S) and stream and t_total >= S and t_total % S == 0
    if blocked:
        # blocked-stripe walk: S rows per scan step.  The walk's lane moves
        # at most one per anti-diagonal row, so over a block entered at
        # lane l0 it stays inside [l0-S, l0+S] — extract that (2S+1)-lane
        # stripe for all S rows with ONE batched int8 dot (exactly one lane
        # matches per (pair, column), and tb bytes are <= 127, so the int8
        # product is exact), then run the S micro-steps on [B, 2S+1] arrays.
        C = 2 * S + 1
        nblk = t_total // S
        blocks = tb[1 : t_total + 1].reshape(nblk, S, B, W)
        base = jnp.arange(nblk, dtype=jnp.int32) * S  # block k: td in [base+1, base+S]
        w_iota = jnp.arange(W, dtype=jnp.int32)
        c_iota = jnp.arange(C, dtype=jnp.int32)

        def blk_body(state, xs):
            b0, blk = xs  # [], [S, B, W]
            l0 = state[1]  # block-entry lanes [B]
            # U[b, w, c] = (w == l0[b] + c - S); out-of-band target lanes
            # match no w, so their stripe bytes are 0 (inactive anyway)
            U = (
                w_iota[None, :, None] - l0[:, None, None]
                == c_iota[None, None, :] - S
            ).astype(jnp.int8)
            stripe = jax.lax.dot_general(
                blk.astype(jnp.int8), U,
                dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [B, S, C]
            outs = [None] * S
            for s in range(S - 1, -1, -1):  # descending td inside the block
                rel = (state[1] - l0) + S  # current lane, stripe-relative
                m = c_iota[None, :] == rel[:, None]
                b = jnp.sum(jnp.where(m, stripe[:, s, :], 0), axis=1)
                state, outs[s] = update(state, b0 + s + 1, b)
            return state, jnp.stack(outs)  # [S, B] ascending td in block

        state, ys = jax.lax.scan(
            blk_body, state0, (base, blocks), reverse=True
        )
        ys = ys.reshape(t_total, B)  # ascending td, same contract as stream
    elif stream:
        # reverse scan consumes tb rows as inputs (no per-step slice); ys
        # comes back in ASCENDING td order (original xs index positions)
        tds = jnp.arange(1, t_total + 1, dtype=jnp.int32)
        state, ys = jax.lax.scan(
            body, state0, (tds, tb[1 : t_total + 1]), unroll=unroll,
            reverse=True,
        )
    else:
        tds = jnp.arange(t_total, 0, -1, dtype=jnp.int32)
        state, ys = jax.lax.scan(body, state0, tds, unroll=unroll)
        if not runs_mode:
            ys = ys[::-1]  # descending-walk ys -> ascending td order
    if not runs_mode:
        ops = jnp.concatenate(
            [jnp.zeros((1, B), jnp.uint8), ys], axis=0
        ).T
        return ops

    # flush the last open run (walk order: it is the alignment's FIRST run)
    run_sym, run_len = state[4], state[5]
    flush = jnp.where(run_len > 0, run_sym | (run_len << 2), 0)
    if stream:
        # ys.T columns are ascending td = REVERSED walk order: rank by idx
        # ascending (later column = earlier walk step) with flush (the last
        # walk emission) ranked below everything
        toks = jnp.concatenate([flush[:, None], ys.T], axis=1)  # [B, L1]
        L1 = toks.shape[1]
        idx = jnp.arange(L1, dtype=jnp.int32)[None, :]
        live = toks > 0
        key = jnp.where(live, ((idx + 1) << 16) | toks, 0)
    else:
        toks = jnp.concatenate([ys.T, flush[:, None]], axis=1)  # [B, L1]
        L1 = toks.shape[1]
        idx = jnp.arange(L1, dtype=jnp.int32)[None, :]
        live = toks > 0
        # key packs (descending position rank << 16 | token): one top_k
        # yields the first run_max tokens in walk order, payload included
        key = jnp.where(live, ((L1 - idx) << 16) | toks, 0)
    kk = min(run_max, L1)
    vals = jax.lax.top_k(key, kk)[0]
    tokens = vals & 0xFFFF
    if kk < run_max:
        tokens = jnp.pad(tokens, ((0, 0), (0, run_max - kk)))
    counts = jnp.sum(live, axis=1, dtype=jnp.int32)
    return tokens, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "mismatch", "o1", "e1", "o2", "e2", "band", "tmax", "use_int16",
        "unroll", "tb_unroll", "impl",
    ),
)
def nw_align_with_opcodes(
    Q, T, qlens, tlens, *, mismatch, o1, e1, o2, e2, band, tmax,
    use_int16=False, unroll=4, tb_unroll=4, impl="v3",
):
    """Fused sweep + device traceback: one dispatch, opcodes-only output.

    The packed traceback tensor lives only inside the program (HBM scratch
    between the forward sweep and the reverse opcode scan, in [t, B, W]
    layout throughout) — nothing but scores [B] and 2-bit-packed opcodes
    [B, ceil((T+1)/4)] is materialized for the host.  With use_int16 the DP runs in saturating
    int16 (scores >= INT16_CUTOFF are unreliable; callers re-run those
    pairs in int32).  impl selects the forward sweep: 'v3' (stacked-carry,
    default) or 'v1' (the behavioral specification, kept for parity tests
    and profiling).
    """
    sweep = _sweep_v3 if impl == "v3" else _sweep_tbw
    scores, tb, t_total = sweep(
        Q, T, qlens, tlens,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, tmax=tmax, with_traceback=True,
        dtype=jnp.int16 if use_int16 else jnp.int32,
        unroll=unroll,
    )
    ops = _tb_scan_tbw(tb, qlens, tlens, band=band, t_total=t_total, unroll=tb_unroll)
    return scores, pack_opcodes(ops)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mismatch", "o1", "e1", "o2", "e2", "band", "tmax", "use_int16",
        "unroll", "tb_unroll", "impl", "run_max",
    ),
)
def nw_align_with_runs(
    Q, T, qlens, tlens, *, mismatch, o1, e1, o2, e2, band, tmax,
    use_int16=False, unroll=4, tb_unroll=4, impl="v3", run_max=RUN_MAX,
):
    """Fused sweep + device traceback with run-length output: one dispatch,
    ~6x less device->host traffic than the packed-opcode path.

    Identical walk (and therefore identical CIGARs) to
    nw_align_with_opcodes — only the emission differs: the reverse walk
    run-length-encodes M/I/D steps in-scan and the result compacts to
    (tokens [B, run_max] int32 = op | len << 2, in walk order = reverse
    alignment order; counts [B] int32).  counts > run_max means the pair's
    run list was truncated — callers must re-run it through the opcode
    path.  Decode with decode_runs_batch.  Requires tmax < 32766 (the
    compaction's position field); the runner routes longer programs to
    opcodes."""
    sweep = _sweep_v3 if impl == "v3" else _sweep_tbw
    scores, tb, t_total = sweep(
        Q, T, qlens, tlens,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, tmax=tmax, with_traceback=True,
        dtype=jnp.int16 if use_int16 else jnp.int32,
        unroll=unroll,
    )
    tokens, counts = _tb_scan_tbw(
        tb, qlens, tlens, band=band, t_total=t_total, unroll=tb_unroll,
        emit="runs", run_max=run_max,
    )
    return scores, tokens, counts


def decode_runs_batch(
    tokens: np.ndarray,
    counts: np.ndarray,
    qs: list[np.ndarray],
    ts: list[np.ndarray],
) -> list[list[tuple[int, str]]]:
    """Decode run tokens (nw_align_with_runs) into per-pair run-length CIGAR
    item lists with 'M' split into '='/'X' — the decode_batch output
    contract, at run granularity instead of step granularity.

    Cursor positions are two [B, RUN_MAX] cumsums (walk order = from the
    alignment's end, so starts come from suffix arithmetic), the M-run base
    comparison is one flat gather over all M bases, and '='/'X' boundaries
    fall out of one RLE with forced breaks at M-run starts.  Rows with
    counts > RUN_MAX are truncated on device — callers must not pass them
    here (the runner retries them via the opcode path)."""
    tokens = np.asarray(tokens)
    counts = np.asarray(counts)
    B, R = tokens.shape
    if B == 0:
        return []
    syms = (tokens & 3).astype(np.int8)
    lens = (tokens >> 2).astype(np.int64)
    r_idx = np.arange(R, dtype=np.int64)[None, :]
    valid = (r_idx < np.minimum(counts, R)[:, None]) & (lens > 0)
    lens = np.where(valid, lens, 0)
    is_m = valid & (syms == OP_M)
    qc = np.where(valid & ((syms == OP_M) | (syms == OP_I)), lens, 0)
    tc = np.where(valid & ((syms == OP_M) | (syms == OP_D)), lens, 0)
    q_after = np.cumsum(qc, axis=1) - qc  # query bases consumed AFTER a run
    t_after = np.cumsum(tc, axis=1) - tc
    qlens = np.array([q.size for q in qs], dtype=np.int64)
    tlens = np.array([t.size for t in ts], dtype=np.int64)
    q0 = qlens[:, None] - q_after - qc  # run start (consuming runs only)
    t0 = tlens[:, None] - t_after - tc

    # one flat base comparison over every M base in the batch
    bm, rm = np.nonzero(is_m)  # row-major: walk order within each row
    n_mruns = bm.size
    seg_bound = np.zeros(1, dtype=np.int64)
    seg_lens = seg_eq = None
    gmap = np.full((B, R), -1, dtype=np.int64)
    if n_mruns:
        gmap[bm, rm] = np.arange(n_mruns)
        mlen = lens[bm, rm]
        ends = np.cumsum(mlen)
        starts_flat = ends - mlen
        total = int(ends[-1])
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts_flat, mlen)
        qi = np.repeat(q0[bm, rm], mlen) + offs
        ti = np.repeat(t0[bm, rm], mlen) + offs
        rowrep = np.repeat(bm, mlen)
        Lq = max(1, int(qlens.max()))
        Lt = max(1, int(tlens.max()))
        # distinct pads: an out-of-range M base decodes as 'X', never '='
        Qh = np.full((B, Lq), 254, np.uint8)
        Th = np.full((B, Lt), 255, np.uint8)
        for b, (q, t) in enumerate(zip(qs, ts)):
            Qh[b, : q.size] = q
            Th[b, : t.size] = t
        eq = Qh[rowrep, np.clip(qi, 0, Lq - 1)] == Th[rowrep, np.clip(ti, 0, Lt - 1)]
        change = np.empty(total, dtype=bool)
        change[0] = True
        change[1:] = eq[1:] != eq[:-1]
        change[starts_flat] = True  # segment breaks at every M-run start
        seg_starts = np.flatnonzero(change)
        seg_lens = np.diff(np.append(seg_starts, total))
        seg_eq = eq[seg_starts]
        seg_mrun = np.searchsorted(ends, seg_starts, side="right")
        seg_bound = np.searchsorted(seg_mrun, np.arange(n_mruns + 1))

    # final assembly: plain-python loop over pre-extracted lists (tolist()
    # beats repeated numpy scalar indexing ~5x — this loop is the sweepga
    # backend's and the anchored route's host hot spot at thousands of
    # tiny windows per batch)
    syms_l = syms.tolist()
    lens_l = lens.tolist()
    gmap_l = gmap.tolist()
    cnt_l = np.minimum(counts, R).tolist()
    seg_bound_l = seg_bound.tolist()
    seg_lens_l = seg_lens.tolist() if seg_lens is not None else []
    seg_eq_l = seg_eq.tolist() if seg_eq is not None else []
    out: list[list[tuple[int, str]]] = []
    for b in range(B):
        items: list[tuple[int, str]] = []
        append = items.append
        sb = syms_l[b]
        lb = lens_l[b]
        gb = gmap_l[b]
        last_n = 0
        last_op = ""
        for r in range(cnt_l[b] - 1, -1, -1):  # reverse walk = fwd order
            n = lb[r]
            if n <= 0:
                continue
            s = sb[r]
            if s == OP_M:
                g = gb[r]
                for si in range(seg_bound_l[g], seg_bound_l[g + 1]):
                    op = "=" if seg_eq_l[si] else "X"
                    nn = seg_lens_l[si]
                    if op == last_op:
                        last_n += nn
                    else:
                        if last_n:
                            append((last_n, last_op))
                        last_n, last_op = nn, op
            else:
                op = "I" if s == OP_I else "D"
                if op == last_op:
                    last_n += n
                else:
                    if last_n:
                        append((last_n, last_op))
                    last_n, last_op = n, op
        if last_n:
            append((last_n, last_op))
        out.append(items)
    return out


# -----------------------------------------------------------------------------
# Bidirectional fold: meet-in-the-middle halves the serial step count
# -----------------------------------------------------------------------------
# The anti-diagonal sweep and the reverse walk are serial scans of
# qlen + tlen steps each, and the measured per-step cost on TPU is dominated
# by fixed per-fused-region sequencing overhead (docs/ROUND2_NOTES.md) — so
# halving the trip count halves the latency-bound wall clock.  The fold runs
# each pair as TWO batch rows of the SAME sweep: (q, t) forward and
# (reverse(q), reverse(t)) backward, each to the pair's middle
# anti-diagonal (tm = ceil(fin/2) forward, tmb = fin - tm backward, where a
# backward cell (i', j') is the forward cell (qlen - i', tlen - j') and
# backward anti-diagonal t' = fin - t).  Batch doubles — free in the
# flat-in-B regime — and trip count halves.
#
# The halves join by enumerating every edge that crosses the seam between
# forward region {t <= tm} and backward region {t >= tm + 1} (Myers-Miller
# adapted to an anti-diagonal seam, two-piece affine):
#
#   gap edge (I/D) from u at tm:    the backward sweep's gap LAYER at u
#     already prices the crossing edge + state-aware suffix, so
#       total_G(u) = min(Hf(u), Gf(u) - o_G) + Gb_layer(u)
#     (the -o_G branch credits the run-open paid on both sides of a
#     seam-spanning run);
#   M edge from u at tm-1 -> tm+1:  priced by the backward M-arrival
#     candidate (h_diag + sub) captured at t' = tmb + 1:
#       total_M2(u) = Hf(u @ tm-1) + HbM(u);
#   M edge from u at tm -> tm+2:    same candidate captured at t' = tmb:
#       total_M3(u) = Hf(u @ tm) + HbM(u).
#
# Every path crosses the seam via exactly one such edge and every term is a
# realizable path cost, so the min over lanes x terms is the exact banded
# optimum.  Lane alignment between the halves (a per-pair reversal + shift)
# is a masked broadcast-reduce over iota equality — the documented TPU
# workaround for per-pair gathers — costing O(B*W^2) VPU ops once per
# dispatch, not per step.
#
# Banding: each half bands |i - j| <= K in ITS OWN coordinates, so the
# backward band in forward coordinates is centered on i - j = qlen - tlen.
# Callers must widen the kernel band to K + |qlen - tlen| so the fold
# region covers the full certified-K band (|i-j| <= K implies
# |i - j - diff| <= K + |diff|); the runner's band-escalation certificate
# then applies unchanged at K.
#
# Traceback: both half-walks run as one parameterized reverse scan over the
# same [t, 2B, W] traceback (forward rows walk from the crossing cell in
# the chosen layer; backward rows from the crossing cell / the M-landing
# cell).  The host merges fwd-ops ++ [M if the crossing edge is an M] ++
# reverse(bwd-ops) (merge_fold_ops) and decodes as usual.  Co-optimal
# CIGARs may differ from the single sweep in tie cases, which the pipeline
# permits (same policy as the row-major kernel).

# fold term order = tie priority: M (E2, E3), then D1, I1, D2, I2 —
# mirroring the single-sweep walk's DIAG > D1 > I1 > D2 > I2 preference.
_FOLD_E2, _FOLD_E3, _FOLD_D1, _FOLD_I1, _FOLD_D2, _FOLD_I2 = range(6)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mismatch", "o1", "e1", "o2", "e2", "band", "tmax_half", "use_int16",
        "unroll", "tb_unroll",
    ),
)
def nw_align_fold(
    Qf, Tf, Qr, Tr, qlens, tlens, *, mismatch, o1, e1, o2, e2, band,
    tmax_half, use_int16=False, unroll=4, tb_unroll=4,
):
    """Bidirectional-fold banded Gotoh: half the serial steps of
    nw_align_with_opcodes (see the block comment above).

    Qf/Tf [B, L]: base codes padded with QPAD/TPAD; Qr/Tr: the same rows
    with their first qlen/tlen entries REVERSED (not complemented), same
    padding.  tmax_half: static trip count >= max(qlen + tlen) // 2 + 1.
    band: half-width; must already include the +|qlen - tlen| fold widening.
    Sequences must be non-empty (all-zero dummy rows are fine and report
    score 0 with empty opcodes).

    Returns (scores [B] int32, packed opcodes [2B, ceil((T+1)/4)] — rows b
    and B+b are the pair's forward and backward half-walks — and
    cross_m [B] bool: whether an M crossing op must be inserted between the
    halves; merge with merge_fold_ops)."""
    B = Qf.shape[0]
    K = band
    W = K + 1
    two = o2 >= 0
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    fin = qlens + tlens
    tm = (fin + 1) // 2
    tmb = fin - tm

    Q2 = jnp.concatenate([Qf, Qr])
    T2 = jnp.concatenate([Tf, Tr])
    qlens2 = jnp.concatenate([qlens, qlens])
    tlens2 = jnp.concatenate([tlens, tlens])
    t_snap = jnp.concatenate([tm, tmb])

    _, tb, (SNAP, DIAGA, DIAGB), t_total = _sweep_v3(
        Q2, T2, qlens2, tlens2,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, tmax=tmax_half, with_traceback=True,
        dtype=jnp.int16 if use_int16 else jnp.int32,
        unroll=unroll, t_snap=t_snap,
    )

    # --- combine (int32 throughout: int16 halves can sum past 2^15) -------
    Sf = SNAP[:, :B].astype(jnp.int32)      # fwd: H(tm), H(tm-1), I1, D1, I2, D2
    Gb = SNAP[2:, B:].astype(jnp.int32)     # bwd gap layers at tmb: I1, D1, I2, D2
    DA = DIAGA[B:].astype(jnp.int32)        # bwd M-arrival candidate at tmb
    DB = DIAGB[B:].astype(jnp.int32)        # ... at tmb + 1

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    i0_tm = i0_of(tm)
    i0_tm1 = i0_of(tm - 1)
    i0_b = i0_of(tmb)
    i0_b1 = i0_of(tmb + 1)
    # bwd lane for the fwd cell at lane lf: lb = sh - lf
    sh1 = qlens - i0_tm - i0_b      # arrays at t' = tmb, onto the tm frame
    sh2 = qlens - i0_tm1 - i0_b1    # DIAGB at t' = tmb+1, onto the tm-1 frame

    lf = jnp.arange(W, dtype=jnp.int32)
    lw = jnp.arange(W, dtype=jnp.int32)

    def align_bwd(Y, sh):
        """Y [C, B, W] in a backward lane frame -> [C, B, W] on the forward
        frame: out[c, b, l] = Y[c, b, sh[b] - l], INF where out of range."""
        cond = (lf[None, :, None] + lw[None, None, :]) == sh[:, None, None]
        out = jnp.sum(jnp.where(cond[None], Y[:, :, None, :], 0), axis=-1)
        lb = sh[:, None] - lf[None, :]
        in_range = (lb >= 0) & (lb < W)
        return jnp.where(in_range[None], out, INF)

    A1 = align_bwd(jnp.concatenate([Gb, DA[None]]), sh1)  # I1b,D1b,I2b,D2b,DA
    A2 = align_bwd(DB[None], sh2)[0]

    BIG = jnp.int32(2 * INF)
    terms = [
        Sf[1] + A2,                                   # E2: M from tm-1
        Sf[0] + A1[4],                                # E3: M from tm
        jnp.minimum(Sf[0], Sf[3] - o1) + A1[1],       # D1 crossing
        jnp.minimum(Sf[0], Sf[2] - o1) + A1[0],       # I1 crossing
        (jnp.minimum(Sf[0], Sf[5] - o2) + A1[3]) if two else jnp.full((B, W), BIG),
        (jnp.minimum(Sf[0], Sf[4] - o2) + A1[2]) if two else jnp.full((B, W), BIG),
    ]
    tv = jnp.stack(terms)                              # [6, B, W]
    lane_best = jnp.argmin(tv, axis=2).astype(jnp.int32)   # [6, B]
    val_best = jnp.min(tv, axis=2)                     # [6, B]
    term = jnp.argmin(val_best, axis=0).astype(jnp.int32)  # [B]
    total = jnp.min(val_best, axis=0)                  # [B]

    lane = jnp.sum(
        jnp.where(jnp.arange(6)[:, None] == term[None, :], lane_best, 0), axis=0
    )                                                  # [B] lane of chosen term
    finished = total < INF
    scores = jnp.where(fin == 0, 0, jnp.where(finished, total, -1))

    # --- walk starts -------------------------------------------------------
    def at_lane(X):
        return jnp.sum(jnp.where(lf[None, :] == lane[:, None], X, 0), axis=1)

    h_u = at_lane(Sf[0])
    gap_vals = jnp.stack([at_lane(Sf[3]) - o1, at_lane(Sf[2]) - o1,
                          at_lane(Sf[5]) - o2, at_lane(Sf[4]) - o2])  # D1,I1,D2,I2
    # walk material codes: 0 H, 1 D1, 2 I1, 3 D2, 4 I2
    gap_code = jnp.array([1, 2, 3, 4], jnp.int32)
    is_e1 = term >= 2
    g_idx = jnp.clip(term - 2, 0, 3)
    g_val = jnp.sum(
        jnp.where(jnp.arange(4)[:, None] == g_idx[None, :], gap_vals, 0), axis=0
    )
    g_code = gap_code[g_idx]
    fwd_mat = jnp.where(is_e1 & (g_val < h_u), g_code, 0)
    fwd_t0 = jnp.where(term == _FOLD_E2, tm - 1, tm)
    fwd_l0 = lane

    i_u = jnp.where(term == _FOLD_E2, i0_tm1, i0_tm) + lane
    ip_u = qlens - i_u
    bwd_t0 = jnp.where(
        is_e1, tmb, jnp.where(term == _FOLD_E2, tmb - 1, tmb - 2)
    )
    bwd_l0 = jnp.where(
        is_e1, ip_u - i0_b, (ip_u - 1) - i0_of(jnp.maximum(bwd_t0, 0))
    )
    bwd_mat = jnp.where(is_e1, g_code, 0)
    cross_m = (~is_e1) & finished & (fin > 0)

    # inert starts for unfinished / dummy rows (ops discarded by callers)
    live = finished & (fin > 0)
    fwd_t0 = jnp.where(live, fwd_t0, 0)
    bwd_t0 = jnp.where(live, jnp.maximum(bwd_t0, 0), 0)
    fwd_l0 = jnp.clip(fwd_l0, 0, W - 1)
    bwd_l0 = jnp.clip(bwd_l0, 0, W - 1)

    cur_t0 = jnp.concatenate([fwd_t0, bwd_t0])
    l0 = jnp.concatenate([fwd_l0, bwd_l0])
    mat0 = jnp.concatenate([fwd_mat, bwd_mat])
    ops = _tb_scan_tbw(
        tb, qlens2, tlens2, band=band, t_total=t_total, unroll=tb_unroll,
        start=(cur_t0, l0, mat0),
    )
    return scores, pack_opcodes(ops), cross_m


def merge_fold_ops(ops2: np.ndarray, cross_m: np.ndarray) -> np.ndarray:
    """Host merge of fold half-walk opcode rows: [2B, L] -> [B, 2L + 1].

    Row b's merged stream is fwd-ops ++ [OP_M if cross_m[b]] ++
    reverse(bwd-ops).  Positions carry no meaning downstream (decode_batch
    drops OP_NONE), only order does."""
    ops2 = np.asarray(ops2)
    B2, L = ops2.shape
    B = B2 // 2
    out = np.zeros((B, 2 * L + 1), np.uint8)
    out[:, :L] = ops2[:B]
    out[:, L] = np.where(np.asarray(cross_m), OP_M, OP_NONE).astype(np.uint8)
    out[:, L + 1 :] = ops2[B:, ::-1]
    return out


# -----------------------------------------------------------------------------
# Row-major sweep (v4): half the serial steps of the anti-diagonal kernels
# -----------------------------------------------------------------------------
# The anti-diagonal sweeps take qlen+tlen serial steps (forward) plus
# qlen+tlen walk steps, and the measured per-step cost on TPU is dominated by
# fixed XLA op-sequencing overhead — flat in both B and W
# (docs/PROFILE_TPU_V3.json).  Sweeping by QUERY ROWS instead halves both
# trip counts (qlen steps), at the price of a 2x wider window (row i covers
# j in [i-K, i+K], Wr = 2K+1 lanes — same |i-j| <= K diagonal coverage as
# the anti-diagonal kernels, so the runner's score-based exactness
# certificate carries over unchanged).
#
# Within-row D dependencies (a serial chain in j) are solved in closed form:
# with non-negative gap opens, re-opening a gap inside a contiguous run never
# beats extending it, so
#     D1[i,j] = o1 + min_{k<j} (Htilde[i,k] + (j-k)*e1)
# where Htilde = H without the D terms (diag/I only).  That min is one
# exclusive cummin over lanes of A[k] = Htilde[k] - k*e1.  H values are
# exact (any path through a cross-component reopen is dominated, see the
# D2->D1 analysis in docs/ROUND2_NOTES.md); co-optimal CIGARs may differ
# from the anti-diagonal kernels in tie cases, which the pipeline permits
# (the reference's own CIGARs are WFA2-backtrace-order dependent; we only
# require determinism *within* a kernel, which a fixed tie order gives).
#
# Traceback byte layout (differs from the anti-diagonal kernels):
#   bits 0-1: Htilde choice (0 = diag, 1 = I1, 2 = I2)
#   bits 2-3: H override   (0 = none, 1 = D1, 2 = D2)
#   bit 4: I1 opened   bit 5: I2 opened   bit 6: D1 opened   bit 7: D2 opened
#
# The row-major walk consumes exactly one row per iteration: vertical ops
# (M / I) advance one row, and an entire horizontal D-run resolves in one
# masked reduce over the open-bit lanes of the current row.  Its output is a
# dense 2-bit step stream (one M/I per row) plus a compacted sparse gap list
# (row, run-length) — a ~6x smaller device->host transfer than per-op
# opcode streams.

GAP_MAX = 160  # max D-runs per pair in the compacted gap list; pairs with
# more (divergence far beyond any accepted alignment) retry on the
# anti-diagonal kernel via the runner's queue.


def _sweep_rows(
    Q, T, qlens, tlens, *,
    mismatch, o1, e1, o2, e2, band, with_traceback, dtype=jnp.int32,
    unroll=2,
):
    """Row-major banded Gotoh forward sweep.

    Returns (scores [B] int32, tb [R+1, B, Wr] uint8 or None, R) with
    R = Q.shape[1] (static row trip count) and Wr = 2*band + 1.
    """
    B, Lq = Q.shape
    Lt = T.shape[1]
    K = band
    Wr = 2 * K + 1
    two = o2 >= 0
    NEG = _dtype_inf(dtype)
    i16 = dtype == jnp.int16

    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)

    # Tp[i + l] = T[j - 1] for j = i - K + l  (leading K+1 pads)
    Tp = jnp.pad(T, ((0, 0), (K + 1, K + Lq + 2)), constant_values=TPAD)
    # Qp[i] = Q[i - 1]
    Qp = jnp.pad(Q, ((0, 0), (1, 1)), constant_values=QPAD)

    lanes = jnp.arange(Wr, dtype=jnp.int32)[None, :]  # [1, Wr]
    ramp1 = (lanes * e1).astype(jnp.int32)
    ramp2 = (lanes * e2).astype(jnp.int32) if two else None
    BIG = jnp.int32(2**30)

    inf_col = jnp.full((B, 1), NEG, dtype)
    inf_col32 = jnp.full((B, 1), BIG, jnp.int32)
    inf_col3 = jnp.full((3, B, 1), NEG, dtype)

    def shift_right32(x):
        return jnp.concatenate([inf_col32, x[:, :-1]], axis=1)

    def d_pass(Htilde, ramp, o, gmax_w=None):
        """Closed-form within-row gap: returns (D [B,Wr] dtype, opened)."""
        A = Htilde.astype(jnp.int32) - ramp
        P = shift_right32(jax.lax.cummin(A, axis=1))  # exclusive cummin
        D32 = P + (ramp + o)
        opened = shift_right32(A) <= shift_right32(P)
        D = jnp.minimum(D32, jnp.int32(NEG)).astype(dtype)
        return D, opened

    def compute_row(S, sub, r):
        """S = [H, I1, I2] of the previous row; returns (Sn, FINrow, byte)."""
        Sl = jnp.concatenate([S[:, :, 1:], inf_col3], axis=2)  # shift-left
        H_up, I1_up, I2_up = Sl[0], Sl[1], Sl[2]
        H_diag = S[0]

        I1n = jnp.minimum(H_up + (o1 + e1), I1_up + e1)
        i1o = (H_up + (o1 + e1)) <= (I1_up + e1)
        if two:
            I2n = jnp.minimum(H_up + (o2 + e2), I2_up + e2)
            i2o = (H_up + (o2 + e2)) <= (I2_up + e2)
        else:
            I2n = jnp.full((B, Wr), NEG, dtype)
            i2o = jnp.zeros((B, Wr), bool)

        Ht = H_diag + sub
        if i16:
            Ht = jnp.minimum(Ht, NEG)
            I1n = jnp.minimum(I1n, NEG)
            I2n = jnp.minimum(I2n, NEG)
        httag = jnp.zeros((B, Wr), jnp.uint8)
        for cand, tag in ((I1n, 1), (I2n, 2)):
            better = cand < Ht
            Ht = jnp.where(better, cand, Ht)
            httag = jnp.where(better, jnp.uint8(tag), httag)

        D1n, d1o = d_pass(Ht, ramp1, o1)
        if two:
            D2n, d2o = d_pass(Ht, ramp2, o2)
        else:
            D2n = jnp.full((B, Wr), NEG, dtype)
            d2o = jnp.zeros((B, Wr), bool)

        Hn = Ht
        dtag = jnp.zeros((B, Wr), jnp.uint8)
        for cand, tag in ((D1n, 1), (D2n, 2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            dtag = jnp.where(better, jnp.uint8(tag), dtag)

        byte = (
            httag
            | (dtag << 2)
            | (i1o.astype(jnp.uint8) << 4)
            | (i2o.astype(jnp.uint8) << 5)
            | (d1o.astype(jnp.uint8) << 6)
            | (d2o.astype(jnp.uint8) << 7)
        )
        return jnp.stack([Hn, I1n, I2n]), Hn, byte

    # ---- row 0: H[0, j] = closed-form gap column --------------------------
    Ht0 = jnp.full((B, Wr), NEG, dtype).at[:, K].set(0)
    D10, d1o0 = d_pass(Ht0, ramp1, o1)
    if two:
        D20, d2o0 = d_pass(Ht0, ramp2, o2)
    else:
        D20 = jnp.full((B, Wr), NEG, dtype)
        d2o0 = jnp.zeros((B, Wr), bool)
    H0 = Ht0
    dtag0 = jnp.zeros((B, Wr), jnp.uint8)
    for cand, tag in ((D10, 1), (D20, 2)):
        better = cand < H0
        H0 = jnp.where(better, cand, H0)
        dtag0 = jnp.where(better, jnp.uint8(tag), dtag0)
    byte0 = (
        (dtag0 << 2)
        | (d1o0.astype(jnp.uint8) << 6)
        | (d2o0.astype(jnp.uint8) << 7)
    )
    S = jnp.stack([H0, jnp.full((B, Wr), NEG, dtype), jnp.full((B, Wr), NEG, dtype)])
    FIN = jnp.where((qlens == 0)[:, None], H0, jnp.full((B, Wr), NEG, dtype))

    def body(carry, r):
        S, FIN = carry
        twin = jax.lax.dynamic_slice_in_dim(Tp, r, Wr, axis=1)
        qchar = jax.lax.dynamic_slice_in_dim(Qp, r, 1, axis=1)
        sub = jnp.where(qchar == twin, 0, mismatch).astype(dtype)
        Sn, Hn, byte = compute_row(S, sub, r)
        FIN = jnp.where((r == qlens)[:, None], Hn, FIN)
        return (Sn, FIN), byte if with_traceback else jnp.zeros((B, 0), jnp.uint8)

    rs = jnp.arange(1, Lq + 1, dtype=jnp.int32)
    (S, FIN), tb_rows = jax.lax.scan(body, (S, FIN), rs, unroll=unroll)

    fin_lane = tlens - qlens + K
    fin_val = jnp.min(
        jnp.where(lanes == fin_lane[:, None], FIN.astype(jnp.int32), INF), axis=1
    )
    ok = (fin_lane >= 0) & (fin_lane < Wr) & (fin_val < INF)
    scores = jnp.where(ok, fin_val, -1)

    if not with_traceback:
        return scores, None, Lq
    tb = jnp.concatenate([byte0[None], tb_rows], axis=0)  # [Lq+1, B, Wr]
    return scores, tb, Lq


def _tb_rows_scan(tb, qlens, tlens, *, band: int, unroll: int = 2):
    """Row-major device walk.

    Returns (steps [B, R+1] uint8 with OP_M/OP_I per row (OP_NONE pre-start),
    grows [B, GAP_MAX] int32 gap rows ascending (-1 pad), gvals [B, GAP_MAX]
    int32 run lengths, gcount [B] int32 total D-runs).  A gap's 'D' ops sort
    AFTER the same row's step op in forward order; a row-0 gap precedes
    everything (leading deletion).
    """
    R = tb.shape[0] - 1
    B = tb.shape[1]
    Wr = tb.shape[2]
    K = band
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    lanes = jnp.arange(Wr, dtype=jnp.int32)[None, :]

    cur_i0 = qlens
    cur_l0 = jnp.clip(tlens - qlens + K, 0, Wr - 1)
    st0 = jnp.zeros(B, jnp.int32)  # 0 = H, 1 = I1, 2 = I2
    done0 = (qlens == 0) & (tlens == 0)

    def pick(row, l):
        return jnp.sum(jnp.where(lanes == l[:, None], row, 0), axis=1)

    def body(state, r):
        cur_i, cur_l, st, done = state
        active = (~done) & (cur_i == r)
        row = jax.lax.dynamic_slice_in_dim(tb, r, 1, axis=0)[0].astype(jnp.int32)

        b1 = pick(row, cur_l)
        in_h = st == 0
        dtag = jnp.where(in_h, (b1 >> 2) & 3, 0)
        has_run = dtag > 0

        # resolve the whole D-run: nearest opened cell at or left of cur_l
        openbit = (row >> (5 + dtag)[:, None]) & 1
        mask = (openbit > 0) & (lanes <= cur_l[:, None]) & has_run[:, None]
        l0 = jnp.max(jnp.where(mask, lanes, -1), axis=1)
        glen = jnp.where(has_run & (l0 >= 0), cur_l - l0 + 1, 0)

        # the step op of this row comes from the run predecessor's byte
        step_lane = jnp.where(has_run, l0 - 1, cur_l)
        b2 = pick(row, step_lane)

        ht = jnp.where(in_h, b2 & 3, st)  # 0 = diag, 1/2 = I component
        is_i = ht > 0
        iopen = (jnp.where(in_h, b2, b1) >> (3 + ht)) & 1

        at0 = r == 0
        terminal = active & at0  # row-0: only the leading gap remains
        op = jnp.where(is_i, OP_I, OP_M).astype(jnp.uint8)
        step_emit = jnp.where(active & ~terminal, op, OP_NONE).astype(jnp.uint8)
        gap_emit = jnp.where(active, glen, 0)

        ni = cur_i - 1
        nl = step_lane + is_i.astype(jnp.int32)
        nst = jnp.where(is_i & (iopen == 0), ht, 0)
        ndone = terminal | ((ni == 0) & (nl == K))

        cur_i = jnp.where(active, ni, cur_i)
        cur_l = jnp.where(active, nl, cur_l)
        st = jnp.where(active, nst, st)
        done = done | (active & ndone)
        return (cur_i, cur_l, st, done), (step_emit, gap_emit)

    rds = jnp.arange(R, -1, -1, dtype=jnp.int32)
    _, (steps_rev, gaps_rev) = jax.lax.scan(
        body, (cur_i0, cur_l0, st0, done0), rds, unroll=unroll
    )
    steps = steps_rev[::-1].T  # [B, R+1], column r = row r
    gaps = gaps_rev[::-1].T

    # compact the sparse gap list: rows ascending
    rows_idx = jnp.arange(R + 1, dtype=jnp.int32)[None, :]
    mask = gaps > 0
    key = jnp.where(mask, (R + 1) - rows_idx, 0)
    _, gpos = jax.lax.top_k(key, min(GAP_MAX, R + 1))
    gvals = jnp.take_along_axis(gaps, gpos, axis=1)
    valid = jnp.take_along_axis(mask, gpos, axis=1)
    grows = jnp.where(valid, gpos, -1)
    gvals = jnp.where(valid, gvals, 0)
    gcount = jnp.sum(mask, axis=1, dtype=jnp.int32)
    return steps, grows, gvals, gcount


@functools.partial(
    jax.jit,
    static_argnames=("mismatch", "o1", "e1", "o2", "e2", "band", "use_int16",
                     "unroll", "tb_unroll"),
)
def nw_align_rows(
    Q, T, qlens, tlens, *, mismatch, o1, e1, o2, e2, band,
    use_int16=False, unroll=2, tb_unroll=2,
):
    """Fused row-major sweep + walk: one dispatch.

    Returns (scores [B] int32, steps_packed [B, ceil((R+1)/4)] uint8 (2-bit
    codes, see pack_opcodes), grows [B, GAP_MAX] int16, gvals [B, GAP_MAX]
    int16, gcount [B] int32).  gcount > GAP_MAX means the gap list
    overflowed and the pair must be re-aligned on the anti-diagonal kernel.
    """
    scores, tb, R = _sweep_rows(
        Q, T, qlens, tlens,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, with_traceback=True,
        dtype=jnp.int16 if use_int16 else jnp.int32,
        unroll=unroll,
    )
    steps, grows, gvals, gcount = _tb_rows_scan(
        tb, qlens, tlens, band=band, unroll=tb_unroll
    )
    return (
        scores,
        pack_opcodes(steps),
        grows.astype(jnp.int16),
        gvals.astype(jnp.int16),
        gcount,
    )


def decode_rowtokens(
    steps_row: np.ndarray, grows: np.ndarray, gvals: np.ndarray,
    gcount: int, qlen: int,
) -> list[tuple[int, str]]:
    """Host expansion of the row-major walk's output into run-length items
    with 'M' placeholders (resolve with resolve_matches, like
    decode_opcodes).  steps_row[r] (r in 1..qlen) is the M/I op of row r;
    gap g at row r inserts g 'D's after row r's step (before everything for
    r = 0)."""
    items: list[tuple[int, str]] = []
    steps = np.asarray(steps_row)
    syms = np.array([0, ord("M"), ord("I"), 0], dtype=np.uint8)

    def emit_steps(lo, hi):
        if hi < lo:
            return
        seg = syms[steps[lo : hi + 1]]
        if seg.size == 0:
            return
        change = np.empty(seg.size, dtype=bool)
        change[0] = True
        change[1:] = seg[1:] != seg[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], seg.size)
        for s, e in zip(starts, ends):
            if seg[s]:
                items.append((int(e - s), chr(seg[s])))

    pos = 1
    for k in range(int(gcount)):
        r = int(grows[k])
        g = int(gvals[k])
        if r < 0:
            break
        if r >= pos:
            emit_steps(pos, min(r, qlen))
            pos = r + 1
        if items and items[-1][1] == "D":
            items[-1] = (items[-1][0] + g, "D")
        else:
            items.append((g, "D"))
    emit_steps(pos, qlen)
    return items


# -----------------------------------------------------------------------------
# Band tiling: mixed-band chunks as ONE serial program
# -----------------------------------------------------------------------------
# The measured per-step cost of the sweep/walk scans is dominated by fixed
# per-fused-region sequencing overhead — flat in both B and W at production
# shapes (docs/ROUND3_NOTES.md §1).  A workload with two band buckets (e.g.
# 576 pairs at K=511 plus 64 inversion-carrying pairs at K=1535, the shape of
# every HLA-like all-pairs sweep) therefore pays TWO full serial programs of
# ~equal wall clock even though the wide bucket is 8% of the pairs.  Merging
# everyone into one chunk at the wide band triples the narrow rows' traceback
# memory and OOMs (ROUND3_NOTES §1, r3e).
#
# Band tiling instead keeps the lane width at the NARROW bucket's W and gives
# each wide pair R = (K_wide+1)/W consecutive batch rows ("tiles"), each
# covering one W-lane slice of its wide band.  Every DP dependency is a lane
# shift of +-1, so tiles couple through exactly one boundary lane per
# anti-diagonal: the shifted-stack helpers inject the neighbouring row's edge
# column (a roll along the batch axis) instead of +inf.  One program, same
# trip count as the narrow chunk alone, traceback bytes = rows x tmax x W.
#
# Band anchor schedules: a narrow row uses i0_n(t) = max((t-K_n+1)//2, 0),
# a wide row i0_w(t) (same formula at K_w).  With W even, K_n and K_w are
# both odd, so the two schedules advance with the SAME parity; the sweep
# splits into three statically scheduled phases:
#   P1  t in [1, K_n]:        both classes i0 = 0          (shift pattern of
#                             the untiled phase A, no per-row selects)
#   P2  t in (K_n, K_w]:      narrow alternates dp=1,0; wide still i0 = 0
#                             (per-dependency class selects, ~(K_w-K_n)
#                             of the tmax rows)
#   P3  t > K_w:              both alternate dp=1,0 in lockstep (untiled
#                             phase-B shift pattern)
# Per-row lane offsets are absorbed by PRE-SHIFTING each tile row's
# sequences (query left by o, target right by o, o = tile*W) so the
# substitution-window schedule stays uniform per class.
#
# The reverse walk runs in lockstep on all tiles of a pair (identical
# state); each row reads its own W lanes and the owner tile's byte reaches
# its siblings through masked batch rolls.  Scores/tokens are read from the
# pair's first row.  Scores, traceback bytes, and therefore CIGARs are
# BIT-IDENTICAL to running each pair untiled at its own band (the DP values,
# tie order X,D1,I1,D2,I2, and walk are unchanged — only the memory layout
# of the wide band differs).  Reference behavior unchanged:
# /root/reference/src/wfa.rs:41-75 (exact end-to-end alignment contract).


def _sweep_tiled(
    Q, T, qlens, tlens, o_off, is_wide, has_left, has_right, *,
    mismatch, o1, e1, o2, e2, band, band_wide, tmax, dtype=jnp.int32,
    unroll=4,
):
    """Forward banded sweep over a mixed-band batch (see section comment).

    Q [B, Lq] / T [B, Lt2]: PER-ROW PRE-SHIFTED base codes (query left by
    o_off, target right by o_off — nw_align_with_runs_tiled does this).
    o_off [B]: lane offset of the row's tile (0 for narrow rows).
    is_wide [B]: row belongs to a band_wide pair (all its tiles).
    has_left / has_right [B]: a sibling tile row sits at b-1 / b+1.
    band: K_n, the narrow class band; W = band+1 is the lane width.
    band_wide: K_w, the wide class band; (K_w+1) % W == 0, W even.
    Returns (scores [B] int32 — final-cell value where this row's tile owns
    the final lane, else -1; tb [T_total+1, B, W] uint8; T_total).
    """
    B, Lq = Q.shape  # Q column 0 = base BEFORE the row's first lane (see wrapper)
    Lt2 = T.shape[1]
    K = band
    Kw = band_wide
    W = K + 1
    if W % 2 or (Kw + 1) % W or Kw <= K:
        raise ValueError("band tiling needs W even and band_wide+1 = R*W, R>1")
    two = o2 >= 0
    NEG = _dtype_inf(dtype)
    clamp = dtype == jnp.int16

    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    o_off = o_off.astype(jnp.int32)
    wide_col = is_wide[:, None]
    wide_b1 = is_wide[None, :, None]

    # phase extents (K, Kw odd; P2/P3 lengths even when they run full)
    TA1 = min(K, tmax)
    M2 = max(0, -(-(min(Kw, tmax) - TA1) // 2))
    M3 = max(0, -(-(tmax - (TA1 + 2 * M2)) // 2))
    T_total = TA1 + 2 * M2 + 2 * M3

    # ---- streamed substitution windows -----------------------------------
    # incoming-column schedules per class (see _sweep_v3's streaming note);
    # indices derived from the window start s_q(t) = i0(t),
    # s_t(t) = Lt2 - t + i0(t) + W on the (1, W+eq)/(W+et, W)-padded arrays.
    eq = max(0, M2 + M3 - Lq)
    Qps = jnp.pad(Q, ((0, 0), (0, W + eq)), constant_values=QPAD)
    raw_lows = [
        Lt2 + W - T_total,                   # P1 floor (t up to TA1 <= T_total)
        Lt2 + W - TA1 - 2 * M2,              # P2 wide pair-stream floor
        Lt2 + W - TA1 - M2 - M3,             # P2+P3 narrow stream floor
        Lt2 + W - Kw - M3 if M3 else Lt2,    # P3 wide stream floor
    ]
    et = max(0, -min(raw_lows))
    TrevS = jnp.pad(T[:, ::-1], ((0, 0), (W + et, W)), constant_values=TPAD)
    qwin0 = Qps[:, :W]
    twin0 = TrevS[:, et + Lt2 + W : et + Lt2 + 2 * W]
    # P1: both classes shift the target window by 1/row; incoming column at
    # row t is TrevS[., et + Lt2 + W - t], t = 1..TA1
    tcols_p1 = TrevS[:, et + Lt2 + W - TA1 : et + Lt2 + W][:, ::-1].T
    # P2 narrow: qcol at macro m is Qps[., W + m]; tcol (row2 insert) at
    # et + Lt2 + W - TA1 - 1 - m
    qcols_p2 = Qps[:, W : W + M2].T
    tcols_p2n = TrevS[:, et + Lt2 + W - TA1 - M2 : et + Lt2 + W - TA1][:, ::-1].T
    # P2 wide: two tcols per macro (rows t1, t2), descending from
    # et + Lt2 + W - TA1 - 1
    tw = TrevS[:, et + Lt2 + W - TA1 - 2 * M2 : et + Lt2 + W - TA1][:, ::-1].T
    tcols_p2w = tw.reshape(M2, 2, B) if M2 else tw.reshape(0, 2, B)
    # P3: one qcol + one tcol per macro, per class; select by is_wide
    if M3 > 0:
        qcols_p3 = jnp.where(
            wide_col.T, Qps[:, W : W + M3].T, Qps[:, W + M2 : W + M2 + M3].T
        )
        tcols_p3 = jnp.where(
            wide_col.T,
            TrevS[:, et + Lt2 + W - Kw - M3 : et + Lt2 + W - Kw][:, ::-1].T,
            TrevS[
                :, et + Lt2 + W - TA1 - M2 - M3 : et + Lt2 + W - TA1 - M2
            ][:, ::-1].T,
        )

    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    fin_t = qlens + tlens

    H0 = jnp.full((B, W), NEG, dtype)
    H0 = H0.at[:, 0].set(jnp.where(o_off == 0, jnp.zeros((), dtype), NEG))
    S = jnp.stack([H0] + [jnp.full((B, W), NEG, dtype)] * 5)
    FIN = jnp.where(
        ((fin_t == 0) & (o_off == 0))[:, None], H0, jnp.full((B, W), NEG, dtype)
    )

    inf_col6 = jnp.full((6, B, 1), NEG, dtype)

    def sr6(S):  # no halo: P1 only (tile-boundary cells still invalid there)
        return jnp.concatenate([inf_col6, S[:, :, :-1]], axis=2)

    if TILED_HALO:

        def sr6h(S):
            left = jnp.roll(S[:, :, -1], 1, axis=1)
            left = jnp.where(has_left[None, :], left, NEG)
            return jnp.concatenate([left[:, :, None], S[:, :, :-1]], axis=2)

        def sl6h(S):
            right = jnp.roll(S[:, :, 0], -1, axis=1)
            right = jnp.where(has_right[None, :], right, NEG)
            return jnp.concatenate([S[:, :, 1:], right[:, :, None]], axis=2)

    else:  # measurement-only: wrong wide-pair results (see TILED_HALO)
        sr6h = sr6

        def sl6h(S):
            return jnp.concatenate([S[:, :, 1:], inf_col6], axis=2)

    def i0_n(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    def i0_w(t):
        return jnp.maximum((t - Kw + 1) // 2, 0)

    def i0_row(t):
        return jnp.where(is_wide, i0_w(t), i0_n(t))

    def compute_row(t, deps, sub):
        h_up, h_left, h_diag, i1_up, d1_left, i2_up, d2_left = deps
        I1n = jnp.minimum(h_up + (o1 + e1), i1_up + e1)
        i1_opened = (h_up + (o1 + e1)) <= (i1_up + e1)
        D1n = jnp.minimum(h_left + (o1 + e1), d1_left + e1)
        d1_opened = (h_left + (o1 + e1)) <= (d1_left + e1)
        if two:
            I2n = jnp.minimum(h_up + (o2 + e2), i2_up + e2)
            i2_opened = (h_up + (o2 + e2)) <= (i2_up + e2)
            D2n = jnp.minimum(h_left + (o2 + e2), d2_left + e2)
            d2_opened = (h_left + (o2 + e2)) <= (d2_left + e2)
        else:
            I2n = jnp.full((B, W), NEG, dtype)
            D2n = jnp.full((B, W), NEG, dtype)
            i2_opened = jnp.zeros((B, W), bool)
            d2_opened = jnp.zeros((B, W), bool)

        Hn = h_diag + sub
        choice = jnp.full((B, W), H_DIAG, jnp.uint8)
        for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            choice = jnp.where(better, jnp.uint8(tag), choice)

        if clamp:
            i = (i0_row(t) + o_off)[:, None] + lanes
            j = t - i
            valid = (i <= qlens[:, None]) & (j >= 0) & (j <= tlens[:, None])
            Hn = jnp.where(valid, jnp.minimum(Hn, NEG), NEG)
            I1n = jnp.where(valid, jnp.minimum(I1n, NEG), NEG)
            D1n = jnp.where(valid, jnp.minimum(D1n, NEG), NEG)
            I2n = jnp.where(valid, jnp.minimum(I2n, NEG), NEG)
            D2n = jnp.where(valid, jnp.minimum(D2n, NEG), NEG)

        packed = (
            choice
            | (i1_opened.astype(jnp.uint8) << 3)
            | (i2_opened.astype(jnp.uint8) << 4)
            | (d1_opened.astype(jnp.uint8) << 5)
            | (d2_opened.astype(jnp.uint8) << 6)
        )
        return Hn, I1n, D1n, I2n, D2n, packed

    # ---- P1: t in [1, TA1], i0 = 0 for both classes -----------------------
    def body_p1(carry, xs):
        S, FIN, Twin = carry
        t, tcol = xs
        Twin = jnp.concatenate([tcol[:, None], Twin[:, :-1]], axis=1)
        R = sr6(S)
        deps = (R[0], S[0], R[1], R[2], S[3], R[4], S[5])
        sub = jnp.where(qwin0 == Twin, 0, mismatch).astype(dtype)
        Hn, I1n, D1n, I2n, D2n, packed = compute_row(t, deps, sub)
        FIN = jnp.where((t == fin_t)[:, None], Hn, FIN)
        Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        return (Sn, FIN, Twin), packed

    carry = (S, FIN, twin0)
    if TA1 > 0:
        ts_1 = jnp.arange(1, TA1 + 1, dtype=jnp.int32)
        carry, tb_1 = jax.lax.scan(body_p1, carry, (ts_1, tcols_p1), unroll=unroll)

    # ---- P2: t in (TA1, TA1 + 2*M2]; narrow alternates, wide holds --------
    def body_p2(carry, xs):
        S, FIN, qwin, Twin = carry
        m, qcol, tcol_n, tcol_w = xs
        t1 = TA1 + 1 + 2 * m
        # narrow query window advances at macro start; wide holds
        qwin = jnp.where(
            wide_col, qwin, jnp.concatenate([qwin[:, 1:], qcol[:, None]], axis=1)
        )
        # row 1: wide target window shifts (start -1); narrow holds
        Twin = jnp.where(
            wide_col,
            jnp.concatenate([tcol_w[0][:, None], Twin[:, :-1]], axis=1),
            Twin,
        )
        R = sr6h(S)
        L = sl6h(S)
        # narrow (dp=1, dpp=1): (S0, L0, S1, S2, L3, S4, L5)
        # wide   (dp=0, dpp=0): (R0, S0, R1, R2, S3, R4, S5)
        deps = (
            jnp.where(wide_b1[0], R[0], S[0]),
            jnp.where(wide_b1[0], S[0], L[0]),
            jnp.where(wide_b1[0], R[1], S[1]),
            jnp.where(wide_b1[0], R[2], S[2]),
            jnp.where(wide_b1[0], S[3], L[3]),
            jnp.where(wide_b1[0], R[4], S[4]),
            jnp.where(wide_b1[0], S[5], L[5]),
        )
        sub = jnp.where(qwin == Twin, 0, mismatch).astype(dtype)
        Hn, I1n, D1n, I2n, D2n, p1 = compute_row(t1, deps, sub)
        FIN = jnp.where((t1 == fin_t)[:, None], Hn, FIN)
        S = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        # row 2: both classes shift the target window (start -1)
        t2 = t1 + 1
        tcol2 = jnp.where(is_wide, tcol_w[1], tcol_n)
        Twin = jnp.concatenate([tcol2[:, None], Twin[:, :-1]], axis=1)
        R = sr6h(S)
        # narrow (dp=0, dpp=1): (R0, S0, S1, R2, S3, R4, S5)
        # wide   (dp=0, dpp=0): (R0, S0, R1, R2, S3, R4, S5)
        deps = (
            R[0], S[0],
            jnp.where(wide_b1[0], R[1], S[1]),
            R[2], S[3], R[4], S[5],
        )
        sub = jnp.where(qwin == Twin, 0, mismatch).astype(dtype)
        Hn, I1n, D1n, I2n, D2n, p2 = compute_row(t2, deps, sub)
        FIN = jnp.where((t2 == fin_t)[:, None], Hn, FIN)
        Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        return (Sn, FIN, qwin, Twin), jnp.stack([p1, p2])

    if M2 > 0:
        S_c, FIN_c, Twin_c = carry
        carry = (S_c, FIN_c, qwin0, Twin_c)
        ms2 = jnp.arange(M2, dtype=jnp.int32)
        carry, tb_2 = jax.lax.scan(
            body_p2, carry, (ms2, qcols_p2, tcols_p2n, tcols_p2w),
            unroll=max(unroll // 2, 1),
        )
    else:
        S_c, FIN_c, Twin_c = carry
        carry = (S_c, FIN_c, qwin0, Twin_c)

    # ---- P3: t > TA1 + 2*M2; both classes alternate in lockstep -----------
    T2 = TA1 + 2 * M2

    def body_p3(carry, xs):
        S, FIN, qwin, Twin = carry
        m, qcol, tcol = xs
        t1 = T2 + 1 + 2 * m
        qwin = jnp.concatenate([qwin[:, 1:], qcol[:, None]], axis=1)
        # row 1 (dp=1, dpp=1): (S0, L0, S1, S2, L3, S4, L5); window start holds
        L = sl6h(S)
        deps = (S[0], L[0], S[1], S[2], L[3], S[4], L[5])
        sub = jnp.where(qwin == Twin, 0, mismatch).astype(dtype)
        Hn, I1n, D1n, I2n, D2n, p1 = compute_row(t1, deps, sub)
        FIN = jnp.where((t1 == fin_t)[:, None], Hn, FIN)
        S = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        # row 2 (dp=0, dpp=1): (R0, S0, S1, R2, S3, R4, S5); window start -1
        t2 = t1 + 1
        Twin = jnp.concatenate([tcol[:, None], Twin[:, :-1]], axis=1)
        R = sr6h(S)
        deps = (R[0], S[0], S[1], R[2], S[3], R[4], S[5])
        sub = jnp.where(qwin == Twin, 0, mismatch).astype(dtype)
        Hn, I1n, D1n, I2n, D2n, p2 = compute_row(t2, deps, sub)
        FIN = jnp.where((t2 == fin_t)[:, None], Hn, FIN)
        Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
        return (Sn, FIN, qwin, Twin), jnp.stack([p1, p2])

    if M3 > 0:
        ms3 = jnp.arange(M3, dtype=jnp.int32)
        carry, tb_3 = jax.lax.scan(
            body_p3, carry, (ms3, qcols_p3, tcols_p3),
            unroll=max(unroll // 2, 1),
        )
    FIN = carry[1]

    # per-row final-lane extraction (the owning tile yields the score)
    i0_fin = i0_row(fin_t)
    fin_lane = qlens - i0_fin - o_off
    fin_val = jnp.min(
        jnp.where(lanes == fin_lane[:, None], FIN.astype(jnp.int32), INF), axis=1
    )
    finished = (fin_t <= T_total) & (fin_val < INF)
    scores = jnp.where(finished, fin_val, -1)

    parts = [jnp.zeros((1, B, W), jnp.uint8)]
    if TA1 > 0:
        parts.append(tb_1)
    if M2 > 0:
        parts.append(tb_2.reshape(2 * M2, B, W))
    if M3 > 0:
        parts.append(tb_3.reshape(2 * M3, B, W))
    tb = jnp.concatenate(parts, axis=0)  # [T_total + 1, B, W]
    return scores, tb, T_total


def _tb_scan_tiled(
    tb, qlens, tlens, K_row, o_off, sib_fwd, *, t_total: int,
    unroll: int = 4, run_max: int = RUN_MAX,
):
    """Reverse run-emission walk over a band-tiled traceback (lockstep).

    Every tile row of a pair carries an identical copy of the pair's walk
    state (global lane in [0, band_wide+1), material, cursor); each row
    one-hot-reads its own W lanes at (lane - o_off) and the owner tile's
    byte reaches its siblings through masked batch rolls, so all copies
    transition identically — the same walk as _tb_scan_tbw at the pair's
    own band.  Emissions are identical on every tile row; callers read the
    pair's FIRST row.

    K_row [B]: per-row band (narrow rows: base band; all tiles of a wide
    pair: band_wide).  o_off [B]: lane offset of the row's tile.
    sib_fwd [R-1, B] bool: sib_fwd[k-1][b] <=> row b+k is a tile of row
    b's pair.  Returns (tokens [B, run_max], counts [B]) per the
    _tb_scan_tbw emit='runs' contract.
    """
    B = tb.shape[1]
    W = tb.shape[2]
    n_sib = sib_fwd.shape[0]
    qlens = qlens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    K_row = K_row.astype(jnp.int32)
    o_off = o_off.astype(jnp.int32)
    # narrow-dtype byte extraction, as in _tb_scan_tbw (t_total < 2^15 is
    # guaranteed below, so int16 lane indices are always valid here)
    lanes = jnp.arange(W, dtype=jnp.int16)[None, :]
    if t_total + 1 >= (1 << 15):
        raise ValueError("run emission needs t_total < 32767")
    # backward sibling masks: row b-k is a tile of row b's pair
    sib_bwd = jnp.stack(
        [jnp.roll(sib_fwd[k], k + 1, axis=0) for k in range(n_sib)]
    )

    def i0_of(t):
        return jnp.maximum((t - K_row + 1) // 2, 0)

    cur_t0 = qlens + tlens
    l0 = qlens - i0_of(cur_t0)
    mat0 = jnp.zeros(B, jnp.int32)
    done0 = cur_t0 <= 0
    state0 = (cur_t0, l0, mat0, done0, jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))

    def body(state, xs):
        td, row = xs
        cur_t, l, mat, done = state[:4]
        active = (~done) & (cur_t == td)
        mask = lanes == (l - o_off).astype(jnp.int16)[:, None]
        own = jnp.max(jnp.where(mask, row, jnp.uint8(0)), axis=1).astype(jnp.int32)
        b = own
        if TILED_SIB:
            for k in range(n_sib):
                b = b + jnp.where(sib_fwd[k], jnp.roll(own, -(k + 1)), 0)
                b = b + jnp.where(sib_bwd[k], jnp.roll(own, k + 1), 0)

        i = i0_of(td) + l
        j = td - i

        choice = b & 7
        is_h = mat == 0
        go_d1 = (is_h & (choice == H_D1)) | (mat == 1)
        go_i1 = (is_h & (choice == H_I1)) | (mat == 2)
        go_d2 = (is_h & (choice == H_D2)) | (mat == 3)
        go_i2 = (is_h & (choice == H_I2)) | (mat == 4)
        diag = is_h & (choice == H_DIAG)

        opened = jnp.where(
            go_d1, (b >> 5) & 1,
            jnp.where(go_i1, (b >> 3) & 1,
                      jnp.where(go_d2, (b >> 6) & 1, (b >> 4) & 1)),
        ).astype(jnp.bool_)

        gap_d = go_d1 | go_d2
        gap_i = go_i1 | go_i2

        op = jnp.where(diag, OP_M, jnp.where(gap_i, OP_I, jnp.where(gap_d, OP_D, OP_NONE)))
        ni = jnp.where(diag | gap_i, i - 1, i)
        nj = jnp.where(diag | gap_d, j - 1, j)
        nmat = jnp.where(
            diag | opened,
            0,
            jnp.where(go_d1, 1, jnp.where(go_i1, 2, jnp.where(go_d2, 3, 4))),
        )

        nt = ni + nj
        nl = ni - i0_of(nt)
        ndone = (ni == 0) & (nj == 0)

        cur_t = jnp.where(active, nt, cur_t)
        l = jnp.where(active, nl, l)
        mat = jnp.where(active, nmat, mat)
        done = done | (active & ndone)
        run_sym, run_len = state[4], state[5]
        opa = jnp.where(active, op, OP_NONE)
        has = opa != OP_NONE
        same = has & (opa == run_sym) & (run_len < _RUN_LEN_MAX)
        close = has & ~same
        out_tok = jnp.where(close, run_sym | (run_len << 2), 0)
        run_len = jnp.where(same, run_len + 1, jnp.where(has, 1, run_len))
        run_sym = jnp.where(close, opa, run_sym)
        return (cur_t, l, mat, done, run_sym, run_len), out_tok

    tds = jnp.arange(1, t_total + 1, dtype=jnp.int32)
    state, ys = jax.lax.scan(
        body, state0, (tds, tb[1 : t_total + 1]), unroll=unroll, reverse=True
    )

    run_sym, run_len = state[4], state[5]
    flush = jnp.where(run_len > 0, run_sym | (run_len << 2), 0)
    toks = jnp.concatenate([flush[:, None], ys.T], axis=1)  # [B, L1]
    L1 = toks.shape[1]
    idx = jnp.arange(L1, dtype=jnp.int32)[None, :]
    live = toks > 0
    key = jnp.where(live, ((idx + 1) << 16) | toks, 0)
    kk = min(run_max, L1)
    vals = jax.lax.top_k(key, kk)[0]
    tokens = vals & 0xFFFF
    if kk < run_max:
        tokens = jnp.pad(tokens, ((0, 0), (0, run_max - kk)))
    counts = jnp.sum(live, axis=1, dtype=jnp.int32)
    return tokens, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "mismatch", "o1", "e1", "o2", "e2", "band", "band_wide", "tmax",
        "n_tiles", "use_int16", "unroll", "tb_unroll", "run_max",
    ),
)
def nw_align_with_runs_tiled(
    Q, T, qlens, tlens, o_off, is_wide, has_left, has_right, sib_fwd,
    *, mismatch, o1, e1, o2, e2, band, band_wide, tmax, n_tiles,
    use_int16=False, unroll=4, tb_unroll=4, run_max=RUN_MAX,
):
    """Fused band-tiled sweep + lockstep device walk with run emission.

    Row layout (built by the runner): narrow rows are standalone pairs at
    `band`; a wide pair occupies n_tiles consecutive rows at `band_wide`
    (= n_tiles*(band+1) - 1), lane offsets o_off = tile*(band+1).  Q/T are
    UNSHIFTED per-row base codes; the per-tile pre-shift happens here
    (per-class static rolls, once per dispatch).  Returns (scores [B],
    tokens [B, run_max], counts [B]) where each wide pair's score/token
    rows are its FIRST tile row (sibling rows of scores are combined in).

    Bit-identical to nw_align_with_runs at each pair's own band — the
    parity suite (tests/test_tiled.py) pins scores, tokens, and decoded
    CIGARs.
    """
    W = band + 1
    dtype = jnp.int16 if use_int16 else jnp.int32
    o_max = (n_tiles - 1) * W

    # per-tile-class pre-shift: query left by o, target right by o.  The
    # query is left-padded by one column FIRST so each tile row's column 0
    # carries the base preceding its first lane (its lane-0 substitution
    # reads it; for offset-0 rows it is the boundary pad as in the untiled
    # kernel).  The roll's wrapped tails are only read at cells outside the
    # row's valid (i, j) region, whose values stay >= NEG by monotonicity.
    Qp1 = jnp.pad(Q, ((0, 0), (1, 0)), constant_values=QPAD)
    Qs = Qp1
    Tp = jnp.pad(T, ((0, 0), (0, o_max)), constant_values=TPAD)
    Ts = Tp
    for r in range(1, n_tiles):
        off = r * W
        m = (o_off == off)[:, None]
        Qs = jnp.where(m, jnp.roll(Qp1, -off, axis=1), Qs)
        Ts = jnp.where(m, jnp.roll(Tp, off, axis=1), Ts)

    scores, tb, t_total = _sweep_tiled(
        Qs, Ts, qlens, tlens, o_off, is_wide, has_left, has_right,
        mismatch=mismatch, o1=o1, e1=e1, o2=o2, e2=e2,
        band=band, band_wide=band_wide, tmax=tmax, dtype=dtype, unroll=unroll,
    )
    # fold sibling tiles' scores onto the pair's first row
    sc = scores
    for k in range(n_tiles - 1):
        sc = jnp.maximum(sc, jnp.where(sib_fwd[k], jnp.roll(scores, -(k + 1)), -1))
    K_row = jnp.where(is_wide, band_wide, band).astype(jnp.int32)
    tokens, counts = _tb_scan_tiled(
        tb, qlens, tlens, K_row, o_off, sib_fwd,
        t_total=t_total, unroll=tb_unroll, run_max=run_max,
    )
    return sc, tokens, counts
