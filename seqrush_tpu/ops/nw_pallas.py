"""Pallas TPU kernel for the banded anti-diagonal Gotoh sweep.

Same DP and traceback encoding as ops/nw.py, hand-placed for the TPU memory
hierarchy (see docs/ARCHITECTURE.md):

* one grid program processes G=8 pairs, mapped onto the VPU's 8 sublanes:
  every DP row is an [8, W] tile (W = band lanes, multiple of 128), so each
  elementwise min/add uses the full 8x128 vector unit;
* all six DP state rows live in VMEM scratch for the whole sweep — zero HBM
  traffic in the recurrence;
* packed traceback bytes accumulate in a VMEM staging buffer of TB_CHUNK
  anti-diagonal rows and are copied to the HBM output once per chunk
  (pallas pipelines the output copy with compute);
* the substitution window is a dynamic slice of the pair's query row and
  reversed-target row (both VMEM-resident).

Falls back transparently: ops/nw.py's XLA kernel is the specification; the
runner selects this kernel when it imports and lowers successfully.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw import H_D1, H_D2, H_DIAG, H_I1, H_I2, OP_D, OP_I, OP_M, OP_NONE, QPAD, TPAD

INF = 2**28  # plain int: jnp scalars would be captured consts in the kernel
GROUP = 8  # pairs per program == VPU sublanes
TB_CHUNK = 128  # traceback rows staged in VMEM between HBM flushes


def _kernel(
    q_ref,  # [G, Lq] int32 (VMEM)
    trev_ref,  # [G, Lt + 2W] int32, reversed target padded both sides (VMEM)
    qlens_ref,  # [G, 1] int32 (VMEM)
    tlens_ref,  # [G, 1] int32 (VMEM)
    scores_ref,  # [G, 1] int32 out (VMEM)
    tb_ref,  # [G, TMAX_PAD, W] uint8 out (ANY/HBM)
    h1,
    h2,
    i1r,
    d1r,
    i2r,
    d2r,
    tb_stage,  # [G, TB_CHUNK, W] uint8 scratch (VMEM)
    score_acc,  # [G, 1] int32 scratch (VMEM)
    dma_sem,
    *,
    mismatch,
    o1,
    e1,
    o2,
    e2,
    band,
    tmax,
    Lq,
    Lt,
):
    K = band
    W = K + 1
    two = o2 >= 0
    lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)

    qlens = qlens_ref[:]  # [G, 1]
    tlens = tlens_ref[:]

    h1[:] = jnp.where(lanes == 0, 0, INF)
    h2[:] = jnp.full((GROUP, W), INF, jnp.int32)
    i1r[:] = jnp.full((GROUP, W), INF, jnp.int32)
    d1r[:] = jnp.full((GROUP, W), INF, jnp.int32)
    i2r[:] = jnp.full((GROUP, W), INF, jnp.int32)
    d2r[:] = jnp.full((GROUP, W), INF, jnp.int32)
    score_acc[:] = jnp.full((GROUP, 1), -1, jnp.int32)

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    def shift_hi(x):  # lane l reads l-1
        return jnp.concatenate([jnp.full((GROUP, 1), INF, jnp.int32), x[:, :-1]], axis=1)

    def shift_lo(x):  # lane l reads l+1
        return jnp.concatenate([x[:, 1:], jnp.full((GROUP, 1), INF, jnp.int32)], axis=1)

    def frame(x, delta):
        return jnp.where(delta == -1, shift_hi(x), jnp.where(delta == 0, x, shift_lo(x)))

    g = pl.program_id(0)

    def flush(chunk_idx):
        """Copy the staged traceback rows out to HBM (full-array ref in
        ANY memory space; the group offset is applied manually)."""
        copy = pltpu.make_async_copy(
            tb_stage,
            tb_ref.at[pl.ds(g * GROUP, GROUP), pl.ds(chunk_idx * TB_CHUNK, TB_CHUNK), :],
            dma_sem,
        )
        copy.start()
        copy.wait()

    def body(t, _):
        i0 = i0_of(t)
        dp = i0 - i0_of(t - 1)
        dpp = i0 - i0_of(t - 2)

        i = i0 + lanes
        j = t - i

        h_up = frame(h1[:], dp - 1)
        h_left = frame(h1[:], dp)
        h_diag = frame(h2[:], dpp - 1)
        i1_up = frame(i1r[:], dp - 1)
        d1_left = frame(d1r[:], dp)

        qwin = q_ref[:, pl.ds(jnp.clip(i0, 0, Lq + W), W)]
        tstart = jnp.clip(Lt - t + i0 + W, 0, Lt + W)
        twin = trev_ref[:, pl.ds(tstart, W)]
        sub = jnp.where(qwin == twin, 0, mismatch)

        I1n = jnp.minimum(h_up + (o1 + e1), i1_up + e1)
        i1_opened = (h_up + (o1 + e1)) <= (i1_up + e1)
        D1n = jnp.minimum(h_left + (o1 + e1), d1_left + e1)
        d1_opened = (h_left + (o1 + e1)) <= (d1_left + e1)
        if two:
            i2_up = frame(i2r[:], dp - 1)
            d2_left = frame(d2r[:], dp)
            I2n = jnp.minimum(h_up + (o2 + e2), i2_up + e2)
            i2_opened = (h_up + (o2 + e2)) <= (i2_up + e2)
            D2n = jnp.minimum(h_left + (o2 + e2), d2_left + e2)
            d2_opened = (h_left + (o2 + e2)) <= (d2_left + e2)
        else:
            I2n = jnp.full((GROUP, W), INF, jnp.int32)
            D2n = jnp.full((GROUP, W), INF, jnp.int32)
            i2_opened = jnp.zeros((GROUP, W), jnp.bool_)
            d2_opened = jnp.zeros((GROUP, W), jnp.bool_)

        Hn = h_diag + sub
        choice = jnp.zeros((GROUP, W), jnp.uint8)
        for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
            better = cand < Hn
            Hn = jnp.where(better, cand, Hn)
            choice = jnp.where(better, jnp.uint8(tag), choice)

        valid = (i >= 0) & (i <= qlens) & (j >= 0) & (j <= tlens)
        Hn = jnp.where(valid, jnp.minimum(Hn, INF), INF)
        I1n = jnp.where(valid, jnp.minimum(I1n, INF), INF)
        D1n = jnp.where(valid, jnp.minimum(D1n, INF), INF)
        I2n = jnp.where(valid, jnp.minimum(I2n, INF), INF)
        D2n = jnp.where(valid, jnp.minimum(D2n, INF), INF)

        # final score capture
        at_final = ((t == (qlens + tlens)) & (lanes == (qlens - i0)))
        fin_val = jnp.min(jnp.where(at_final, Hn, INF), axis=1, keepdims=True)
        score_acc[:] = jnp.where(
            (t == (qlens + tlens)) & (score_acc[:] < 0) & (fin_val < INF),
            fin_val,
            score_acc[:],
        )

        packed = (
            choice
            | (i1_opened.astype(jnp.uint8) << 3)
            | (i2_opened.astype(jnp.uint8) << 4)
            | (d1_opened.astype(jnp.uint8) << 5)
            | (d2_opened.astype(jnp.uint8) << 6)
        )
        tb_stage[:, t % TB_CHUNK, :] = packed

        @pl.when((t % TB_CHUNK) == (TB_CHUNK - 1))
        def _():
            flush(t // TB_CHUNK)

        h2[:] = h1[:]
        h1[:] = Hn
        i1r[:] = I1n
        d1r[:] = D1n
        if two:
            i2r[:] = I2n
            d2r[:] = D2n
        return 0

    jax.lax.fori_loop(1, tmax + 1, body, 0)
    # flush the final partial chunk
    n_chunks = (tmax + 1 + TB_CHUNK - 1) // TB_CHUNK
    flush(n_chunks - 1)
    scores_ref[:] = score_acc[:]


def _walk_kernel(
    tb_ref,  # [B, TMAX_PAD, W] uint8 (ANY/HBM; group offset applied in-kernel)
    qlens_ref,  # [G, 1] int32 (VMEM)
    tlens_ref,  # [G, 1] int32 (VMEM)
    ops_ref,  # [B, OPS_PAD] uint8 out (ANY/HBM)
    cur_t,  # [G, 1] int32 scratch
    lane,  # [G, 1] int32 scratch
    mat,  # [G, 1] int32 scratch (0 H, 1 D1, 2 I1, 3 D2, 4 I2)
    done,  # [G, 1] int32 scratch (bool)
    row_block,  # [G, TB_CHUNK, W] uint8 scratch
    out_stage,  # [G, TB_CHUNK] uint8 scratch
    in_sem,
    out_sem,
    *,
    band,
    tmax,
    ops_pad,
):
    """Reverse opcode walk over the packed traceback, whole kernel = one
    program per 8 pairs: the XLA formulation pays the scan's per-step
    sequencing floor (~11.7 us at mega-chunk shapes — the wall's dominant
    term, ROUND3_NOTES §1); here each step is a few VPU ops against a
    VMEM-staged row block.  Semantics are exactly
    nw.traceback_scan_device: one visit per anti-diagonal, gap-state
    switches consume the same byte as the gap op, opcodes land at column
    td (0 none, 1 M, 2 I, 3 D)."""
    K = band
    W = K + 1
    g = pl.program_id(0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (GROUP, W), 1)

    qlens = qlens_ref[:]
    tlens = tlens_ref[:]

    def i0_of(t):
        return jnp.maximum((t - K + 1) // 2, 0)

    t0 = qlens + tlens
    cur_t[:] = t0
    lane[:] = qlens - i0_of(t0)
    mat[:] = jnp.zeros((GROUP, 1), jnp.int32)
    done[:] = (t0 == 0).astype(jnp.int32)

    n_blocks = ops_pad // TB_CHUNK

    def block_body(bi, _):
        blk = n_blocks - 1 - bi  # high anti-diagonals first
        load = pltpu.make_async_copy(
            tb_ref.at[pl.ds(g * GROUP, GROUP), pl.ds(blk * TB_CHUNK, TB_CHUNK), :],
            row_block,
            in_sem,
        )
        load.start()
        load.wait()
        out_stage[:] = jnp.zeros((GROUP, TB_CHUNK), jnp.uint8)

        def step(si, _):
            local = TB_CHUNK - 1 - si
            td = blk * TB_CHUNK + local
            row = row_block[:, local, :].astype(jnp.int32)
            active = (done[:] == 0) & (cur_t[:] == td) & (td >= 1)
            b = jnp.sum(
                jnp.where(lanes == lane[:], row, 0), axis=1, keepdims=True
            )

            i = i0_of(td) + lane[:]
            j = td - i

            choice = b & 7
            is_h = mat[:] == 0
            go_d1 = (is_h & (choice == H_D1)) | (mat[:] == 1)
            go_i1 = (is_h & (choice == H_I1)) | (mat[:] == 2)
            go_d2 = (is_h & (choice == H_D2)) | (mat[:] == 3)
            go_i2 = (is_h & (choice == H_I2)) | (mat[:] == 4)
            diag = is_h & (choice == H_DIAG)

            opened = jnp.where(
                go_d1, (b >> 5) & 1,
                jnp.where(go_i1, (b >> 3) & 1,
                          jnp.where(go_d2, (b >> 6) & 1, (b >> 4) & 1)),
            ) != 0

            gap_d = go_d1 | go_d2
            gap_i = go_i1 | go_i2
            op = jnp.where(
                diag, OP_M, jnp.where(gap_i, OP_I, jnp.where(gap_d, OP_D, OP_NONE))
            )
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

            cur_t[:] = jnp.where(active, nt, cur_t[:])
            lane[:] = jnp.where(active, nl, lane[:])
            mat[:] = jnp.where(active, nmat, mat[:])
            done[:] = jnp.where(active & ndone, 1, done[:])
            emitted = jnp.where(active, op, OP_NONE).astype(jnp.uint8)
            out_stage[:, local] = emitted[:, 0]
            return 0

        jax.lax.fori_loop(0, TB_CHUNK, step, 0)
        flush = pltpu.make_async_copy(
            out_stage,
            ops_ref.at[pl.ds(g * GROUP, GROUP), pl.ds(blk * TB_CHUNK, TB_CHUNK)],
            out_sem,
        )
        flush.start()
        flush.wait()
        return 0

    jax.lax.fori_loop(0, n_blocks, block_body, 0)


@functools.partial(
    jax.jit, static_argnames=("band", "tmax", "interpret")
)
def nw_walk_pallas(tb, qlens, tlens, *, band: int, tmax: int, interpret: bool = False):
    """Pallas reverse opcode walk.  tb [B, TMAX_PAD, W] uint8 (the sweep's
    output); returns UNPACKED opcodes [B, tmax + 1] uint8 in the
    traceback_scan_device column convention (feed to nw.decode_batch)."""
    B = tb.shape[0]
    assert B % GROUP == 0, f"batch {B} must be a multiple of {GROUP}"
    ops_pad = ((tmax + 1 + TB_CHUNK - 1) // TB_CHUNK) * TB_CHUNK
    assert tb.shape[1] >= ops_pad, (tb.shape, ops_pad)
    W = band + 1
    kernel = functools.partial(
        _walk_kernel, band=band, tmax=tmax, ops_pad=ops_pad
    )
    ops = pl.pallas_call(
        kernel,
        grid=(B // GROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # tb stays in HBM
            pl.BlockSpec((GROUP, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((B, ops_pad), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((GROUP, 1), jnp.int32),  # cur_t
            pltpu.VMEM((GROUP, 1), jnp.int32),  # lane
            pltpu.VMEM((GROUP, 1), jnp.int32),  # mat
            pltpu.VMEM((GROUP, 1), jnp.int32),  # done
            pltpu.VMEM((GROUP, TB_CHUNK, W), jnp.uint8),  # row block
            pltpu.VMEM((GROUP, TB_CHUNK), jnp.uint8),  # out staging
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(tb, qlens.astype(jnp.int32)[:, None], tlens.astype(jnp.int32)[:, None])
    return ops[:, : tmax + 1]


@functools.partial(
    jax.jit,
    static_argnames=("mismatch", "o1", "e1", "o2", "e2", "band", "tmax", "interpret"),
)
def nw_align_pallas(
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
    interpret: bool = False,
):
    """Pallas Gotoh sweep.  Q [B, Lq] / T [B, Lt] uint8 codes; B % 8 == 0.

    Returns (scores [B] int32, traceback [B, TMAX_PAD, W] uint8).
    """
    B, Lq = Q.shape
    Lt = T.shape[1]
    assert B % GROUP == 0, f"batch {B} must be a multiple of {GROUP}"
    K = band
    W = K + 1
    tmax_pad = ((tmax + 1 + TB_CHUNK - 1) // TB_CHUNK) * TB_CHUNK

    # int32 operands: VPU-native lanes, and uint8 VMEM tiling restrictions
    # don't apply to the sequence windows
    Qi = jnp.pad(Q.astype(jnp.int32), ((0, 0), (1, W)), constant_values=QPAD)
    Trev = T[:, ::-1].astype(jnp.int32)
    Trev = jnp.pad(Trev, ((0, 0), (W, W)), constant_values=TPAD)

    grid = (B // GROUP,)
    kernel = functools.partial(
        _kernel,
        mismatch=mismatch,
        o1=o1,
        e1=e1,
        o2=o2,
        e2=e2,
        band=band,
        tmax=tmax,
        Lq=Lq,
        Lt=Lt,
    )
    scores, tb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((GROUP, Qi.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, Trev.shape[1]), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # full array; group offset in-kernel
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, tmax_pad, W), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((GROUP, W), jnp.int32),  # h1
            pltpu.VMEM((GROUP, W), jnp.int32),  # h2
            pltpu.VMEM((GROUP, W), jnp.int32),  # i1
            pltpu.VMEM((GROUP, W), jnp.int32),  # d1
            pltpu.VMEM((GROUP, W), jnp.int32),  # i2
            pltpu.VMEM((GROUP, W), jnp.int32),  # d2
            pltpu.VMEM((GROUP, TB_CHUNK, W), jnp.uint8),  # tb staging
            pltpu.VMEM((GROUP, 1), jnp.int32),  # score accumulator
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(Qi, Trev, qlens.astype(jnp.int32)[:, None], tlens.astype(jnp.int32)[:, None])
    return scores[:, 0], tb
