"""Band-sharded alignment: one (enormous) pair split across chips.

The reference requires each pair to fit one thread's memory
(/root/reference/README.md:225) — it has no sequence-parallel capability.
This module supplies the TPU-native one sketched in docs/PARALLELISM.md:
the banded anti-diagonal sweep's state is [6, B, W] and its traceback is
[T+1, B, W]; both are *embarrassingly shardable along the lane axis W*
because every dependency is a lane shift by at most one.  Sharding W over a
1-D mesh leaves each device a [.., W/D] strip and turns the shift's
shifted-in column into a one-lane halo exchange with the neighbor device
(``lax.ppermute``) per anti-diagonal step — the ring-attention communication
pattern, with a [6, B, 1] boundary column instead of K/V blocks.

Per-device memory drops from O(T·B·W) to O(T·B·W/D): a divergent pair whose
certified band (and thus traceback) exceeds one chip's HBM aligns exactly by
adding chips.  Communication per step is 2·6·B·4 bytes — vanishing next to
the [6, B, W/D] compute, so the sweep stays VPU-bound for W/D ≥ one lane
tile (128).

Exactness: the arithmetic is the global kernel's (ops/nw.py _sweep_v3,
int32 no-clamp variant) re-indexed per shard; tests assert *bit-identical*
scores and traceback bytes against the single-device kernel across mesh
sizes.  The DP body is deliberately a COPY of _sweep_v3's rather than a
shared parameterized implementation: _sweep_v3 is the TPU-measured hot
kernel whose compiled programs ship in .jax_cache, and threading shift/
window callables through it would both perturb the measured XLA program
and invalidate every cached compile over the tunnel.  The bit-parity
battery (tests/test_bandshard.py) is the drift tripwire.  Traceback decode reuses the standard host walk
(ops/nw.py traceback_pair) on the gathered [T+1, W] strip; for pairs whose
gathered traceback exceeds host memory, walk shard-by-shard instead (the
walk visits lanes monotonically within a device's strip between halo
crossings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.nw import (
    H_D1,
    H_D2,
    H_DIAG,
    H_I1,
    H_I2,
    INF,
    QPAD,
    TPAD,
    resolve_matches,
    traceback_pair,
)
from ..pos import encode_bases


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _build_sharded_sweep(mesh, mismatch, o1, e1, o2, e2, band, tmax):
    """Compile (and cache) the lane-sharded sweep for one mesh/config."""
    axis = mesh.axis_names[0]
    D = int(mesh.devices.size)
    K = band
    W = K + 1
    assert W % D == 0, f"mesh size {D} must divide band width {W}"
    Wl = W // D
    two = o2 >= 0
    NEG = INF  # int32 saturation-free mode (see _sweep_v3 validity argument)

    def local_fn(Q, T, qlens, tlens):
        B, Lq = Q.shape
        Lt = T.shape[1]
        dev = jax.lax.axis_index(axis)
        off = dev * Wl
        lanes_g = off + jnp.arange(Wl, dtype=jnp.int32)[None, :]  # global ids

        qlens_ = qlens.astype(jnp.int32)
        tlens_ = tlens.astype(jnp.int32)
        fin_t = qlens_ + tlens_

        Qp = jnp.pad(Q, ((0, 0), (1, W)), constant_values=QPAD)
        Trev = jnp.pad(T[:, ::-1], ((0, 0), (W, W)), constant_values=TPAD)

        H0 = jnp.where(lanes_g == 0, 0, jnp.full((B, Wl), NEG, jnp.int32))
        S = jnp.stack([
            H0,
            jnp.full((B, Wl), NEG, jnp.int32),
            jnp.full((B, Wl), NEG, jnp.int32),
            jnp.full((B, Wl), NEG, jnp.int32),
            jnp.full((B, Wl), NEG, jnp.int32),
            jnp.full((B, Wl), NEG, jnp.int32),
        ])
        FIN = jnp.where(
            (fin_t == 0)[:, None], H0, jnp.full((B, Wl), NEG, jnp.int32)
        )

        inf_col6 = jnp.full((6, B, 1), NEG, jnp.int32)
        # halo exchange: the shifted-in column comes from the neighbor shard
        # (ppermute zero-fills devices with no source; overwrite with NEG at
        # the global band edge)
        perm_r = [(d, d + 1) for d in range(D - 1)]
        perm_l = [(d + 1, d) for d in range(D - 1)]

        def sr6(S):
            if D == 1:
                col = inf_col6
            else:
                col = jax.lax.ppermute(S[:, :, -1:], axis, perm_r)
                col = jnp.where(dev == 0, NEG, col)
            return jnp.concatenate([col, S[:, :, :-1]], axis=2)

        def sl6(S):
            if D == 1:
                col = inf_col6
            else:
                col = jax.lax.ppermute(S[:, :, :1], axis, perm_l)
                col = jnp.where(dev == D - 1, NEG, col)
            return jnp.concatenate([S[:, :, 1:], col], axis=2)

        def qwin_at(i0):
            start = jnp.clip(i0, 0, Qp.shape[1] - W) + off
            return jax.lax.dynamic_slice_in_dim(Qp, start, Wl, axis=1)

        def twin_at(t, i0):
            start = jnp.clip(Lt - t + i0 + W, 0, Trev.shape[1] - W) + off
            return jax.lax.dynamic_slice_in_dim(Trev, start, Wl, axis=1)

        def compute_row(deps, sub):
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
                I2n = jnp.full((B, Wl), NEG, jnp.int32)
                D2n = jnp.full((B, Wl), NEG, jnp.int32)
                i2_opened = jnp.zeros((B, Wl), bool)
                d2_opened = jnp.zeros((B, Wl), bool)

            Hn = h_diag + sub
            choice = jnp.full((B, Wl), H_DIAG, jnp.uint8)
            for cand, tag in ((D1n, H_D1), (I1n, H_I1), (D2n, H_D2), (I2n, H_I2)):
                better = cand < Hn
                Hn = jnp.where(better, cand, Hn)
                choice = jnp.where(better, jnp.uint8(tag), choice)

            packed = (
                choice
                | (i1_opened.astype(jnp.uint8) << 3)
                | (i2_opened.astype(jnp.uint8) << 4)
                | (d1_opened.astype(jnp.uint8) << 5)
                | (d2_opened.astype(jnp.uint8) << 6)
            )
            return Hn, I1n, D1n, I2n, D2n, packed

        # ---- phase A: t in [1, TA], i0 = 0 (same schedule as _sweep_v3) ----
        TA = min(K, tmax)
        qwin_a = qwin_at(jnp.int32(0))  # loop-invariant

        def body_a(carry, t):
            S, FIN = carry
            R = sr6(S)
            deps = (R[0], S[0], R[1], R[2], S[3], R[4], S[5])
            sub = jnp.where(qwin_a == twin_at(t, 0), 0, mismatch).astype(jnp.int32)
            Hn, I1n, D1n, I2n, D2n, packed = compute_row(deps, sub)
            FIN = jnp.where((t == fin_t)[:, None], Hn, FIN)
            Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
            return (Sn, FIN), packed

        carry = (S, FIN)
        ts_a = jnp.arange(1, TA + 1, dtype=jnp.int32)
        carry, tb_a = jax.lax.scan(body_a, carry, ts_a)

        # ---- phase B: macro-steps of (dp=1, dp=0) rows ---------------------
        M = max(0, -(-(tmax - TA) // 2))

        def body_b(carry, m):
            S, FIN = carry
            t1 = TA + 1 + 2 * m
            i0 = (t1 - K + 1) // 2
            qwin = qwin_at(i0)
            L = sl6(S)
            deps = (S[0], L[0], S[1], S[2], L[3], S[4], L[5])
            sub = jnp.where(qwin == twin_at(t1, i0), 0, mismatch).astype(jnp.int32)
            Hn, I1n, D1n, I2n, D2n, p1 = compute_row(deps, sub)
            FIN = jnp.where((t1 == fin_t)[:, None], Hn, FIN)
            S = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
            t2 = t1 + 1
            R = sr6(S)
            deps = (R[0], S[0], S[1], R[2], S[3], R[4], S[5])
            sub = jnp.where(qwin == twin_at(t2, i0), 0, mismatch).astype(jnp.int32)
            Hn, I1n, D1n, I2n, D2n, p2 = compute_row(deps, sub)
            FIN = jnp.where((t2 == fin_t)[:, None], Hn, FIN)
            Sn = jnp.stack([Hn, S[0], I1n, D1n, I2n, D2n])
            return (Sn, FIN), jnp.stack([p1, p2])

        if M > 0:
            ms = jnp.arange(M, dtype=jnp.int32)
            carry, tb_b = jax.lax.scan(body_b, carry, ms)
        S, FIN = carry
        T_total = TA + 2 * M

        # per-pair final-lane score: local masked min, then a global min
        # across shards (exactly one shard holds the final lane)
        i0_fin = jnp.maximum((fin_t - K + 1) // 2, 0)
        fin_lane = qlens_ - i0_fin
        fin_val = jnp.min(
            jnp.where(lanes_g == fin_lane[:, None], FIN, INF), axis=1
        )
        if D > 1:
            fin_val = jax.lax.pmin(fin_val, axis)
        finished = (fin_t <= T_total) & (fin_val < INF)
        scores = jnp.where(finished, fin_val, -1)

        parts = [jnp.zeros((1, B, Wl), jnp.uint8), tb_a]
        if M > 0:
            parts.append(tb_b.reshape(2 * M, B, Wl))
        tb = jnp.concatenate(parts, axis=0)  # [T_total+1, B, Wl] local
        return scores, tb

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(None, None, axis)),
        check_vma=False,  # scores are made replicated by the pmin
    )
    return jax.jit(sharded)


def nw_align_band_sharded(
    mesh: Mesh,
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
):
    """Lane-sharded banded Gotoh over ``mesh`` (1-D).

    Same contract as ops.nw.nw_align_device with with_traceback=True, except
    the returned traceback is [T_total+1, B, W] (step-major, the kernel's
    native layout) and is *sharded on its lane axis* across the mesh — each
    device holds W/len(mesh) lanes.  band+1 must be a multiple of the mesh
    size (quantize with band_for_mesh).
    """
    fn = _build_sharded_sweep(mesh, mismatch, o1, e1, o2, e2, band, tmax)
    return fn(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(tlens)
    )


def band_for_mesh(k: int, n_devices: int, quantum: int = 128) -> int:
    """Quantize half-width k so W = k+1 splits into n_devices equal strips,
    each a multiple of `quantum` lanes (one VPU lane tile)."""
    return _round_up(k + 1, quantum * n_devices) - 1


def align_pair_sharded(
    mesh: Mesh,
    query: bytes | np.ndarray,
    target: bytes | np.ndarray,
    *,
    mismatch: int = 5,
    o1: int = 8,
    e1: int = 2,
    o2: int = 24,
    e2: int = 1,
    band: int | None = None,
) -> tuple[int, list[tuple[int, str]]]:
    """Align ONE pair whose band is sharded across every device in ``mesh``.

    Returns (score, CIGAR run-list with '='/'X' resolved).  The traceback
    walk runs on the host over the gathered strip.

    Exactness: the default band is the FULL half-width max(qlen, tlen) —
    every DP cell is inside the band, so the result is the global optimum
    by construction at any divergence (this API exists for pairs whose
    full band exceeds one chip, so it does not presume a divergence
    estimate).  A caller passing a narrower ``band`` gets the usual banded
    contract: exact iff the optimal path stays inside it — certify with
    the runner's score bound (align/runner.py _cert_bound) and escalate.

    tmax and the band quantize to coarse ladders so one compiled program
    serves many nearby pair lengths (a new shape is a full XLA compile).
    """
    q = encode_bases(query)
    t = encode_bases(target)
    qlen, tlen = q.size, t.size
    n = int(mesh.devices.size)
    if band is None:
        band = max(qlen, tlen)
    band = band_for_mesh(band, n)
    tmax = _round_up(qlen + tlen, 512)
    # phase structure rounds T_total up to TA + 2*ceil((tmax-TA)/2)
    Q = q[None, :].astype(np.uint8)
    T = t[None, :].astype(np.uint8)
    scores, tb = nw_align_band_sharded(
        mesh,
        Q,
        T,
        np.array([qlen], np.int32),
        np.array([tlen], np.int32),
        mismatch=mismatch,
        o1=o1,
        e1=e1,
        o2=o2,
        e2=e2,
        band=band,
        tmax=tmax,
    )
    score = int(jax.device_get(scores)[0])
    if score < 0:  # runtime guard, must survive python -O
        raise RuntimeError("pair did not finish inside tmax (impossible for global)")
    tb_host = np.asarray(jax.device_get(tb))[:, 0, :]  # [T+1, W]
    items = traceback_pair(tb_host, qlen, tlen, band)
    return score, resolve_matches(items, q, t)
