"""Device mesh + sharded alignment/unite steps.

The reference's parallelism is rayon threads over a shared-memory lock-free
union-find (SURVEY.md §2.5).  The TPU-native equivalent:

* **Pair data-parallelism**: alignment batches are sharded on the batch axis
  across a 1-D ``data`` mesh; the batched wavefront kernel is already pure
  SPMD over pairs, so XLA partitions the shared score loop with zero
  communication (sequences travel with their pair rows).
* **Union merging**: per-device match-run edge lists are ``all_gather``-ed
  over the mesh and every device applies the same deterministic scatter-min
  unite to its replica of the parent array — order-independence of the
  min-combiner makes the result identical to single-device execution.
* Multi-host: the same program under ``jax.distributed.initialize`` shards
  pair batches across hosts' local devices; collectives ride ICI.

Note: ``distributed_align_unite`` below is a self-contained device-resident
step that unites the exact-match prefix run (LCP) of each pair — the
backtrace-free subset — exercising the collective+scatter pattern in
isolation (tests/test_multidevice.py).  The production path (and the driver
``dryrun_multichip``) runs the full pipeline instead: sharded fused kernel,
match-run extraction from the traceback, deterministic bulk unite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import wfa
from ..ops.unionfind import unite_edges


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    # Auto axis type: let GSPMD propagate shardings (Explicit mode rejects
    # programs that mix sharded updates into unsharded loop carries)
    return jax.make_mesh(
        (n,), ("data",), devices=devs[:n], axis_types=(jax.sharding.AxisType.Auto,)
    )


def shard_batch(mesh: Mesh, *arrays):
    """Place batch-leading arrays sharded over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, *arrays):
    sharding = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sharding) for a in arrays)


@functools.lru_cache(maxsize=32)
def _build_step(mesh, mismatch, o1, e1, o2, e2, smax, band, lcp_len):
    """Build (and cache) the jitted sharded step for a given mesh/config.

    The wavefront kernel runs inside shard_map (each device computes its
    batch shard locally, zero communication); the unite runs on the
    replicated parent after an explicit all-gather of the edge lists —
    the deterministic min-combiner makes every replica converge to the
    same parent array.
    """

    def local_fn(Q, T, qlens, tlens, caps, qoffs, toffs):
        scores, _ = wfa.wfa_align_device(
            Q,
            T,
            qlens,
            tlens,
            caps,
            mismatch=mismatch,
            o1=o1,
            e1=e1,
            o2=o2,
            e2=e2,
            smax=smax,
            band=band,
            keep_history=False,
        )
        # exact-match prefix (LCP) of each pair -> per-base unite edges
        L = lcp_len
        eq = (Q[:, :L] == T[:, :L]).astype(jnp.int32)
        lcp = jnp.sum(jnp.cumprod(eq, axis=1), axis=1)
        i = jnp.arange(L, dtype=jnp.int64)[None, :]
        mask = i < lcp[:, None]
        u = jnp.where(mask, (qoffs[:, None] + i) << 1, 0).reshape(-1)
        v = jnp.where(mask, (toffs[:, None] + i) << 1, 0).reshape(-1)
        return scores, u.astype(jnp.int32), v.astype(jnp.int32)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data"),) * 7,
        out_specs=(P("data"),) * 3,
        # the wavefront while_loop seeds its carry with unvarying constants;
        # skip the varying-manual-axes check rather than pcast every leaf
        check_vma=False,
    )

    aligned = jax.jit(sharded)

    def step(parent, Q, T, qlens, tlens, caps, qoffs, toffs):
        scores, u, v = aligned(Q, T, qlens, tlens, caps, qoffs, toffs)
        # replicate the edge lists (all-gather over ICI), then unite on the
        # replicated parent — identical result on every device
        repl = NamedSharding(mesh, P())
        u = jax.device_put(u, repl)
        v = jax.device_put(v, repl)
        parent = unite_edges(parent, u, v)
        return scores, parent

    return step


def distributed_align_unite(
    mesh: Mesh,
    parent,
    Q,
    T,
    qlens,
    tlens,
    caps,
    qoffs,
    toffs,
    pen: wfa.Penalties,
    smax: int,
    band: int,
):
    """Run the sharded align+unite step over the mesh; returns (scores, parent)."""
    B = Q.shape[0]
    n = mesh.devices.size
    assert B % n == 0, f"batch {B} must divide mesh size {n}"
    Q, T, qlens, tlens, caps, qoffs, toffs = shard_batch(
        mesh, Q, T, qlens, tlens, caps, qoffs, toffs
    )
    (parent,) = replicate(mesh, parent)
    lcp_len = int(min(Q.shape[1], T.shape[1]) - wfa.EXTEND_CHUNK)
    step = _build_step(
        mesh,
        pen.mismatch,
        pen.gap1_open,
        pen.gap1_extend,
        pen.gap2_open if pen.two_piece else -1,
        pen.gap2_extend if pen.two_piece else -1,
        smax,
        band,
        max(lcp_len, 1),
    )
    return step(parent, Q, T, qlens, tlens, caps, qoffs, toffs)
