"""Multi-host orchestration.

Single-controller JAX covers one host's chips (parallel/mesh.py shards pair
batches over them).  For multi-host pod slices the same program runs SPMD
under ``jax.distributed``:

* every host loads the same FASTA (sequences replicated);
* the global pair list is partitioned by host (contiguous stripes);
* each host aligns its stripe on its local devices and extracts match runs;
* run triples are tiny (bytes per alignment) — they are all-gathered across
  hosts via the process-level allgather below, and every host applies the
  identical deterministic bulk unite, so the converged parent array (and
  therefore the output graph) is bitwise identical on every host;
* host 0 induces the graph, runs Ygs and writes the GFA.

Determinism does the heavy lifting: because the unite is a
reduction-order-independent min-combiner, no coordination beyond the single
allgather is needed, and output is invariant to host count (the multi-host
extension of tests/test_multidevice.py::test_shard_count_invariance).
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-host; returns
    (process_index, process_count).  No-op single-process fallback."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_stripe(n_items: int, process_index: int, process_count: int) -> slice:
    """Contiguous stripe of the pair list owned by this host."""
    per = -(-n_items // process_count)
    return slice(process_index * per, min((process_index + 1) * per, n_items))


def allgather_edge_lists(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gather per-host unite edge lists across all processes.

    Per-host lists have different lengths in general, and
    ``process_allgather`` requires identical shapes everywhere — so the
    lengths are gathered first, every payload is padded to the global max,
    and the per-host valid prefixes are re-sliced after the gather.  With a
    single process this is the identity.
    """
    import jax

    if jax.process_count() == 1:
        return u, v
    from jax.experimental import multihost_utils

    n = np.asarray([u.size], dtype=np.int64)
    lengths = np.asarray(multihost_utils.process_allgather(n, tiled=False)).reshape(-1)
    lmax = max(int(lengths.max()), 1)
    payload = np.zeros((2, lmax), dtype=np.int64)
    payload[0, : u.size] = u
    payload[1, : v.size] = v
    gathered = np.asarray(multihost_utils.process_allgather(payload, tiled=False))
    us = [gathered[h, 0, : int(lengths[h])] for h in range(gathered.shape[0])]
    vs = [gathered[h, 1, : int(lengths[h])] for h in range(gathered.shape[0])]
    return np.concatenate(us), np.concatenate(vs)
