"""Multi-device sharding tests on the virtual 8-CPU mesh: shard-count
invariance of the sharded align+unite step (the multi-chip analog of the
reference's t=1-vs-t=4 determinism check, tests/integration_tests.rs:240)."""

import numpy as np
import pytest

from seqrush_tpu.ops import unionfind as uf
from seqrush_tpu.ops import wfa
from seqrush_tpu.ops.wfa import Penalties
from seqrush_tpu.parallel.mesh import distributed_align_unite, make_mesh


def make_workload(B=8, L=96, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=L, dtype=np.uint8)
    qs, ts = [], []
    for k in range(B):
        q = base.copy()
        t = base.copy()
        t[(13 * k + 7) % L] = (t[(13 * k + 7) % L] + 1) % 4
        qs.append(q)
        ts.append(t)
    Q, T, qlens, tlens = wfa.pack_batch(qs, ts)
    caps = np.full(B, 256, dtype=np.int32)
    qoffs = np.arange(B, dtype=np.int64) * L
    toffs = np.arange(B, dtype=np.int64) * L + B * L
    return Q, T, qlens, tlens, caps, qoffs, toffs


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_sharded_step_runs(n_devices):
    Q, T, qlens, tlens, caps, qoffs, toffs = make_workload()
    mesh = make_mesh(n_devices)
    parent = uf.create(2 * 2 * 8 * 96 + 2)
    pen = Penalties(5, 8, 2, 24, 1)
    scores, parent = distributed_align_unite(
        mesh, parent, Q, T, qlens, tlens, caps, qoffs, toffs, pen, smax=256, band=32
    )
    scores = np.asarray(scores)
    assert (scores == 5).all()  # each pair differs by one SNP


def test_shard_count_invariance():
    """Identical scores and parent array for 1, 2, 4, 8 device meshes."""
    Q, T, qlens, tlens, caps, qoffs, toffs = make_workload()
    pen = Penalties(5, 8, 2, 24, 1)
    results = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        parent = uf.create(2 * 2 * 8 * 96 + 2)
        scores, parent = distributed_align_unite(
            mesh, parent, Q, T, qlens, tlens, caps, qoffs, toffs, pen, smax=256, band=32
        )
        results.append((np.asarray(scores), np.asarray(parent)))
    s0, p0 = results[0]
    for s, p in results[1:]:
        assert (s == s0).all()
        assert (p == p0).all()
