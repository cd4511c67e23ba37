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


def test_runner_mesh_sharding_matches_single_device():
    """The full runner produces identical alignments with and without a
    data mesh (single-host multi-chip path)."""
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=200)].tobytes()
    fam = [("s0", base)]
    for k in range(1, 5):
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=4):
            alt[pos] = bases[rng.integers(0, 4)]
        fam.append((f"s{k}", bytes(alt)))
    seqs = make_sequence_set(fam)
    pairs = all_ordered_pairs(5)

    plain = WfaAligner(seqs, RunnerConfig()).align_pairs(pairs)
    mesh = make_mesh(4)
    sharded = WfaAligner(seqs, RunnerConfig(mesh=mesh)).align_pairs(pairs)
    a = [(r.query_idx, r.target_idx, r.score, r.cigar_string) for r in plain]
    b = [(r.query_idx, r.target_idx, r.score, r.cigar_string) for r in sharded]
    assert a == b


def test_full_pipeline_gfa_mesh_invariance(tmp_path):
    """The complete FASTA->GFA pipeline emits byte-identical GFA whether the
    alignment batches run on 1 device or sharded over 2/8 devices."""
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=250)].tobytes()
    fam = [("s0", base)]
    for k in range(1, 4):
        alt = bytearray(base)
        for pos in rng.integers(0, len(alt), size=5):
            alt[pos] = bases[rng.integers(0, 4)]
        fam.append((f"s{k}", bytes(alt)))

    outputs = []
    for n in (None, 2, 8):
        out = str(tmp_path / f"m{n}.gfa")
        sr = SeqRushTPU(make_sequence_set(fam), Args(output=out, mesh_devices=n))
        sr.align_and_unite()
        sr.write_gfa()
        outputs.append(open(out).read())
    assert outputs[0] == outputs[1] == outputs[2]
