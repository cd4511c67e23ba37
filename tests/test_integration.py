"""Integration tests ported from the reference's integration_tests.rs:
performance scaling guard, realistic multi-variant example, parallel/batch
consistency (our analog of the t=1-vs-t=4 determinism check)."""

import time

import numpy as np

from seqrush_tpu.config import Args
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def family(n, length, seed):
    base = bytearray(rand_seq(length, seed))
    rng = np.random.default_rng(seed + 1)
    fam = [("s0", bytes(base))]
    for k in range(1, n):
        s = bytearray(base)
        for pos in rng.integers(0, len(s), size=max(2, length // 60)):
            s[pos] = BASES[rng.integers(0, 4)]
        fam.append((f"s{k}", bytes(s)))
    return fam


def run_e2e(fam, **kw):
    defaults = dict(no_sort=True, output="/tmp/integ.gfa")
    defaults.update(kw)
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(**defaults))
    t0 = time.time()
    sr.align_and_unite()
    g = sr.write_gfa()
    dt = time.time() - t0
    assert sr.validate_paths_match_sequences(g) == []
    return g, dt


def test_performance_scaling():
    """End-to-end time growth <= cubic in sequence length with 2x tolerance
    (reference integration_tests.rs:7-111; sizes scaled for CPU CI)."""
    sizes = [100, 200, 400]
    times = []
    for L in sizes:
        # warm the jit caches for this shape class first
        run_e2e(family(3, L, L))
        _, dt = run_e2e(family(3, L, L))
        times.append(dt)
    for k in range(1, len(sizes)):
        ratio = times[k] / max(times[0], 1e-9)
        size_ratio = (sizes[k] / sizes[0]) ** 3
        assert ratio <= 2.0 * size_ratio, (times, sizes)


def test_realistic_multi_variant():
    base = bytearray(rand_seq(500, 77))
    s1 = bytes(base)
    v = bytearray(base)
    v[100] = BASES[(v[100] + 1) % 4]
    del v[200:212]
    v[300:300] = rand_seq(9, 78)
    v2 = bytearray(base)
    v2[50:65] = rand_seq(15, 79)
    g, _ = run_e2e([("ref", s1), ("va", bytes(v)), ("vb", bytes(v2))], no_sort=False)
    ids = sorted(g.nodes)
    assert ids == list(range(1, len(ids) + 1))


def test_batch_order_consistency():
    """The same input aligned with different pair orders produces the same
    graph (the reference checks t=1 vs t=4 thread counts; batching order is
    our equivalent nondeterminism risk)."""
    fam = family(4, 200, 7)
    g1, _ = run_e2e(fam, seed=1)
    g2, _ = run_e2e(fam, seed=2)  # different sampling seed, same all-pairs set
    assert g1.to_gfa_string() == g2.to_gfa_string()


def test_kernel_consistency():
    """nw and wfa kernels produce the same graph for the same input."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.align.pairs import all_ordered_pairs

    fam = family(3, 150, 21)
    seqs = make_sequence_set(fam)
    pairs = all_ordered_pairs(3)
    res = {}
    for kernel in ("nw", "wfa"):
        al = WfaAligner(seqs, RunnerConfig(kernel=kernel))
        res[kernel] = al.align_pairs(pairs)
    scores_nw = [(r.query_idx, r.target_idx, r.score) for r in res["nw"]]
    scores_wfa = [(r.query_idx, r.target_idx, r.score) for r in res["wfa"]]
    assert scores_nw == scores_wfa
