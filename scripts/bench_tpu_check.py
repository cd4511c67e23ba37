"""TPU window: current-state bench measurement + cache warm.

Runs bench.py's exact logic (import main) so every shape the driver's
bench run compiles is in the persistent cache, then records the numbers
plus a B=512 int32 fused point and a chunk-size A/B for the saturation
workload in docs/BENCH_CHECK.json.

Run: timeout 1750 python scripts/bench_tpu_check.py
"""

import json
import os
import sys
import threading
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
sys.path.insert(0, _REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


wd = threading.Timer(1700.0, _abort, ("[check] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[check] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[check] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "BENCH_CHECK.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.ops import nw  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402


def run_bench(tag, n_seqs, **cfg_kw):
    seqs = make_sequence_set(synth_hla(n_seqs=n_seqs))
    pairs = all_ordered_pairs(n_seqs)
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16, **cfg_kw
    )
    al = WfaAligner(seqs, cfg)
    t0 = time.perf_counter()
    al.align_pairs(pairs)
    warm_s = time.perf_counter() - t0
    runs = []
    for _ in range(3):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.perf_counter()
        res = al.align_pairs(pairs)
        runs.append(time.perf_counter() - t0)
    dt = min(runs)
    REPORT[tag] = {
        "warm_s": round(warm_s, 1),
        "best_s": round(dt, 3),
        "pairs_s": round(len(res) / dt, 1),
    }
    print(f"[check] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
          f"{len(res)/dt:.0f} pairs/s", flush=True)
    flush()


for tag, n, kw in [
    ("bench72", 9, {}),
    ("bench600", 25, {}),
    ("bench600_chunk256", 25, {"max_chunk_pairs": 256}),
    ("bench600_chunk150", 25, {"max_chunk_pairs": 150}),
    ("bench72_chunk36", 9, {"max_chunk_pairs": 36}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[check] {tag} FAILED: {e}", flush=True)
        flush()

# B=512 int32 fused point (saturation roofline, v3)
try:
    rng = np.random.default_rng(0)
    L = 3300
    base = rng.integers(0, 4, size=L).astype(np.uint8)
    B = 512
    Q = np.full((B, 3328), nw.QPAD, np.uint8)
    T = np.full((B, 3328), nw.TPAD, np.uint8)
    for b in range(B):
        v = base.copy()
        idx = rng.integers(0, L, size=int(0.04 * L))
        v[idx] = rng.integers(0, 4, size=idx.size)
        Q[b, :L] = base
        T[b, :L] = v
    ql = np.full(B, L, np.int32)
    tl = np.full(B, L, np.int32)
    KW = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=511, tmax=6656)
    t0 = time.perf_counter()
    s, ops = nw.nw_align_with_opcodes(Q, T, ql, tl, **KW)
    np.asarray(s)
    comp = time.perf_counter() - t0

    def run():
        s, ops = nw.nw_align_with_opcodes(Q, T, ql, tl, **KW)
        np.asarray(s)
        np.asarray(ops)

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    REPORT["fused_v3_B512_i32"] = {
        "compile_s": round(comp, 1),
        "best_ms": round(best * 1e3, 1),
        "pairs_s": round(B / best, 1),
    }
    print(f"[check] fused v3 B512 i32: {best*1e3:.1f} ms = {B/best:.0f} pairs/s",
          flush=True)
except Exception as e:
    REPORT["fused_v3_B512_i32"] = {"error": str(e)[:300]}
    print(f"[check] B512 FAILED: {e}", flush=True)
flush()
print(json.dumps(REPORT, indent=1))
