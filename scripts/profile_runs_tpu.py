"""TPU window: run-length traceback emission A/B (emit='runs' vs 'ops').

Measures the bench workloads (72-pair latency, 600-pair saturation) under
both emissions with phase timers, plus raw fused-kernel points at B=512
(ops vs runs vs runs with tb_unroll=8) to separate kernel cost from
fetch/decode.  Writes docs/PROFILE_TPU_RUNS.json as it goes and leaves
every compiled shape in the persistent cache (commit .jax_cache after).

Run: timeout 1750 python scripts/profile_runs_tpu.py
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


wd = threading.Timer(1700.0, _abort, ("[runs] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[runs] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[runs] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_RUNS.json")


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
    stats = None
    for _ in range(3):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.perf_counter()
        res = al.align_pairs(pairs)
        dt = time.perf_counter() - t0
        if not runs or dt < min(runs):
            stats = dict(al.stats)
        runs.append(dt)
    dt = min(runs)
    REPORT[tag] = {
        "warm_s": round(warm_s, 1),
        "best_s": round(dt, 3),
        "pairs_s": round(len(res) / dt, 1),
        "orient_s": round(stats["orient_s"], 3),
        "dispatch_s": round(stats["dispatch_s"], 3),
        "collect_s": round(stats["collect_s"], 3),
        "run_overflows": stats["run_overflows"],
        "band_escalations": stats["band_escalations"],
    }
    print(f"[runs] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
          f"{len(res)/dt:.0f} pairs/s  collect={stats['collect_s']:.3f}s",
          flush=True)
    flush()


for tag, n, kw in [
    ("b72_runs", 9, {"emit": "auto"}),
    ("b72_ops", 9, {"emit": "ops"}),
    ("b600_runs", 25, {"emit": "auto"}),
    ("b600_ops", 25, {"emit": "ops"}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[runs] {tag} FAILED: {e}", flush=True)
        flush()

# raw fused points at B=512: kernel + fetch, no runner overhead
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

    def point(tag, fn):
        t0 = time.perf_counter()
        out = fn()
        for a in out:
            np.asarray(a)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            for a in out:
                np.asarray(a)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        REPORT[tag] = {
            "compile_s": round(comp, 1),
            "best_ms": round(best * 1e3, 1),
            "pairs_s": round(B / best, 1),
        }
        print(f"[runs] {tag}: {best*1e3:.1f} ms = {B/best:.0f} pairs/s", flush=True)
        flush()

    point("fused_ops_B512", lambda: nw.nw_align_with_opcodes(Q, T, ql, tl, **KW))
    point("fused_runs_B512", lambda: nw.nw_align_with_runs(Q, T, ql, tl, **KW))
    point(
        "fused_runs_B512_tb8",
        lambda: nw.nw_align_with_runs(Q, T, ql, tl, tb_unroll=8, **KW),
    )
    point(
        "fused_runs_B512_u8",
        lambda: nw.nw_align_with_runs(Q, T, ql, tl, unroll=8, tb_unroll=8, **KW),
    )
except Exception as e:
    REPORT["fused_points"] = {"error": str(e)[:300]}
    print(f"[runs] raw points FAILED: {e}", flush=True)
flush()
print(json.dumps(REPORT, indent=1))
