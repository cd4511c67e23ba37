"""TPU window: bidirectional-fold A/B + bench phase breakdown + cache warm.

One process does everything (the axon tunnel tolerates exactly one client
per recovery window):
  1. bench72 / bench600 with fold=auto, fold off, and a forced-fold
     saturation point (max_chunk_pairs=128) — each with the runner's
     orient/dispatch/collect phase timers;
  2. writes docs/PROFILE_TPU_FOLD.json incrementally;
  3. finishes by running bench.py's main() so every shape the driver's
     bench run needs is in the persistent compile cache.

Run: timeout 1750 python scripts/profile_fold_tpu.py
"""

import json
import os
import sys
import threading
import time

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


wd = threading.Timer(1700.0, _abort, ("[fold] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[fold] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[fold] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_FOLD.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
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
    st = al.stats
    REPORT[tag] = {
        "warm_s": round(warm_s, 1),
        "best_s": round(dt, 3),
        "pairs_s": round(len(res) / dt, 1),
        "orient_s": round(st["orient_s"], 3),
        "dispatch_s": round(st["dispatch_s"], 3),
        "collect_s": round(st["collect_s"], 3),
        "band_escalations": st["band_escalations"],
    }
    print(
        f"[fold] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
        f"{len(res)/dt:.0f} pairs/s (orient {st['orient_s']:.3f} "
        f"dispatch {st['dispatch_s']:.3f} collect {st['collect_s']:.3f})",
        flush=True,
    )
    flush()


for tag, n, kw in [
    ("b72_fold_auto", 9, {}),
    ("b72_nofold", 9, {"fold": False}),
    ("b600_fold_auto", 25, {}),
    ("b600_nofold", 25, {"fold": False}),
    # forced-fold saturation point: chunks of 128 pairs -> 256 fold rows
    ("b600_fold128", 25, {"fold": True, "max_chunk_pairs": 128}),
    # same chunking without fold, to separate chunk-size from fold effects
    ("b600_nofold128", 25, {"fold": False, "max_chunk_pairs": 128}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[fold] {tag} FAILED: {e}", flush=True)
        flush()

# warm the driver's exact bench shapes + record its JSON line
try:
    import bench

    print("[fold] running bench.main() for cache warm", flush=True)
    bench.main()
except SystemExit:
    pass
except Exception as e:
    REPORT["bench_main"] = {"error": str(e)[:300]}
    print(f"[fold] bench.main FAILED: {e}", flush=True)
flush()
print(json.dumps(REPORT, indent=1))
