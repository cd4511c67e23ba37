"""TPU window: bidirectional fold A/B at the saturated mega-chunk shape.

The fold (ops/nw.py nw_align_fold) halves the serial anti-diagonal trip
count by running each pair as forward + backward rows meeting in the
middle.  It LOST in the latency-bound small-batch regime (b72: 378 vs 510;
forced-fold 128-pair chunks: 850 vs 1,167 — docs/PROFILE_TPU_FOLD.json)
because its per-row snapshot captures add fused regions to a scan whose
cost there is per-region sequencing overhead.  The mega-chunk default now
runs ONE dispatch at B~700 where per-step cost has a bandwidth component:
halving trips while doubling rows is bandwidth-neutral but halves the
fixed per-step overhead — the regime where the fold could win.  Measure,
don't guess.

Appends to docs/PROFILE_TPU_WARM.json; ends with the exact bench.py run
(keeps driver shapes warm in .jax_cache).

Run: timeout 1750 python scripts/fold_mega_tpu.py
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


wd = threading.Timer(1700.0, _abort, ("[fold-mega] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[fold-mega] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[fold-mega] backend: {jax.devices()[0]}", flush=True)

OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_WARM.json")
REPORT = json.load(open(OUT)) if os.path.exists(OUT) else {}


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
    res = al.align_pairs(pairs)
    warm_s = time.perf_counter() - t0
    assert len(res) == len(pairs), (tag, len(res), len(pairs))
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
    }
    print(
        f"[fold-mega] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
        f"{len(res)/dt:.0f} pairs/s (orient {stats['orient_s']:.3f} "
        f"dispatch {stats['dispatch_s']:.3f} collect {stats['collect_s']:.3f})",
        flush=True,
    )
    flush()


for tag, n, kw in [
    ("b600_default_w2", 25, {}),  # same-window control
    ("b600_fold", 25, {"fold": True}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[fold-mega] {tag} FAILED: {e}", flush=True)
        flush()

# official bench line (also re-warms every driver shape after any change)
print("[fold-mega] running bench.py main()...", flush=True)
import bench  # noqa: E402

bench.main()
