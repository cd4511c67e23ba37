"""Round-3 TPU window #1: A/B the streamed-window sweep vs dynamic slices.

One do-everything process (CLAUDE.md: one TPU client per recovery window).
Measures the bench workloads (600-pair saturated, 72-pair latency) at the
runner level with STREAM_WINDOWS True/False and records JSON to
docs/PROFILE_TPU_R3.json.  Run: timeout 1500 python scripts/profile_r3_stream_tpu.py
"""

import json
import os
import sys
import time

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


import threading  # noqa: E402

watchdog = threading.Timer(1450.0, _abort, ("[r3] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3] device unresponsive",))
health.daemon = True
health.start()
import jax.numpy as jnp  # noqa: E402

jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[r3] backend: {jax.default_backend()}", file=sys.stderr)

from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.ops import nw  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

out = {}
CFG = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16)


def measure(n_seqs, n_runs, label):
    seqs = make_sequence_set(synth_hla(n_seqs=n_seqs))
    pairs = all_ordered_pairs(n_seqs)
    al = WfaAligner(seqs, CFG)
    t0 = time.time()
    al.align_pairs(pairs)  # warm (compiles)
    warm = time.time() - t0
    best = None
    for _ in range(n_runs):
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        t0 = time.time()
        res = al.align_pairs(pairs)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    rec = {
        "warm_s": round(warm, 1),
        "best_s": round(best, 3),
        "pairs_s": round(len(res) / best, 1),
        "orient_s": round(al.stats["orient_s"], 3),
        "dispatch_s": round(al.stats["dispatch_s"], 3),
        "collect_s": round(al.stats["collect_s"], 3),
        "band_escalations": al.stats["band_escalations"],
        "run_overflows": al.stats["run_overflows"],
    }
    out[label] = rec
    print(f"[r3] {label}: {rec}", file=sys.stderr)
    _dump()
    return rec


def _dump():
    with open("docs/PROFILE_TPU_R3.json", "w") as fh:
        json.dump(out, fh, indent=1)


# --- A: streamed windows (new default) ---------------------------------
assert nw.STREAM_WINDOWS is True
measure(25, 3, "b600_stream")
measure(9, 3, "b72_stream")

# --- B: dynamic-slice windows (round-2 kernel) --------------------------
nw.STREAM_WINDOWS = False
jax.clear_caches()
measure(25, 3, "b600_dynslice")
measure(9, 3, "b72_dynslice")
nw.STREAM_WINDOWS = True
jax.clear_caches()

# --- C: one more streamed pass (warm persistent cache, steadiness) ------
measure(25, 3, "b600_stream_rerun")

_dump()
print("[r3] done", file=sys.stderr)
print(json.dumps(out))
