"""Round-3 TPU window #2: interleaved (ABAB) A/B of the streamed sweep
windows and the streamed walk, controlling for tunnel-window drift (the
window-#1 A/B saw a 2-3x global throughput swing between configs measured
minutes apart).  Appends to docs/PROFILE_TPU_R3.json.

Run: timeout 1800 python scripts/profile_r3b_tpu.py
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

import threading  # noqa: E402

import numpy as np  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


watchdog = threading.Timer(1750.0, _abort, ("[r3b] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3b] device unresponsive",))
health.daemon = True
health.start()
import jax.numpy as jnp  # noqa: E402

jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()

from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.ops import nw  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

try:
    out = json.load(open("docs/PROFILE_TPU_R3.json"))
except Exception:
    out = {}
CFG = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16)
SEQS = make_sequence_set(synth_hla(n_seqs=25))
PAIRS = all_ordered_pairs(25)


def _dump():
    with open("docs/PROFILE_TPU_R3.json", "w") as fh:
        json.dump(out, fh, indent=1)


def set_flags(windows, walk):
    nw.STREAM_WINDOWS = windows
    nw.STREAM_WALK = walk
    jax.clear_caches()


def measure(label, n_runs=2):
    al = WfaAligner(SEQS, CFG)
    t0 = time.time()
    al.align_pairs(PAIRS)  # warm
    warm = time.time() - t0
    best = None
    for _ in range(n_runs):
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        t0 = time.time()
        res = al.align_pairs(PAIRS)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    rec = {
        "warm_s": round(warm, 1),
        "best_s": round(best, 3),
        "pairs_s": round(len(res) / best, 1),
        "collect_s": round(al.stats["collect_s"], 3),
    }
    out.setdefault(label, []).append(rec)
    print(f"[r3b] {label}: {rec}", file=sys.stderr)
    _dump()


# interleaved schedule: default appears 3x across the window so drift shows
SCHEDULE = [
    ("ww11", True, True),   # streamed windows + streamed walk (default)
    ("ww10", True, False),  # streamed windows, dynamic-slice walk
    ("ww11", True, True),
    ("ww01", False, True),  # dynamic-slice windows, streamed walk
    ("ww11", True, True),
    ("ww00", False, False), # round-2 kernel
]
for label, w, k in SCHEDULE:
    set_flags(w, k)
    measure(label)
set_flags(True, True)
print("[r3b] done", file=sys.stderr)
print(json.dumps({k: v for k, v in out.items() if k.startswith("ww")}))
