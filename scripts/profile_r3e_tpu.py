"""Round-3 TPU window #5: one-chunk-at-wide-band vs two-chunk split.

The headline workload splits into a 576-row band-511 chunk and a 64-row
band-1535 chunk (the inversion-carrying pairs); each pays its own full
serial program, so 8% of pairs cost ~45% of wall.  Raising the traceback
budget to 8 GB merges everything into ONE band-1535 dispatch: half the
serial programs, but the sweep's per-step traffic grows 3x (possibly
bandwidth-bound).  Interleaved with the default anchor.

Run: timeout 1700 python scripts/profile_r3e_tpu.py
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


watchdog = threading.Timer(1650.0, _abort, ("[r3e] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3e] device unresponsive",))
health.daemon = True
health.start()
import jax.numpy as jnp  # noqa: E402

jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()

from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

try:
    out = json.load(open("docs/PROFILE_TPU_R3.json"))
except Exception:
    out = {}
SEQS = make_sequence_set(synth_hla(n_seqs=25))
PAIRS = all_ordered_pairs(25)


def _dump():
    with open("docs/PROFILE_TPU_R3.json", "w") as fh:
        json.dump(out, fh, indent=1)


def measure(label, n_runs=2, **cfg_kw):
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16, **cfg_kw
    )
    al = WfaAligner(SEQS, cfg)
    t0 = time.time()
    al.align_pairs(PAIRS)
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
        "cells_padded_M": round(al.stats["cells_padded"] / 1e6),
    }
    out.setdefault(label, []).append(rec)
    print(f"[r3e] {label}: {rec}", file=sys.stderr)
    _dump()


measure("e_default")
measure("e_mega8g", memory_budget_bytes=int(8e9))
measure("e_default")
measure("e_mega8g", memory_budget_bytes=int(8e9))
measure("e_default")
print("[r3e] done", file=sys.stderr)
