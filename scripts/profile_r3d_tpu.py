"""Round-3 TPU window #4: e2e emission + dtype A/B under the streamed body.

Round-2 chose runs-emission and int32 with the dynamic-slice walk; the
streamed walk shifts both tradeoffs (the runs accumulator adds ~6 regions
to a now-leaner body, and the bigger opcode fetch hides behind the second
chunk's compute).  Interleaved with the default anchor.  Appends to
docs/PROFILE_TPU_R3.json.

Run: timeout 1700 python scripts/profile_r3d_tpu.py
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


watchdog = threading.Timer(1650.0, _abort, ("[r3d] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3d] device unresponsive",))
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
        "int16_retries": al.stats["int16_retries"],
    }
    out.setdefault(label, []).append(rec)
    print(f"[r3d] {label}: {rec}", file=sys.stderr)
    _dump()


measure("d_default")                      # runs + int32 (anchor)
measure("d_ops", emit="ops")              # opcode emission
measure("d_default")
measure("d_int16", dp_dtype="int16")      # saturating DP + auto-retry
measure("d_default")
print("[r3d] done", file=sys.stderr)
