"""Round-3 TPU window #6 (final): bench record + BASELINE config coverage.

One do-everything process: (1) the bench headline/latency measurements at
the round's final defaults, (2) BASELINE.json config #4 — iterative
two-phase alignment at 1,000 sequences (never measured on TPU before;
round 3 batched its random phase), (3) the synthetic-zoo e2e on TPU with
the round's new layout defaults (RMSE + wall refresh).  Leaves every
compiled shape in the persistent cache for the driver's official bench.

Run: timeout 2300 python scripts/profile_r3f_tpu.py
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


watchdog = threading.Timer(2250.0, _abort, ("[r3f] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3f] device unresponsive",))
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


def _dump():
    with open("docs/PROFILE_TPU_R3.json", "w") as fh:
        json.dump(out, fh, indent=1)


# --- 1. bench headline at final defaults ---------------------------------
CFG = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16)
SEQS = make_sequence_set(synth_hla(n_seqs=25))
PAIRS = all_ordered_pairs(25)
al = WfaAligner(SEQS, CFG)
al.align_pairs(PAIRS)
best = None
for _ in range(4):
    for attr in ("_mh_fwd", "_mh_rc"):
        if hasattr(al, attr):
            delattr(al, attr)
    t0 = time.time()
    res = al.align_pairs(PAIRS)
    dt = time.time() - t0
    if best is None or dt < best:
        best = dt
out.setdefault("final_bench600", []).append(
    {"best_s": round(best, 3), "pairs_s": round(len(res) / best, 1)}
)
print(f"[r3f] final_bench600: {out['final_bench600'][-1]}", file=sys.stderr)
_dump()

# --- 2. BASELINE config #4: iterative two-phase, 1,000 sequences ---------
from seqrush_tpu.config import Args  # noqa: E402
from seqrush_tpu.pipeline import SeqRushTPU  # noqa: E402

rng = np.random.default_rng(3)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
base = bases[rng.integers(0, 4, size=500)]
named = [("s0", base.tobytes())]
for k in range(1, 1000):
    s = bytearray(base.tobytes())
    for pos in rng.integers(0, len(s), size=10):
        s[pos] = bases[rng.integers(0, 4)]
    named.append((f"s{k}", bytes(s)))
seqs1k = make_sequence_set(named)
sr = SeqRushTPU(seqs1k, Args(output="/tmp/iter1k.gfa", iterative=True, no_sort=True))
t0 = time.time()
sr.align_and_unite()
align_s = time.time() - t0
g = sr.write_gfa()
total_s = time.time() - t0
aligned = sr.stats["aligner"]["alignments"]
rec = {
    "n_seqs": 1000,
    "alignments": int(aligned),
    "dispatches": int(sr.stats["iterative_dispatches"]),
    "align_s": round(align_s, 1),
    "alignments_per_s": round(aligned / align_s, 1),
    "e2e_s": round(total_s, 1),
    "nodes": g.node_count(),
}
out.setdefault("iterative_1k", []).append(rec)
print(f"[r3f] iterative_1k: {rec}", file=sys.stderr)
_dump()

# --- 3. synthetic zoo e2e on TPU at the new layout defaults --------------
from seqrush_tpu.tools.validate_zoo import synth_gene, validate_gene  # noqa: E402

zrng = np.random.default_rng(1234)
zoo = []
t_zoo0 = time.time()
for i in range(6):
    fam = synth_gene(i, zrng)
    r = validate_gene(fam, f"synth{i}", "/tmp")
    zoo.append(r)
    print(f"[r3f] zoo {r}", file=sys.stderr)
rmses = [r.get("rmse_bp", float("nan")) for r in zoo]
rec = {
    "pass": sum(1 for r in zoo if r.get("pass")),
    "total": len(zoo),
    "rmse_bp": rmses,
    "rmse_mean": round(float(np.mean(rmses)), 1),
    "wall_s": round(time.time() - t_zoo0, 1),
}
out.setdefault("zoo_tpu_r3", []).append(rec)
print(f"[r3f] zoo_tpu_r3: {rec}", file=sys.stderr)
_dump()
print("[r3f] done", file=sys.stderr)
