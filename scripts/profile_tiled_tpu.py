"""TPU window: band-tiling A/B on the 600-pair bench workload.

Interleaved (ABAB) same-window design per docs/ROUND3_NOTES.md — tunnel
window throughput drifts 2-3x ACROSS windows, so only interleaved
comparisons are trustworthy.  Measures:

  A: band_tiling='off'  — today's two-dispatch shape (576@511 + 48@1535)
  B: band_tiling='auto' — ONE merged tiled program (704 rows @ W=512)

plus the 72-pair latency workload both ways, and records everything in
docs/PROFILE_TILED.json.  Also warms the persistent compile cache for the
tiled shapes bench.py will hit.

Run: timeout 1750 python scripts/profile_tiled_tpu.py
ONE process per tunnel recovery window; never launch while sources are
mid-edit (CLAUDE.md).
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


wd = threading.Timer(1700.0, _abort, ("[tiled] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[tiled] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[tiled] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TILED.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402


def make_aligner(seqs, tiling):
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"),
        threads=16,
        band_tiling=tiling,
    )
    return WfaAligner(seqs, cfg)


def measure(al, pairs, n_pass):
    best = None
    samples = []
    for _ in range(n_pass):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.time()
        res = al.align_pairs(pairs)
        dt = time.time() - t0
        samples.append(round(dt, 4))
        if best is None or dt < best:
            best = dt
    return best, samples, len(res), dict(
        tiled=al.stats["tiled_chunks"], esc=al.stats["band_escalations"]
    )


seqs600 = make_sequence_set(synth_hla(n_seqs=25))
pairs600 = all_ordered_pairs(25)
seqs72 = make_sequence_set(synth_hla(n_seqs=9))
pairs72 = all_ordered_pairs(9)

al_off = make_aligner(seqs600, "off")
al_on = make_aligner(seqs600, "auto")

# warm compiles (off shapes are in the persistent cache already; tiled is new)
t0 = time.time()
al_off.align_pairs(pairs600)
REPORT["warm_off_s"] = round(time.time() - t0, 1)
flush()
t0 = time.time()
al_on.align_pairs(pairs600)
REPORT["warm_on_s"] = round(time.time() - t0, 1)
print(f"[tiled] warm: off {REPORT['warm_off_s']}s on {REPORT['warm_on_s']}s", flush=True)
flush()

# interleaved ABAB x4
runs = []
for rep in range(4):
    dt_off, s_off, n_off, st_off = measure(al_off, pairs600, 1)
    dt_on, s_on, n_on, st_on = measure(al_on, pairs600, 1)
    runs.append(
        dict(
            rep=rep,
            off_s=round(dt_off, 4),
            on_s=round(dt_on, 4),
            off_pairs_s=round(n_off / dt_off, 1),
            on_pairs_s=round(n_on / dt_on, 1),
            on_tiled_chunks=st_on["tiled"],
            off_esc=st_off["esc"],
            on_esc=st_on["esc"],
        )
    )
    REPORT["ab600"] = runs
    flush()
    print(f"[tiled] rep {rep}: off {dt_off:.3f}s on {dt_on:.3f}s "
          f"(tiled_chunks={st_on['tiled']})", flush=True)

# latency workload (72 pairs) both ways, interleaved x2
al72_off = make_aligner(seqs72, "off")
al72_on = make_aligner(seqs72, "auto")
al72_off.align_pairs(pairs72)
al72_on.align_pairs(pairs72)
lat = []
for rep in range(2):
    dt_off, *_ = measure(al72_off, pairs72, 1)
    dt_on, _, n, st = measure(al72_on, pairs72, 1)
    lat.append(dict(off_s=round(dt_off, 4), on_s=round(dt_on, 4),
                    on_tiled=st["tiled"]))
    REPORT["ab72"] = lat
    flush()
print("[tiled] done:", json.dumps(REPORT["ab600"]), flush=True)
