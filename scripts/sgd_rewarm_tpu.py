"""TPU window: re-warm compiles after the SGD fix + re-record zoo quality.

The per-node-mean SGD update and the quantized tick width changed
_sgd_run's compiled program; the driver's bench runs the e2e phase (full
Ygs) on the TPU, so the new shapes must be in .jax_cache or the bench pays
tunnel compiles.  The zoo re-run also records the post-fix layout RMSE on
TPU (the recorded 61-159 bp numbers predate the fix — the Y phase was a
silent no-op at zoo scale then).

Run: timeout 1750 python scripts/sgd_rewarm_tpu.py
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


wd = threading.Timer(1700.0, _abort, ("[rewarm] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[rewarm] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[rewarm] backend: {jax.devices()[0]}", flush=True)

OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_WARM.json")
REPORT = json.load(open(OUT)) if os.path.exists(OUT) else {}


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


import numpy as np  # noqa: E402

# 1. official bench (warms e2e incl. the new SGD compile at bench shapes)
print("[rewarm] running bench.py main()...", flush=True)
import bench  # noqa: E402

bench.main()

# 2. zoo re-run: post-fix layout quality at production scale
try:
    from seqrush_tpu.tools.validate_zoo import synth_gene, validate_gene
    import tempfile

    rng = np.random.default_rng(2024)
    zoo = []
    with tempfile.TemporaryDirectory() as td:
        for gi in range(6):
            recs = synth_gene(gi, rng)
            t0 = time.perf_counter()
            r = validate_gene(recs, f"gene{gi}", td)
            r["wall_s"] = round(time.perf_counter() - t0, 1)
            zoo.append(r)
            print(
                f"[rewarm] zoo gene{gi}: pass={r['pass']} "
                f"rmse={r.get('rmse_bp')} bp  {r['wall_s']}s",
                flush=True,
            )
            REPORT["zoo_postfix"] = zoo
            flush()
    n_pass = sum(1 for r in zoo if r["pass"])
    REPORT["zoo_postfix_summary"] = {
        "pass": f"{n_pass}/6",
        "rmse_bp": [r.get("rmse_bp") for r in zoo],
    }
    flush()
except Exception as e:
    REPORT["zoo_postfix"] = {"error": str(e)[:300]}
    print(f"[rewarm] zoo FAILED: {e}", flush=True)
    flush()
