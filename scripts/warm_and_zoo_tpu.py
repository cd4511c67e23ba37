"""TPU window: warm the production-default shapes, remaining A/B points,
and a synthetic-zoo validation run at production scale.

1. bench72/bench600 with current defaults (emit=auto runs, unroll=8) —
   exactly the shapes the driver's bench.py run will hit, so they land in
   the persistent cache (commit .jax_cache afterwards).
2. A/B points: ops kernel at unroll=8 (fair comparison), runs at
   unroll=16, and chunking variants (mega-chunk budget vs smaller chunks).
3. validate_zoo --synthetic (structural pass count + layout RMSE on
   HLA-like statistics, recorded per round) — last, behind incremental
   flushes, in case the watchdog fires.

Writes docs/PROFILE_TPU_WARM.json.  Run: timeout 1750 python scripts/warm_and_zoo_tpu.py
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


wd = threading.Timer(1700.0, _abort, ("[warm] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[warm] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[warm] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_WARM.json")


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
        "collect_s": round(stats["collect_s"], 3),
        "run_overflows": stats["run_overflows"],
    }
    print(f"[warm] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
          f"{len(res)/dt:.0f} pairs/s  collect={stats['collect_s']:.3f}s",
          flush=True)
    flush()


# 1. production-default shapes (what the driver bench compiles)
for tag, n, kw in [
    ("b72_default", 9, {}),
    ("b600_default", 25, {}),
    # 2b. chunking A/B on the saturated workload
    ("b600_megabudget", 25, {"memory_budget_bytes": int(2.6e9)}),
    ("b600_chunk128", 25, {"max_chunk_pairs": 128}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[warm] {tag} FAILED: {e}", flush=True)
        flush()

# 2a. raw fused A/B points at B=512
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
        print(f"[warm] {tag}: {best*1e3:.1f} ms = {B/best:.0f} pairs/s", flush=True)
        flush()

    point(
        "fused_ops_B512_u8",
        lambda: nw.nw_align_with_opcodes(Q, T, ql, tl, unroll=8, tb_unroll=8, **KW),
    )
    point(
        "fused_runs_B512_u16",
        lambda: nw.nw_align_with_runs(Q, T, ql, tl, unroll=16, tb_unroll=16, **KW),
    )
except Exception as e:
    REPORT["fused_points"] = {"error": str(e)[:300]}
    print(f"[warm] raw points FAILED: {e}", flush=True)
flush()

# 3. synthetic zoo validation (structural + RMSE) at production scale
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
            print(f"[warm] zoo gene{gi}: pass={r['pass']} "
                  f"rmse={r.get('rmse_bp')} bp  {r['wall_s']}s", flush=True)
            REPORT["zoo"] = zoo
            flush()
    n_pass = sum(1 for r in zoo if r["pass"])
    REPORT["zoo_summary"] = {
        "pass": f"{n_pass}/{len(zoo)}",
        "rmse_bp": [r.get("rmse_bp") for r in zoo],
    }
except Exception as e:
    REPORT["zoo_error"] = str(e)[:300]
    print(f"[warm] zoo FAILED: {e}", flush=True)
flush()
print(json.dumps(REPORT, indent=1))
