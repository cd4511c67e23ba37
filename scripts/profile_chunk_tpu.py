"""TPU window 2: chunk-size A/B for the saturated headline, unroll sweep,
e2e phase breakdown, cache warm.

Run: timeout 1750 python scripts/profile_chunk_tpu.py
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
import numpy as np  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


wd = threading.Timer(1700.0, _abort, ("[w2] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[w2] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[w2] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_W2.json")


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
        "collect_s": round(st["collect_s"], 3),
    }
    print(
        f"[w2] {tag}: {len(res)} in {dt:.3f}s = {len(res)/dt:.0f} pairs/s "
        f"(orient {st['orient_s']:.3f} collect {st['collect_s']:.3f})",
        flush=True,
    )
    flush()


for tag, n, kw in [
    ("b600_1chunk", 25, {}),                      # B=640 single dispatch
    ("b600_chunk300", 25, {"max_chunk_pairs": 300}),  # 2 x B=320, pipelined
    ("b600_chunk200", 25, {"max_chunk_pairs": 200}),  # 3 x B=256, pipelined
    ("b72", 9, {}),
]:
    try:
        run_bench(tag, n, **kw)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[w2] {tag} FAILED: {e}", flush=True)
        flush()

# unroll sweep on the fused kernel at the b600 single-chunk shape
try:
    rng = np.random.default_rng(0)
    L = 3300
    base = rng.integers(0, 4, size=L).astype(np.uint8)
    B = 640
    Q = np.full((B, 3328), nw.QPAD, np.uint8)
    T = np.full((B, 3328), nw.TPAD, np.uint8)
    for b in range(B):
        v = base.copy()
        idx = rng.integers(0, L, size=int(0.03 * L))
        v[idx] = rng.integers(0, 4, size=idx.size)
        Q[b, :L] = base
        T[b, :L] = v
    ql = np.full(B, L, np.int32)
    tl = np.full(B, L, np.int32)
    KW = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=255, tmax=6656)
    for (u, tu) in [(4, 4), (8, 8), (2, 2)]:
        t0 = time.perf_counter()
        s, ops = nw.nw_align_with_opcodes(Q, T, ql, tl, unroll=u, tb_unroll=tu, **KW)
        np.asarray(s)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, ops = nw.nw_align_with_opcodes(Q, T, ql, tl, unroll=u, tb_unroll=tu, **KW)
            np.asarray(s)
            np.asarray(ops)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        REPORT[f"fused_B640_u{u}_tu{tu}"] = {
            "compile_s": round(comp, 1),
            "best_ms": round(best * 1e3, 1),
            "pairs_s": round(B / best, 1),
        }
        print(f"[w2] fused B640 u{u}/tu{tu}: {best*1e3:.1f} ms = {B/best:.0f}/s",
              flush=True)
        flush()
except Exception as e:
    REPORT["fused_sweep"] = {"error": str(e)[:300]}
    print(f"[w2] fused sweep FAILED: {e}", flush=True)
    flush()

# e2e phase breakdown (the bench's 3.0 s e2e point)
try:
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU

    seqs2 = make_sequence_set(synth_hla())
    sr = SeqRushTPU(seqs2, Args(output="/tmp/w2_e2e.gfa"))
    t0 = time.perf_counter()
    sr.align_and_unite()
    t_align = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = sr.write_gfa()
    t_write = time.perf_counter() - t0
    REPORT["e2e"] = {
        "align_s": round(t_align, 2),
        "write_s": round(t_write, 2),
        "nodes": g.node_count(),
        "phases": {k: round(v, 2) for k, v in sr.timer.phases.items()},
    }
    print(f"[w2] e2e: align {t_align:.2f}s write {t_write:.2f}s "
          f"({g.node_count()} nodes)", flush=True)
except Exception as e:
    REPORT["e2e"] = {"error": str(e)[:300]}
    print(f"[w2] e2e FAILED: {e}", flush=True)
flush()

# warm the driver's exact bench shapes + record its JSON line
try:
    import bench

    print("[w2] running bench.main() for cache warm", flush=True)
    bench.main()
except SystemExit:
    pass
except Exception as e:
    REPORT["bench_main"] = {"error": str(e)[:300]}
    print(f"[w2] bench.main FAILED: {e}", flush=True)
flush()
print(json.dumps(REPORT, indent=1))
