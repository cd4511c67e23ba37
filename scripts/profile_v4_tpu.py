"""TPU window: row-major v4 kernel vs v3, plus runner bench.

One process, one tunnel window (CLAUDE.md).  Measures:
  1. fused v4 (rows) at B in {96, 256, 512} int32, band 511 (Wr = 1023),
     vs the v3 anti-diagonal numbers already in PROFILE_TPU_V3.json;
  2. v4 forward-only and walk-only breakdown at B96;
  3. lax.cummin microcost (the one new primitive in the v4 row body);
  4. runner bench at 72 and 600 pairs (sweep='rows', int32) — also warms
     the persistent compile cache for the driver's bench.py run.

Run: timeout 1800 python scripts/profile_v4_tpu.py
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


wd = threading.Timer(float(os.environ.get("PROFILE_WATCHDOG_S", "1700")), _abort,
                     ("[profile] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[profile] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[profile] backend: {jax.devices()[0]}", flush=True)

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_V4.json")


def flush_report():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


def timeit(fn, n=4, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


from seqrush_tpu.ops import nw  # noqa: E402


def make_batch(B, L, div, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, size=L).astype(np.uint8)
    Q = np.full((B, ((L + 255) // 256) * 256), nw.QPAD, np.uint8)
    T = np.full((B, ((L + 255) // 256) * 256), nw.TPAD, np.uint8)
    for b in range(B):
        v = base.copy()
        idx = rng.integers(0, L, size=int(div * L))
        v[idx] = rng.integers(0, 4, size=idx.size)
        Q[b, :L] = base
        T[b, :L] = v
    return Q, T, np.full(B, L, np.int32), np.full(B, L, np.int32)


KW = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)
BAND = 511

# ---- 3. cummin microcost -----------------------------------------------------
x = jnp.ones((96, 1024), jnp.int32)
f_cm = jax.jit(lambda a, k: jax.lax.cummin(a + k, axis=1))
f_add = jax.jit(lambda a, k: a + k)
best_cm, _ = timeit(lambda: f_cm(x, jnp.int32(1)).block_until_ready(), n=6)
best_ad, _ = timeit(lambda: f_add(x, jnp.int32(1)).block_until_ready(), n=6)
REPORT["cummin_96x1024_us"] = round(best_cm * 1e6, 1)
REPORT["add_96x1024_us"] = round(best_ad * 1e6, 1)
print(f"[profile] cummin {best_cm*1e6:.0f} us vs add {best_ad*1e6:.0f} us", flush=True)
flush_report()

# ---- 1. fused v4 matrix ------------------------------------------------------
for tag, B in [("rows_B96_i32", 96), ("rows_B256_i32", 256), ("rows_B512_i32", 512)]:
    Q, T, ql, tl = make_batch(B, 3300, 0.04)
    R = Q.shape[1]
    try:
        t0 = time.perf_counter()
        out = nw.nw_align_rows(Q, T, ql, tl, band=BAND, **KW)
        np.asarray(out[0])
        compile_s = time.perf_counter() - t0

        def run():
            out = nw.nw_align_rows(Q, T, ql, tl, band=BAND, **KW)
            for a in out:
                np.asarray(a)

        best, med = timeit(run)
        REPORT[tag] = {
            "compile_s": round(compile_s, 1),
            "best_ms": round(best * 1e3, 1),
            "med_ms": round(med * 1e3, 1),
            "pairs_s": round(B / best, 1),
            "us_per_row": round(best / (R + 1) * 1e6, 2),
        }
        print(f"[profile] {tag}: compile {compile_s:.0f}s run {best*1e3:.1f} ms "
              f"({B/best:.0f} pairs/s, {best/(R+1)*1e6:.1f} us/row)", flush=True)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[profile] {tag} FAILED: {e}", flush=True)
    flush_report()

# ---- 2. breakdown ------------------------------------------------------------
B = 96
Q, T, ql, tl = make_batch(B, 3300, 0.04)


@jax.jit
def fwd_rows(Q, T, ql, tl):
    s, _, _ = nw._sweep_rows(Q, T, ql, tl, band=BAND, with_traceback=False, **KW)
    return s


@jax.jit
def fwd_tb_rows(Q, T, ql, tl):
    s, tb, _ = nw._sweep_rows(Q, T, ql, tl, band=BAND, with_traceback=True, **KW)
    return s, tb


try:
    t0 = time.perf_counter()
    np.asarray(fwd_rows(Q, T, ql, tl))
    comp = time.perf_counter() - t0
    best, _ = timeit(lambda: np.asarray(fwd_rows(Q, T, ql, tl)))
    REPORT["rows_fwd_only_B96"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
    print(f"[profile] rows fwd-only: {best*1e3:.1f} ms", flush=True)

    s_d, tb_d = fwd_tb_rows(Q, T, ql, tl)
    np.asarray(s_d)

    def run_emit():
        s, tb = fwd_tb_rows(Q, T, ql, tl)
        s.block_until_ready()
        tb.block_until_ready()

    best, _ = timeit(run_emit)
    REPORT["rows_fwd_emit_B96"] = {"best_ms": round(best * 1e3, 1)}
    print(f"[profile] rows fwd+emit: {best*1e3:.1f} ms", flush=True)

    walk = jax.jit(lambda tb, ql, tl: nw._tb_rows_scan(tb, ql, tl, band=BAND))
    t0 = time.perf_counter()
    np.asarray(walk(tb_d, ql, tl)[0])
    comp = time.perf_counter() - t0

    def run_walk():
        for a in walk(tb_d, ql, tl):
            a.block_until_ready()

    best, _ = timeit(run_walk)
    REPORT["rows_walk_only_B96"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
    print(f"[profile] rows walk-only: {best*1e3:.1f} ms", flush=True)
except Exception as e:
    REPORT["rows_breakdown_error"] = str(e)[:300]
    print(f"[profile] breakdown FAILED: {e}", flush=True)
flush_report()

# ---- 4. runner bench ---------------------------------------------------------
from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402


def run_bench(tag, n_seqs):
    seqs = make_sequence_set(synth_hla(n_seqs=n_seqs))
    pairs = all_ordered_pairs(n_seqs)
    cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16)
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
    REPORT[tag] = {
        "warm_s": round(warm_s, 1),
        "best_s": round(dt, 3),
        "pairs_s": round(len(res) / dt, 1),
        "stats": {k: v for k, v in al.stats.items() if k != "wall_s"},
    }
    print(f"[profile] {tag}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
          f"{len(res)/dt:.0f} pairs/s (warm {warm_s:.0f}s) "
          f"esc={al.stats['band_escalations']} ovf={al.stats['gap_overflows']}",
          flush=True)


for tag, n_seqs in [("bench72_rows", 9), ("bench600_rows", 25)]:
    try:
        run_bench(tag, n_seqs)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[profile] {tag} FAILED: {e}", flush=True)
    flush_report()

print(json.dumps(REPORT, indent=1))
