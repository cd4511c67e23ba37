"""Round-2 TPU profiling window: v3 kernel + restructured runner.

One process, one tunnel window (CLAUDE.md).  Gathers:
  1. fused sweep+traceback timings: v1 vs v3, int32 vs int16, at the bench
     dispatch shape (B=96, W=512, tmax=6656);
  2. cost breakdown: forward-only v3, traceback-walk-only, opcode d2h fetch;
  3. batch-scaling knee: fused v3 at B=256 and B=512 (is per-step cost still
     flat, i.e. is batching still free?);
  4. runner bench on the 72-pair workload (int32 + int16) and a 600-pair
     saturation workload (25 seqs all-pairs) through the new resident-array
     mega-chunk dispatch path,
while populating the persistent compile cache for bench.py.

Run: timeout 1800 python scripts/profile_v3_tpu.py
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
OUT = os.path.join(_REPO, "docs", "PROFILE_TPU_V3.json")


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
BAND, TMAX = 511, 6656

# ---- 1+3. fused kernel matrix ------------------------------------------------
CASES = [
    ("fused_v1_B96_i32", 96, False, "v1"),
    ("fused_v3_B96_i32", 96, False, "v3"),
    ("fused_v3_B96_i16", 96, True, "v3"),
    ("fused_v3_B256_i32", 256, False, "v3"),
    ("fused_v3_B512_i16", 512, True, "v3"),
]
for tag, B, i16, impl in CASES:
    Q, T, ql, tl = make_batch(B, 3300, 0.04)
    try:
        t0 = time.perf_counter()
        s, ops = nw.nw_align_with_opcodes(
            Q, T, ql, tl, band=BAND, tmax=TMAX, use_int16=i16, impl=impl, **KW)
        np.asarray(s)
        compile_s = time.perf_counter() - t0

        def run():
            s, ops = nw.nw_align_with_opcodes(
                Q, T, ql, tl, band=BAND, tmax=TMAX, use_int16=i16, impl=impl, **KW)
            np.asarray(s)
            np.asarray(ops)

        best, med = timeit(run)
        REPORT[tag] = {
            "compile_s": round(compile_s, 1),
            "best_ms": round(best * 1e3, 1),
            "med_ms": round(med * 1e3, 1),
            "pairs_s": round(B / best, 1),
            "us_per_step": round(best / (TMAX + 2) * 1e6, 2),
        }
        print(f"[profile] {tag}: compile {compile_s:.0f}s run {best*1e3:.1f} ms "
              f"({B/best:.0f} pairs/s, {best/(TMAX+2)*1e6:.1f} us/step)", flush=True)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[profile] {tag} FAILED: {e}", flush=True)
    flush_report()

# ---- 2. breakdown ------------------------------------------------------------
B = 96
Q, T, ql, tl = make_batch(B, 3300, 0.04)


@jax.jit
def fwd_v3(Q, T, ql, tl):
    s, _, _ = nw._sweep_v3(
        Q, T, ql, tl, band=BAND, tmax=TMAX, with_traceback=False, **KW)
    return s


@jax.jit
def fwd_tb_v3(Q, T, ql, tl):
    s, tb, _ = nw._sweep_v3(
        Q, T, ql, tl, band=BAND, tmax=TMAX, with_traceback=True, **KW)
    return s, tb


try:
    t0 = time.perf_counter()
    np.asarray(fwd_v3(Q, T, ql, tl))
    comp = time.perf_counter() - t0
    best, _ = timeit(lambda: np.asarray(fwd_v3(Q, T, ql, tl)))
    REPORT["fwd_only_v3_B96_i32"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
    print(f"[profile] fwd-only v3: {best*1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    s_d, tb_d = fwd_tb_v3(Q, T, ql, tl)
    np.asarray(s_d)
    comp = time.perf_counter() - t0

    def run_fwd_tb():
        s, tb = fwd_tb_v3(Q, T, ql, tl)
        s.block_until_ready()
        tb.block_until_ready()

    best, _ = timeit(run_fwd_tb)
    REPORT["fwd_emit_v3_B96_i32"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
    print(f"[profile] fwd+emit v3 (no walk, no fetch): {best*1e3:.1f} ms", flush=True)

    # walk alone on the emitted tb tensor (device-resident input)
    walk = jax.jit(lambda tb, ql, tl: nw._tb_scan_tbw(
        tb, ql, tl, band=BAND, t_total=tb.shape[0] - 1))
    t0 = time.perf_counter()
    np.asarray(walk(tb_d, ql, tl))
    comp = time.perf_counter() - t0

    def run_walk():
        walk(tb_d, ql, tl).block_until_ready()

    best, _ = timeit(run_walk)
    REPORT["walk_only_B96"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
    print(f"[profile] walk-only: {best*1e3:.1f} ms", flush=True)
except Exception as e:
    REPORT["breakdown_error"] = str(e)[:300]
    print(f"[profile] breakdown FAILED: {e}", flush=True)
flush_report()

# opcode fetch cost (d2h of [B, TMAX+1] uint8, forced fresh each time)
ops_dev = jnp.zeros((96, TMAX + 1), jnp.uint8) + jnp.uint8(1)
ops_dev.block_until_ready()
f_add = jax.jit(lambda x, k: x + k)
def fetch():
    y = f_add(ops_dev, jnp.uint8(1))  # new buffer so no cached host copy
    np.asarray(y)
best, med = timeit(fetch, n=5)
REPORT["d2h_opcodes_96x6657_ms"] = round(med * 1e3, 2)
print(f"[profile] opcode fetch: {med*1e3:.1f} ms", flush=True)
flush_report()

# ---- 4. runner bench ---------------------------------------------------------
from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402


def run_bench(tag, n_seqs, dtype):
    seqs = make_sequence_set(synth_hla(n_seqs=n_seqs))
    pairs = all_ordered_pairs(n_seqs)
    cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"),
                       threads=16, dp_dtype=dtype)
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
          f"esc={al.stats['band_escalations']}", flush=True)


for tag, n_seqs, dtype in [
    ("bench72_int32", 9, "int32"),
    ("bench72_int16", 9, "int16"),
    ("bench600_int16", 25, "int16"),
]:
    try:
        run_bench(tag, n_seqs, dtype)
    except Exception as e:
        REPORT[tag] = {"error": str(e)[:300]}
        print(f"[profile] {tag} FAILED: {e}", flush=True)
    flush_report()

print(json.dumps(REPORT, indent=1))
