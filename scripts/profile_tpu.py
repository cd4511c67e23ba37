"""One-shot TPU profiling session for the Gotoh kernel + bench workload.

The axon tunnel is a fragile single-client resource (CLAUDE.md): this script
gathers EVERYTHING needed to tune the round in one process —
  1. dispatch round-trip latency (tiny op),
  2. host->device and device->host transfer costs at bench shapes,
  3. kernel timings across (B, W, dtype, unroll) at the bench's dispatch
     shapes (forward-only vs fused sweep+traceback),
  4. the full bench workload (warm) and e2e pipeline,
populating the persistent compile cache along the way so the driver's
bench.py run hits no compiles.

Run: timeout 3300 python scripts/profile_tpu.py  (never concurrently with
any other TPU process).
"""

import json
import os
import sys
import threading
import time

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


WATCHDOG_S = float(os.environ.get("PROFILE_WATCHDOG_S", "3200"))
wd = threading.Timer(WATCHDOG_S, _abort, ("[profile] watchdog fired",))
wd.daemon = True
wd.start()

health = threading.Timer(120.0, _abort, ("[profile] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[profile] backend: {jax.devices()[0].platform} {jax.devices()[0]}", flush=True)

REPORT = {}


def timeit(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


# ---- 1. dispatch RTT -------------------------------------------------------
x = jnp.ones((8, 128), jnp.int32)
f = jax.jit(lambda a: a + 1)
best, med = timeit(lambda: np.asarray(f(x)))
REPORT["rtt_tiny_dispatch_ms"] = round(med * 1e3, 2)
print(f"[profile] tiny dispatch+fetch RTT: best {best*1e3:.1f} ms med {med*1e3:.1f} ms", flush=True)

# ---- 2. transfers ----------------------------------------------------------
Qh = np.random.randint(0, 4, size=(96, 3584), dtype=np.uint8)
best, med = timeit(lambda: jax.device_put(Qh).block_until_ready())
REPORT["h2d_96x3584_u8_ms"] = round(med * 1e3, 2)
big = jax.device_put(np.zeros((96, 6720), np.uint8))
best, med = timeit(lambda: np.asarray(big))
REPORT["d2h_96x6720_u8_ms"] = round(med * 1e3, 2)
print(f"[profile] transfers: {REPORT['h2d_96x3584_u8_ms']} ms h2d, {REPORT['d2h_96x6720_u8_ms']} ms d2h", flush=True)

# ---- 3. kernel sweep -------------------------------------------------------
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
    ql = np.full(B, L, np.int32)
    tl = np.full(B, L, np.int32)
    return Q, T, ql, tl


KW = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)
CASES = [
    # (tag, B, band, tmax, use_int16, unroll, tb_unroll) — the first three
    # are exactly the bench workload's dispatch shapes (runner dry-run)
    ("B24_W384_i32", 24, 383, 7168, False, 4, 4),
    ("B40_W512_i32", 40, 511, 7168, False, 4, 4),
    ("B16_W1536_i32", 16, 1535, 7168, False, 4, 4),
    ("B40_W512_i16", 40, 511, 7168, True, 4, 4),
    ("B16_W1536_i16", 16, 1535, 7168, True, 4, 4),
    ("B40_W512_i32_u8", 40, 511, 7168, False, 8, 8),
    ("B40_W512_i32_u2", 40, 511, 7168, False, 2, 2),
    ("B40_W512_i16_u8", 40, 511, 7168, True, 8, 8),
]

for tag, B, band, tmax, i16, un, tun in CASES:
    Q, T, ql, tl = make_batch(B, 3300, 0.04)
    try:
        t0 = time.perf_counter()
        s, ops = nw.nw_align_with_opcodes(
            Q, T, ql, tl, band=band, tmax=tmax, use_int16=i16,
            unroll=un, tb_unroll=tun, **KW
        )
        np.asarray(s)
        compile_s = time.perf_counter() - t0

        def run():
            s, ops = nw.nw_align_with_opcodes(
                Q, T, ql, tl, band=band, tmax=tmax, use_int16=i16,
                unroll=un, tb_unroll=tun, **KW
            )
            np.asarray(s)
            np.asarray(ops)

        best, med = timeit(run, n=4)
        cells = B * (tmax + 2) * (band + 1)
        REPORT[f"kernel_{tag}"] = {
            "compile_s": round(compile_s, 1),
            "best_ms": round(best * 1e3, 1),
            "med_ms": round(med * 1e3, 1),
            "gcells_s": round(cells / best / 1e9, 2),
            "pairs_s": round(B / best, 1),
        }
        print(f"[profile] {tag}: compile {compile_s:.0f}s run {best*1e3:.1f} ms "
              f"= {cells/best/1e9:.2f} Gcells/s ({B/best:.0f} pairs/s)", flush=True)
    except Exception as e:
        REPORT[f"kernel_{tag}"] = {"error": str(e)[:200]}
        print(f"[profile] {tag} FAILED: {e}", flush=True)

# forward-only (no traceback) at the flagship shape: isolates the reverse
# scan's share
Q, T, ql, tl = make_batch(40, 3300, 0.04)
t0 = time.perf_counter()
s, _ = nw.nw_align_device(
    Q, T, ql, tl, band=511, tmax=7168, with_traceback=False, **KW
)
np.asarray(s)
comp = time.perf_counter() - t0


def fwd_only():
    s, _ = nw.nw_align_device(Q, T, ql, tl, band=511, tmax=7168, with_traceback=False, **KW)
    np.asarray(s)


best, med = timeit(fwd_only, n=4)
REPORT["fwd_only_B40_W512_i32"] = {"compile_s": round(comp, 1), "best_ms": round(best * 1e3, 1)}
print(f"[profile] fwd-only B40_W512: {best*1e3:.1f} ms (compile {comp:.0f}s)", flush=True)

# ---- 4. bench workload -----------------------------------------------------
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

for dtype in ("int32", "int16"):
    seqs = make_sequence_set(synth_hla())
    pairs = all_ordered_pairs(9)
    cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16, dp_dtype=dtype)
    warm = WfaAligner(seqs, cfg)
    t0 = time.perf_counter()
    warm.align_pairs(pairs)
    warm_s = time.perf_counter() - t0
    runs = []
    for _ in range(3):
        al = WfaAligner(seqs, cfg)
        t0 = time.perf_counter()
        res = al.align_pairs(pairs)
        runs.append(time.perf_counter() - t0)
    dt = min(runs)
    REPORT[f"bench_{dtype}"] = {
        "warm_s": round(warm_s, 1),
        "best_s": round(dt, 3),
        "pairs_s": round(len(res) / dt, 1),
        "stats": {k: v for k, v in al.stats.items() if k != "wall_s"},
    }
    print(f"[profile] bench {dtype}: {len(res)}/{len(pairs)} in {dt:.3f}s = "
          f"{len(res)/dt:.0f} pairs/s (warm {warm_s:.0f}s) "
          f"esc={al.stats['band_escalations']} i16retry={al.stats['int16_retries']}", flush=True)

print(json.dumps(REPORT, indent=1))
out_dir = os.path.join("/root/repo", "docs")
os.makedirs(out_dir, exist_ok=True)
with open(os.path.join(out_dir, "PROFILE_TPU.json"), "w") as fh:
    json.dump(REPORT, fh, indent=1)
