"""TPU window: blocked-stripe walk (WALK_BLOCK) raw + e2e measurement.

The walk (reverse traceback scan + runs emission) is 55% of the fused
kernel (docs/PROFILE_TILED2.json: Ns sweep-only ratio 0.448 of the full
N576 program, replicated across two windows), and its per-step [B, W]
byte extraction is the dominant op.  WALK_BLOCK=S consumes S rows per
scan step, extracting a [B, 2S+1] stripe with ONE batched int8
dot_general (MXU) and micro-stepping on tiny arrays — bit-parity pinned
by tests/test_runs_emission.py::test_blocked_walk_parity.

Probes (anchor-interleaved, anchor = N576 default walk):
  Nb16 / Wb16   blocked S=16: B=576 K=511 / B=64 K=1535
  Nb32          blocked S=32 (if time)
Then, if blocked beats default by >10% on Nb16, an e2e bench600 A/B:
default-walk aligner vs blocked-walk aligner (flag flip + cache clear
between phases; ABA default remeasure for drift control).

Results -> docs/PROFILE_WALKBLOCK.json.
Run: timeout 1750 python scripts/profile_walkblock_tpu.py
ONE process per tunnel window; sources committed before launch.
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


T_START = time.time()
wd = threading.Timer(1700.0, _abort, ("[walkblock] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[walkblock] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[walkblock] backend: {jax.devices()[0]}", flush=True)

from seqrush_tpu.ops import nw  # noqa: E402

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_WALKBLOCK.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


PEN = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)
TMAX = 7168
LQ = 3584
KN, KW = 511, 1535

rng = np.random.default_rng(0)


def mkpairs(B, wide_frac_inv=0.0):
    Q = np.full((B, LQ), nw.QPAD, np.uint8)
    T = np.full((B, LQ), nw.TPAD, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(3280, 3360))
        q = rng.integers(0, 4, n).astype(np.uint8)
        t = q.copy()
        for p in rng.integers(0, n, int(0.02 * n)):
            t[p] = rng.integers(0, 4)
        if wide_frac_inv:
            a, bb = n // 3, 2 * n // 3
            t[a:bb] = (3 - t[a:bb])[::-1]
        Q[b, :n] = q
        T[b, : t.size] = t
        ql[b] = n
        tl[b] = t.size
    return jnp.asarray(Q), jnp.asarray(T), ql, tl


N576 = mkpairs(576)
W64 = mkpairs(64, wide_frac_inv=True)


def run(args, band):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(Q, T, ql, tl, band=band, tmax=TMAX, **PEN)


def bench_one(fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


results = {}


def flip(S):
    nw.WALK_BLOCK = S
    jax.clear_caches()


def measure_flagged(name, S, fn, n=2):
    """Measure fn under WALK_BLOCK=S, anchored by the default-walk N576
    (flag flipped + caches cleared around the probe; the persistent cache
    makes re-flips cheap)."""
    flip(0)
    a1 = bench_one(lambda: run(N576, KN))
    flip(S)
    t0 = time.time()
    fn()[0].block_until_ready()
    warm = round(time.time() - t0, 1)
    dt = bench_one(fn, n)
    flip(0)
    a2 = bench_one(lambda: run(N576, KN))
    results[name] = dict(
        s=round(dt, 4), warm=warm, anchor=round((a1 + a2) / 2, 4),
        ratio=round(dt / ((a1 + a2) / 2), 3),
    )
    REPORT["raw"] = results
    flush()
    print(f"[walkblock] {name}: {dt:.4f}s (warm {warm}s, anchor {(a1+a2)/2:.4f})",
          flush=True)
    return results[name]["ratio"]


# warm the anchor (cached from prior windows)
t0 = time.time()
run(N576, KN)[0].block_until_ready()
run(W64, KW)[0].block_until_ready()
REPORT["warm_anchor_s"] = round(time.time() - t0, 1)
flush()
print(f"[walkblock] anchor warm {REPORT['warm_anchor_s']}s", flush=True)

r16 = measure_flagged("Nb16", 16, lambda: run(N576, KN))
measure_flagged("Wb16", 16, lambda: run(W64, KW))

# S ladder point if the budget allows
if time.time() - T_START < 900:
    measure_flagged("Nb32", 32, lambda: run(N576, KN))

best_S = 16
if "Nb32" in results and results["Nb32"]["ratio"] < results["Nb16"]["ratio"]:
    best_S = 32
REPORT["best_S"] = best_S
flush()

# ---- e2e bench600 A/B --------------------------------------------------------
if results["Nb16"]["ratio"] < 0.90 and time.time() - T_START < 1300:
    import bench as bench_mod
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    seqs = make_sequence_set(bench_mod.synth_hla(n_seqs=25))
    pairs = all_ordered_pairs(25)

    def e2e_runs(n=3):
        al = WfaAligner(
            seqs,
            RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16),
        )
        al.align_pairs(pairs)  # warm
        times = []
        for _ in range(n):
            for attr in ("_mh_fwd", "_mh_rc"):
                if hasattr(al, attr):
                    delattr(al, attr)
            t0 = time.time()
            res = al.align_pairs(pairs)
            times.append(round(time.time() - t0, 4))
        return times, len(res)

    flip(0)
    td1, nres = e2e_runs(3)
    flip(best_S)
    tb, nres_b = e2e_runs(3)
    flip(0)
    td2, _ = e2e_runs(2)
    assert nres == nres_b
    REPORT["e2e_bench600"] = dict(
        default_a=td1, blocked=tb, default_b=td2,
        default_best=min(td1 + td2), blocked_best=min(tb),
        default_pairs_per_s=round(len(pairs) / min(td1 + td2), 1),
        blocked_pairs_per_s=round(len(pairs) / min(tb), 1),
        S=best_S,
    )
    flush()
    print(f"[walkblock] e2e: {json.dumps(REPORT['e2e_bench600'])}", flush=True)
else:
    print("[walkblock] skipping e2e (ratio or budget)", flush=True)

print("[walkblock] done:", json.dumps(results), flush=True)
