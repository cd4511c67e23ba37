"""TPU window: walk-optimization A/B + walk-unroll ladder.

docs/PROFILE_TILED2.json showed the reverse opcode walk is 56% of the
fused program (N576 full 0.194 s vs sweep-only 0.085 s).  Its per-step
[B, W] byte extraction is now a uint8 masked-max with int16 lanes
(nw.WALK_U8).  This window measures, anchor-interleaved (anchor = N576
with current defaults):

  U8off    N576 with WALK_U8=False (the old int32 masked-sum)
  TB8      N576 tb_unroll=8
  TB16     N576 tb_unroll=16
  Ns       sweep-only N576 (walk share under the new extraction)
  W64tb8   wide bucket, unroll=8 + tb_unroll=8
  W64tb16  wide bucket, unroll=8 + tb_unroll=16
  E2E      bench600 e2e with the best raw combo vs defaults (interleaved)

Results -> docs/PROFILE_WALK.json.
Run: timeout 1750 python scripts/profile_walk_tpu.py
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
import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


wd = threading.Timer(1700.0, _abort, ("[walk] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[walk] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[walk] backend: {jax.devices()[0]}", flush=True)

from seqrush_tpu.ops import nw  # noqa: E402

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_WALK.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


PEN = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)
TMAX = 7168
LQ = 3584
KN, KW = 511, 1535

rng = np.random.default_rng(0)


def mkpairs(B, inv=False):
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
        if inv:
            a, bb = n // 3, 2 * n // 3
            t[a:bb] = (3 - t[a:bb])[::-1]
        Q[b, :n] = q
        T[b, : t.size] = t
        ql[b] = n
        tl[b] = t.size
    return jnp.asarray(Q), jnp.asarray(T), ql, tl


N576 = mkpairs(576)
W64 = mkpairs(64, inv=True)


def runk(args, band, u=4, tu=4):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(
        Q, T, ql, tl, band=band, tmax=TMAX, unroll=u, tb_unroll=tu, **PEN
    )


@functools.partial(jax.jit, static_argnames=("band",))
def sweep_only(Q, T, ql, tl, band):
    s, _tb, _t = nw._sweep_v3(
        Q, T, ql, tl, band=band, tmax=TMAX, with_traceback=True, **PEN
    )
    return s


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


def anchor():
    return bench_one(lambda: runk(N576, KN))


# warm compiles
t0 = time.time()
runk(N576, KN)[0].block_until_ready()
runk(N576, KN, 4, 8)[0].block_until_ready()
runk(N576, KN, 4, 16)[0].block_until_ready()
runk(W64, KW, 8, 8)[0].block_until_ready()
runk(W64, KW, 8, 16)[0].block_until_ready()
sweep_only(*N576, band=KN).block_until_ready()
REPORT["warm_s"] = round(time.time() - t0, 1)
print(f"[walk] warm {REPORT['warm_s']}s", flush=True)
flush()

results = {}
variants = [
    ("TB8", lambda: runk(N576, KN, 4, 8)),
    ("TB16", lambda: runk(N576, KN, 4, 16)),
    ("Ns", lambda: sweep_only(*N576, band=KN)),
    ("W64tb8", lambda: runk(W64, KW, 8, 8)),
    ("W64tb16", lambda: runk(W64, KW, 8, 16)),
]
for name, fn in variants:
    a1 = anchor()
    dt = bench_one(fn)
    a2 = anchor()
    results[name] = dict(s=round(dt, 4), anchor=round((a1 + a2) / 2, 4),
                         ratio=round(dt / ((a1 + a2) / 2), 3))
    REPORT["raw"] = results
    flush()
    print(f"[walk] {name}: {dt:.4f}s (anchor {((a1+a2)/2):.4f})", flush=True)

# U8 off (old extraction) — retrace
nw.WALK_U8 = False
jax.clear_caches()
t0 = time.time()
runk(N576, KN)[0].block_until_ready()
warm = time.time() - t0
dt = bench_one(lambda: runk(N576, KN))
nw.WALK_U8 = True
jax.clear_caches()
a = anchor()
results["U8off"] = dict(s=round(dt, 4), warm=round(warm, 1), anchor=round(a, 4),
                        ratio=round(dt / a, 3))
REPORT["raw"] = results
flush()
print(f"[walk] U8off: {dt:.4f}s vs anchor {a:.4f}", flush=True)

# e2e bench600: defaults vs best-known raw combo (set below after reading
# the raw numbers is not possible mid-run; measure tb_unroll=8 as the
# candidate since the ladder above informs the final default choice)
from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

seqs = make_sequence_set(synth_hla(n_seqs=25))
pairs = all_ordered_pairs(25)


def mk(tb_u):
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16, tb_unroll=tb_u
    )
    return WfaAligner(seqs, cfg)


al4 = mk(4)
al8 = mk(8)
al4.align_pairs(pairs)
al8.align_pairs(pairs)
e2e = []
for rep in range(3):
    row = {}
    for name, al in (("tb4", al4), ("tb8", al8)):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.time()
        res = al.align_pairs(pairs)
        row[name] = round(time.time() - t0, 4)
    row["pairs"] = len(res)
    e2e.append(row)
    REPORT["e2e600"] = e2e
    flush()
    print(f"[walk] e2e rep {rep}: {row}", flush=True)

print("[walk] done:", json.dumps(REPORT), flush=True)
