"""TPU window: decompose the band-tiled kernel's measured regression.

docs/PROFILE_TILED.json (interleaved) showed the merged tiled program
SLOWER than the two-dispatch split (0.62-0.97 s vs 0.39-0.60 s e2e).
This window attributes the per-step cost between the candidate causes,
raw-kernel timings only (block_until_ready, no host decode):

  N576   untiled narrow   nw_align_with_runs  B=576  K=511   (anchor)
  W64    untiled wide     nw_align_with_runs  B=64   K=1535
  N704   untiled narrow   B=704 K=511          — pure B-scaling probe
  T      tiled full       B=704 K=511/1535
  Ts     tiled sweep-only (walk DCE'd)
  Ns     untiled sweep-only B=576
  Th     tiled full, TILED_HALO=False          — sweep halo cost
  Tb     tiled full, TILED_SIB=False           — walk sibling-roll cost

Interleave every variant with the N576 anchor; report anchor-relative
ratios so window drift cancels.  Results -> docs/PROFILE_TILED2.json.

Run: timeout 1750 python scripts/profile_tiled2_tpu.py
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


wd = threading.Timer(1700.0, _abort, ("[tiled2] watchdog fired",))
wd.daemon = True
wd.start()
health = threading.Timer(120.0, _abort, ("[tiled2] device unresponsive",))
health.daemon = True
health.start()
jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()
print(f"[tiled2] backend: {jax.devices()[0]}", flush=True)

from seqrush_tpu.ops import nw  # noqa: E402

REPORT = {}
OUT = os.path.join(_REPO, "docs", "PROFILE_TILED2.json")


def flush():
    with open(OUT, "w") as fh:
        json.dump(REPORT, fh, indent=1)


PEN = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)
TMAX = 7168
LQ = 3584
KN, KW, R = 511, 1535, 3
W = KN + 1

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


# untiled batches
N576 = mkpairs(576)
W64 = mkpairs(64, wide_frac_inv=True)
N704 = mkpairs(704)

# tiled batch: 552 narrow + 48 wide x 3 tiles = 696 -> 704
rows = [(k, 0, False) for k in range(552)] + [
    (552 + k, r, True) for k in range(48) for r in range(R)
]
rows += [(600 + k, 0, False) for k in range(704 - len(rows))]  # pad rows
B_T = len(rows)
Qt = np.full((B_T, LQ), nw.QPAD, np.uint8)
Tt = np.full((B_T, LQ), nw.TPAD, np.uint8)
qlt = np.zeros(B_T, np.int32)
tlt = np.zeros(B_T, np.int32)
o_off = np.zeros(B_T, np.int32)
is_wide = np.zeros(B_T, bool)
hl = np.zeros(B_T, bool)
hr = np.zeros(B_T, bool)
sibf = np.zeros((R - 1, B_T), bool)
Qn_np, Tn_np = np.asarray(N576[0]), np.asarray(N576[1])
Qw_np, Tw_np = np.asarray(W64[0]), np.asarray(W64[1])
for b, (pk, r, wde) in enumerate(rows):
    if wde:
        src = pk - 552
        Qt[b], Tt[b] = Qw_np[src], Tw_np[src]
        qlt[b], tlt[b] = W64[2][src], W64[3][src]
    else:
        src = pk % 552
        Qt[b], Tt[b] = Qn_np[src], Tn_np[src]
        qlt[b], tlt[b] = N576[2][src], N576[3][src]
    o_off[b] = r * W
    is_wide[b] = wde
    hl[b] = wde and r > 0
    hr[b] = wde and r < R - 1
for b, (pk, r, wde) in enumerate(rows):
    for k in range(1, R):
        if b + k < B_T and rows[b + k][0] == pk and rows[b + k][1] == r + k:
            sibf[k - 1, b] = True
Qt, Tt = jnp.asarray(Qt), jnp.asarray(Tt)
sibf_j = jnp.asarray(sibf)


def run_untiled(args, band):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(Q, T, ql, tl, band=band, tmax=TMAX, **PEN)


def run_tiled():
    return nw.nw_align_with_runs_tiled(
        Qt, Tt, qlt, tlt, o_off, is_wide, hl, hr, sibf_j,
        band=KN, band_wide=KW, tmax=TMAX, n_tiles=R, **PEN,
    )


@functools.partial(jax.jit, static_argnames=("band",))
def untiled_sweep_only(Q, T, ql, tl, band):
    s, _tb, _t = nw._sweep_v3(
        Q, T, ql, tl, band=band, tmax=TMAX, with_traceback=True, **PEN
    )
    return s


@jax.jit
def tiled_sweep_only(Q, T, ql, tl, o, w, l_, r_):
    W_ = KN + 1
    o_max = (R - 1) * W_
    Qp1 = jnp.pad(Q, ((0, 0), (1, 0)), constant_values=nw.QPAD)
    Qs = Qp1
    Tp = jnp.pad(T, ((0, 0), (0, o_max)), constant_values=nw.TPAD)
    Ts = Tp
    for rr in range(1, R):
        off = rr * W_
        m = (o == off)[:, None]
        Qs = jnp.where(m, jnp.roll(Qp1, -off, axis=1), Qs)
        Ts = jnp.where(m, jnp.roll(Tp, off, axis=1), Ts)
    s, _tb, _t = nw._sweep_tiled(
        Qs, Ts, ql, tl, o, w, l_, r_,
        band=KN, band_wide=KW, tmax=TMAX, **PEN,
    )
    return s


def bench_one(name, fn, n=2):
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
    return bench_one("N576", lambda: run_untiled(N576, KN))


# ---- warm compiles ----------------------------------------------------------
t0 = time.time()
run_untiled(N576, KN)[0].block_until_ready()
run_untiled(W64, KW)[0].block_until_ready()
run_untiled(N704, KN)[0].block_until_ready()
run_tiled()[0].block_until_ready()
untiled_sweep_only(*N576, band=KN).block_until_ready()
tiled_sweep_only(Qt, Tt, qlt, tlt, o_off, is_wide, hl, hr).block_until_ready()
nw.nw_align_with_runs(
    *W64, band=KW, tmax=TMAX, unroll=8, tb_unroll=8, **PEN
)[0].block_until_ready()
nw.nw_align_with_runs(
    *W64, band=KW, tmax=TMAX, unroll=16, tb_unroll=8, **PEN
)[0].block_until_ready()
REPORT["warm_s"] = round(time.time() - t0, 1)
print(f"[tiled2] warm {REPORT['warm_s']}s", flush=True)
flush()

def run_untiled_u(args, band, u, tu):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(
        Q, T, ql, tl, band=band, tmax=TMAX, unroll=u, tb_unroll=tu, **PEN
    )


variants = [
    ("W64", lambda: run_untiled(W64, KW)),
    ("N704", lambda: run_untiled(N704, KN)),
    ("T", run_tiled),
    ("Ts", lambda: tiled_sweep_only(Qt, Tt, qlt, tlt, o_off, is_wide, hl, hr)),
    ("Ns", lambda: untiled_sweep_only(*N576, band=KN)),
    # the wide bucket is tiny (64 rows): deeper unroll may win there even
    # though it lost on the mega chunk (ROUND3_NOTES §1 unroll ladder)
    ("W64u8", lambda: run_untiled_u(W64, KW, 8, 8)),
    ("W64u16", lambda: run_untiled_u(W64, KW, 16, 8)),
]
results = {}
for name, fn in variants:
    a1 = anchor()
    dt = bench_one(name, fn)
    a2 = anchor()
    results[name] = dict(s=round(dt, 4), anchor=round((a1 + a2) / 2, 4),
                         ratio=round(dt / ((a1 + a2) / 2), 3))
    REPORT["raw"] = results
    flush()
    print(f"[tiled2] {name}: {dt:.4f}s (anchor {((a1+a2)/2):.4f})", flush=True)

# ---- flag variants (retrace after flipping trace-time flags) ---------------
for flag, label in (("TILED_HALO", "Th"), ("TILED_SIB", "Tb")):
    setattr(nw, flag, False)
    jax.clear_caches()
    t0 = time.time()
    run_tiled()[0].block_until_ready()
    warm = time.time() - t0
    a1 = anchor()
    dt = bench_one(label, run_tiled)
    a2 = anchor()
    results[label] = dict(s=round(dt, 4), warm=round(warm, 1),
                          anchor=round((a1 + a2) / 2, 4),
                          ratio=round(dt / ((a1 + a2) / 2), 3))
    REPORT["raw"] = results
    flush()
    print(f"[tiled2] {label}: {dt:.4f}s", flush=True)
    setattr(nw, flag, True)
jax.clear_caches()

print("[tiled2] done:", json.dumps(results), flush=True)
