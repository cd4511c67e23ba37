"""TPU window: wide-bucket unroll ladder + e2e A/B, then band-tiled decomposition.

Two questions, in value order:

1. Is the wide-band chunk (64 rows x band 1535 — the inversion bucket,
   ~45% of bench600 wall as its own serial program) floor-bound on the
   scan's per-step sequencing?  If so, deeper unroll amortizes it:
     W64      nw_align_with_runs B=64 K=1535 unroll=4  (current default)
     W64u8    same, unroll=8  tb_unroll=8
     W64u16   same, unroll=16 tb_unroll=8
   If the best probe beats W64 by >10%, run an interleaved e2e A/B of
   the full bench600 workload: RunnerConfig default vs unroll_small=best
   (the runner's per-chunk rule routes only the small chunk to it).

2. Decompose the band-tiled kernel's measured regression
   (docs/PROFILE_TILED.json: merged 0.62-0.97 s vs split 0.39-0.60 s):
     N704  untiled narrow B=704 K=511   — pure B-scaling probe
     T     tiled full     B=704 K=511/1535
     Ts    tiled sweep-only (walk DCE'd)
     Ns    untiled sweep-only B=576
     Th    tiled full, TILED_HALO=False — sweep halo cost
     Tb    tiled full, TILED_SIB=False  — walk sibling-roll cost

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


T_START = time.time()
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


def run_untiled(args, band):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(Q, T, ql, tl, band=band, tmax=TMAX, **PEN)


def run_untiled_u(args, band, u, tu):
    Q, T, ql, tl = args
    return nw.nw_align_with_runs(
        Q, T, ql, tl, band=band, tmax=TMAX, unroll=u, tb_unroll=tu, **PEN
    )


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


results = {}


def measure(name, fn, n=2):
    a1 = anchor()
    dt = bench_one(name, fn, n)
    a2 = anchor()
    results[name] = dict(s=round(dt, 4), anchor=round((a1 + a2) / 2, 4),
                         ratio=round(dt / ((a1 + a2) / 2), 3))
    REPORT["raw"] = results
    flush()
    print(f"[tiled2] {name}: {dt:.4f}s (anchor {((a1+a2)/2):.4f})", flush=True)
    return dt


# ---- phase 1: wide-bucket unroll ladder -------------------------------------
t0 = time.time()
run_untiled(N576, KN)[0].block_until_ready()
run_untiled(W64, KW)[0].block_until_ready()
UNROLLS = [(8, 8), (16, 8), (16, 16)]
for u, tu in UNROLLS:
    run_untiled_u(W64, KW, u, tu)[0].block_until_ready()
REPORT["warm1_s"] = round(time.time() - t0, 1)
print(f"[tiled2] warm phase1 {REPORT['warm1_s']}s", flush=True)
flush()

w64_base = measure("W64", lambda: run_untiled(W64, KW))
lad = {}
for u, tu in UNROLLS:
    lad[(u, tu)] = measure(
        f"W64u{u}tb{tu}", lambda u=u, tu=tu: run_untiled_u(W64, KW, u, tu)
    )
# anchor-relative best (window drift cancels within the interleave)
best_combo = min(lad, key=lambda k: results[f"W64u{k[0]}tb{k[1]}"]["ratio"])
best_ratio = results[f"W64u{best_combo[0]}tb{best_combo[1]}"]["ratio"]
base_ratio = results["W64"]["ratio"]
REPORT["wide_unroll_best"] = dict(
    unroll=best_combo[0], tb_unroll=best_combo[1],
    ratio=best_ratio, base_ratio=base_ratio,
    rel=round(best_ratio / base_ratio, 3),
)
flush()
print(f"[tiled2] best wide unroll {best_combo}: {best_ratio/base_ratio:.3f}x of u4",
      flush=True)

# ---- phase 2: e2e A/B if the ladder moved >10% -------------------------------
if best_ratio / base_ratio < 0.90:
    import bench as bench_mod  # repo-root bench: same synth workload
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    seqs = make_sequence_set(bench_mod.synth_hla(n_seqs=25))
    pairs = all_ordered_pairs(25)
    scores = AlignmentScores.parse("0,5,8,2,24,1")
    al_a = WfaAligner(seqs, RunnerConfig(scores=scores, threads=16))
    al_b = WfaAligner(
        seqs,
        RunnerConfig(
            scores=scores, threads=16,
            unroll_small=best_combo[0], tb_unroll_small=best_combo[1],
        ),
    )
    t0 = time.time()
    ra = al_a.align_pairs(pairs)
    rb = al_b.align_pairs(pairs)
    REPORT["warm2_s"] = round(time.time() - t0, 1)
    assert [(r.score) for r in ra] == [(r.score) for r in rb]
    e2e = {"default": [], "unroll_small": []}
    for _ in range(3):
        for key, al in (("default", al_a), ("unroll_small", al_b)):
            for attr in ("_mh_fwd", "_mh_rc"):
                if hasattr(al, attr):
                    delattr(al, attr)
            t0 = time.time()
            res = al.align_pairs(pairs)
            e2e[key].append(round(time.time() - t0, 4))
    REPORT["e2e_bench600"] = {
        k: dict(times=v, best=min(v), pairs_per_s=round(len(pairs) / min(v), 1))
        for k, v in e2e.items()
    }
    flush()
    print(f"[tiled2] e2e A/B: {json.dumps(REPORT['e2e_bench600'])}", flush=True)
else:
    print("[tiled2] wide unroll ladder flat; skipping e2e A/B", flush=True)

# ---- phase 3: band-tiled decomposition (time-permitting) ---------------------
if time.time() - T_START > 1100:
    print("[tiled2] out of window budget; skipping tiled decomposition", flush=True)
    sys.exit(0)

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


# warm compiles for phase 3
t0 = time.time()
run_untiled(N704, KN)[0].block_until_ready()
run_tiled()[0].block_until_ready()
untiled_sweep_only(*N576, band=KN).block_until_ready()
tiled_sweep_only(Qt, Tt, qlt, tlt, o_off, is_wide, hl, hr).block_until_ready()
REPORT["warm3_s"] = round(time.time() - t0, 1)
print(f"[tiled2] warm phase3 {REPORT['warm3_s']}s", flush=True)
flush()

variants = [
    ("N704", lambda: run_untiled(N704, KN)),
    ("T", run_tiled),
    ("Ts", lambda: tiled_sweep_only(Qt, Tt, qlt, tlt, o_off, is_wide, hl, hr)),
    ("Ns", lambda: untiled_sweep_only(*N576, band=KN)),
]
for name, fn in variants:
    if time.time() - T_START > 1450:
        print(f"[tiled2] budget: skipping {name}+", flush=True)
        break
    measure(name, fn)

# ---- flag variants (retrace after flipping trace-time flags) ---------------
for flag, label in (("TILED_HALO", "Th"), ("TILED_SIB", "Tb")):
    if time.time() - T_START > 1400:
        print(f"[tiled2] budget: skipping {label}", flush=True)
        break
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
