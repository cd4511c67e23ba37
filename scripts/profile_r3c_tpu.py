"""Round-3 TPU window #3: unroll ladder on the streamed fused kernel.

The ABAB window (#2) showed the streamed windows/walk changes are
noise-level: per-step cost is per-REGION sequencing over ~all regions, not
the dynamic slices specifically.  The remaining XLA-level lever is scan
UNROLL: with the streamed (pure elementwise) body, unrolled iterations can
fuse across rows, amortizing the per-step overhead.  This window ladders
(unroll, tb_unroll) on the raw fused runs kernel at the headline chunk
shape, interleaved with the default setting to control drift, then runs
the runner e2e at the best setting.  Appends to docs/PROFILE_TPU_R3.json.

Run: timeout 1700 python scripts/profile_r3c_tpu.py
"""

import json
import os
import sys
import time

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import threading  # noqa: E402

import numpy as np  # noqa: E402


def _abort(msg):
    print(msg, file=sys.stderr)
    sys.stderr.flush()
    os._exit(3)


watchdog = threading.Timer(1650.0, _abort, ("[r3c] watchdog fired",))
watchdog.daemon = True
watchdog.start()
health = threading.Timer(120.0, _abort, ("[r3c] device unresponsive",))
health.daemon = True
health.start()
import jax.numpy as jnp  # noqa: E402

jnp.ones((8, 8)).sum().block_until_ready()
health.cancel()

from bench import synth_hla  # noqa: E402
from seqrush_tpu.align.pairs import all_ordered_pairs  # noqa: E402
from seqrush_tpu.align.runner import RunnerConfig, WfaAligner  # noqa: E402
from seqrush_tpu.ops import nw  # noqa: E402
from seqrush_tpu.pos import encode_bases  # noqa: E402
from seqrush_tpu.scores import AlignmentScores  # noqa: E402
from seqrush_tpu.sequences import make_sequence_set  # noqa: E402

try:
    out = json.load(open("docs/PROFILE_TPU_R3.json"))
except Exception:
    out = {}


def _dump():
    with open("docs/PROFILE_TPU_R3.json", "w") as fh:
        json.dump(out, fh, indent=1)


# --- raw fused kernel at the headline chunk-1 shape ---------------------
rng = np.random.default_rng(7)
bases = np.frombuffer(b"ACGT", np.uint8)
B, L, BAND, TMAX = 576, 3328, 511, 6656
base = bases[rng.integers(0, 4, size=L)]
Q = np.full((B, L), nw.QPAD, np.uint8)
T = np.full((B, L), nw.TPAD, np.uint8)
for b in range(B):
    v = base.copy()
    for pos in rng.integers(0, L, size=64):
        v[pos] = bases[rng.integers(0, 4)]
    Q[b] = base
    T[b] = v
qlens = np.full(B, L, np.int32)
tlens = np.full(B, L, np.int32)


def raw(label, unroll, tb_unroll, n=2):
    t0 = time.time()
    r = nw.nw_align_with_runs(
        Q, T, qlens, tlens, mismatch=5, o1=8, e1=2, o2=24, e2=1,
        band=BAND, tmax=TMAX, unroll=unroll, tb_unroll=tb_unroll,
    )
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    best = None
    for _ in range(n):
        t0 = time.time()
        r = nw.nw_align_with_runs(
            Q, T, qlens, tlens, mismatch=5, o1=8, e1=2, o2=24, e2=1,
            band=BAND, tmax=TMAX, unroll=unroll, tb_unroll=tb_unroll,
        )
        jax.block_until_ready(r)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    rec = {"compile_s": round(compile_s, 1), "best_ms": round(best * 1e3, 1),
           "pairs_s": round(B / best, 1)}
    out.setdefault(label, []).append(rec)
    print(f"[r3c] {label}: {rec}", file=sys.stderr)
    _dump()
    return best


# interleave the default (u4/t4) as the drift anchor
raw("raw_u4_t4", 4, 4)
raw("raw_u8_t8", 8, 8)
raw("raw_u4_t4", 4, 4)
raw("raw_u16_t8", 16, 8)
raw("raw_u4_t4", 4, 4)
raw("raw_u8_t4", 8, 4)
raw("raw_u32_t16", 32, 16)
_dump()

# pick the best ladder point and run the runner e2e at it
ladder = {k: min(r["best_ms"] for r in v) for k, v in out.items() if k.startswith("raw_u")}
best_label = min(ladder, key=ladder.get)
parts = best_label.split("_")
bu, bt = int(parts[1][1:]), int(parts[2][1:])
print(f"[r3c] best ladder point: {best_label} -> runner e2e", file=sys.stderr)

SEQS = make_sequence_set(synth_hla(n_seqs=25))
PAIRS = all_ordered_pairs(25)
for label, u, t in (("e2e_u4_t4", 4, 4), (f"e2e_u{bu}_t{bt}", bu, bt)):
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"), threads=16,
        unroll=u, tb_unroll=t,
    )
    al = WfaAligner(SEQS, cfg)
    al.align_pairs(PAIRS)
    best = None
    for _ in range(3):
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.time()
        res = al.align_pairs(PAIRS)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    rec = {"best_s": round(best, 3), "pairs_s": round(len(res) / best, 1)}
    out.setdefault(label, []).append(rec)
    print(f"[r3c] {label}: {rec}", file=sys.stderr)
    _dump()

print("[r3c] done", file=sys.stderr)
