"""Round-4 TPU window: anchored wide route A/B + secondary metrics.

ONE do-everything process (CLAUDE.md: one TPU client per recovery window,
always under timeout).  Interleaved ABAB designs only — cross-window
numbers drift 2-3x.

Measures, in priority order (deadline-guarded so the JSON always lands):
  1. bench600 headline: anchored route vs full wide route, ABAB x3
  2. anchored + deeper window-chunk unroll (unroll_small=8) x2
  3. wide_verify pass cost (score-only verification sweep) x2
  4. sweepga backend x2
  5. e2e FASTA->GFA with phase split

Writes docs/PROFILE_R4_TPU.json.
"""

import json
import os
import sys
import time

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import numpy as np


def main() -> int:
    t_proc0 = time.time()
    import threading

    def _abort(msg):
        print(msg, file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    threading.Timer(2300.0, _abort, ("[r4] run watchdog fired",)).start()
    health = threading.Timer(150.0, _abort, ("[r4] device unresponsive",))
    health.daemon = True
    health.start()
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    jnp.ones((8, 8)).sum().block_until_ready()
    health.cancel()
    print(f"[r4] backend: {jax.default_backend()}", file=sys.stderr)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synth_hla
    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    out = {"windows": {}, "t_start": time.strftime("%F %T")}
    seqs = make_sequence_set(synth_hla(n_seqs=25))
    pairs = all_ordered_pairs(25)
    scores = AlignmentScores.parse("0,5,8,2,24,1")

    def mk(name, **kw):
        return name, WfaAligner(seqs, RunnerConfig(scores=scores, threads=16, **kw))

    aligners = dict(
        [
            mk("anchored"),  # hybrid: host DP small windows, device big
            mk("full", wide_route="full"),
            mk("anch_hostall", wide_host_window_cells=1 << 23),  # all-host
            mk("anch_verify", wide_verify=True),
        ]
    )

    def one_pass(al):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)
        t0 = time.time()
        res = al.align_pairs(pairs)
        dt = time.time() - t0
        return dt, len(res)

    def left(budget):
        return time.time() - t_proc0 < budget

    # warm compiles, priority order (each may pay fresh tunnel compiles)
    results = {}
    for name in ("anchored", "full", "anch_hostall", "anch_verify"):
        if name in ("anch_hostall", "anch_verify") and not left(1200):
            print(f"[r4] skip warm {name} (budget)", file=sys.stderr)
            aligners.pop(name)
            continue
        t0 = time.time()
        dt, n = one_pass(aligners[name])
        print(f"[r4] warm {name}: {dt:.3f}s ({n}) incl compiles "
              f"{time.time()-t0:.1f}s", file=sys.stderr)

    # interleaved measurement: 3 rounds of every warm config
    seq = [n for n in ("anchored", "full", "anch_hostall", "anch_verify") if n in aligners]
    for rep in range(3):
        if rep and not left(1700):
            break
        for name in seq:
            dt, n = one_pass(aligners[name])
            al = aligners[name]
            rec = results.setdefault(name, [])
            rec.append(
                {
                    "dt": round(dt, 4),
                    "pairs_per_s": round(n / dt, 1),
                    "anchored_pairs": al.stats.get("anchored_pairs", 0),
                    "windows": al.stats.get("anchored_windows", 0),
                    "host_windows": al.stats.get("host_windows", 0),
                    "anchored_s": round(al.stats.get("anchored_s", 0.0), 4),
                    "collect_s": round(al.stats.get("collect_s", 0.0), 4),
                    "orient_s": round(al.stats.get("orient_s", 0.0), 4),
                    "escal": al.stats.get("band_escalations", 0),
                    "verified": al.stats.get("wide_verified", 0),
                }
            )
            print(f"[r4] rep{rep} {name}: {dt:.3f}s = {n/dt:.0f}/s "
                  f"(anch {al.stats.get('anchored_pairs',0)}, "
                  f"anchored_s {al.stats.get('anchored_s',0):.3f})",
                  file=sys.stderr)
    out["headline_ab"] = results

    # sweepga
    if left(1800):
        from seqrush_tpu.align.sweep import SweepAligner

        al_sw = SweepAligner(seqs, RunnerConfig(scores=scores, threads=16))
        t0 = time.time()
        al_sw.align_pairs(pairs)
        print(f"[r4] sweepga warm {time.time()-t0:.1f}s", file=sys.stderr)
        sw = []
        for _ in range(2):
            dt, n = one_pass(al_sw)
            sw.append({"dt": round(dt, 4), "pairs_per_s": round(len(pairs) / dt, 1)})
            print(f"[r4] sweepga: {dt:.3f}s = {len(pairs)/dt:.0f}/s", file=sys.stderr)
        out["sweepga"] = sw

    # e2e with phase split
    if left(1900):
        from seqrush_tpu.config import Args
        from seqrush_tpu.pipeline import SeqRushTPU

        sr = SeqRushTPU(make_sequence_set(synth_hla()), Args(output="/tmp/r4_e2e.gfa"))
        t0 = time.time()
        sr.align_and_unite()
        g = sr.write_gfa()
        e2e = time.time() - t0
        out["e2e"] = {
            "s": round(e2e, 3),
            "nodes": g.node_count(),
            "phases_s": {k: round(v, 3) for k, v in sr.timer.phases.items()},
        }
        print(f"[r4] e2e {e2e:.2f}s phases "
              f"{ {k: round(v,2) for k,v in sr.timer.phases.items()} }", file=sys.stderr)

    # final anchored re-anchor (drift bar)
    if "anchored" in aligners and left(2100):
        dt, n = one_pass(aligners["anchored"])
        out["anchor_last"] = {"dt": round(dt, 4), "pairs_per_s": round(n / dt, 1)}
        print(f"[r4] anchor_last: {dt:.3f}s = {n/dt:.0f}/s", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "PROFILE_R4_TPU.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"[r4] wrote {path}", file=sys.stderr)
    print(json.dumps({k: v for k, v in out.items() if k != "windows"})[:600])
    os._exit(0)  # watchdog thread is non-daemon by design; hard-exit


if __name__ == "__main__":
    raise SystemExit(main())
