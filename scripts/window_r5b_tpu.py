"""Round-5 TPU window #4: driver-shaped bench run + tree cap A/B.

ONE process: bench.main() first (prints the JSON line — the rehearsal of
record), then an interleaved A/B of the anchored-route job cap on the
tree-sparsified workload (anchored_max_jobs=256 vs 0), which the plain
bench cannot show.  bench.main()'s 2400 s watchdog bounds everything.

Run: timeout 1200 python scripts/window_r5b_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr)
    sys.stderr.flush()


def main():
    bench.main()
    log("[window4] bench done; tree cap A/B")

    import numpy as np  # noqa: F401

    from seqrush_tpu.align.pairs import parse_sparsification, schedule_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.ops.kmer import kmer_distance_matrix
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    scores = AlignmentScores.parse("0,5,8,2,24,1")
    seqs = make_sequence_set(bench.synth_zoo_families())
    al_on = WfaAligner(seqs, RunnerConfig(scores=scores, threads=16))
    al_off = WfaAligner(
        seqs, RunnerConfig(scores=scores, threads=16, anchored_max_jobs=0)
    )
    kdist = kmer_distance_matrix(al_on.codes, 16)
    pairs = schedule_pairs(
        len(seqs), parse_sparsification("tree:3,3,0.1"), seed=42,
        kmer_distances=kdist,
    )
    al_on.align_pairs(pairs)
    al_off.align_pairs(pairs)  # warm both routes' shapes

    def reset(al):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)

    for rep in range(2):
        for tag, al in (("cap ON (256)", al_on), ("cap OFF     ", al_off)):
            reset(al)
            t0 = time.time()
            res = al.align_pairs(pairs)
            dt = time.time() - t0
            st = al.stats
            log(
                f"[window4] tree {tag} rep{rep}: {len(res)}/{len(pairs)} in "
                f"{dt:.2f}s = {len(res) / dt:.0f} pairs/s | "
                + " ".join(
                    f"{k}={st.get(k, 0):.2f}"
                    for k in ("orient_s", "dispatch_s", "collect_s", "anchored_s")
                )
                + f" anchored_pairs={st.get('anchored_pairs', 0)}"
                f" escalations={st.get('band_escalations', 0)}"
            )
    log("[window4] DONE")


if __name__ == "__main__":
    main()
