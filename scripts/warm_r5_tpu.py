"""Round-5 TPU window script: warm new shapes + measure every r5 deliverable.

ONE process for the whole window (CLAUDE.md tunnel discipline).  Phases, in
value order (compile-risky new shapes last so early numbers survive a slow
window):

  1. 72-pair latency A/B: bulk-host core route ON (new default) vs OFF,
     interleaved ABAB x3, with the orient/dispatch/collect/anchored split.
  2. 600-pair headline best-of-3 (sanity vs r4's 2,036/s).
  3. sweepga 600-pair x3 (native C++ stitch vs r4's 902/s artifact).
  4. e2e FASTA->GFA including a SECOND distinct gene in-process (SGD shape
     bucketing: the second gene must show no layout compile stall).
  5. tree:3,3,0.1 multi-family workload (308 seqs) — schedule + warm +
     best-of-2.  NEW band shapes may compile here (minutes, cached).
  6. iterative two-phase at 1,000 sequences — one full align_and_unite.

Run: timeout 1800 python scripts/warm_r5_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the persistent compilation cache)
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr)
    sys.stderr.flush()


def main():
    import threading

    def _abort(msg):
        log(msg)
        os._exit(3)

    wd = threading.Timer(1740.0, _abort, ("[warm_r5] run watchdog fired",))
    wd.daemon = True
    wd.start()
    health = threading.Timer(120.0, _abort, ("[warm_r5] device unresponsive",))
    health.daemon = True
    health.start()
    import jax
    import jax.numpy as jnp

    jnp.ones((8, 8)).sum().block_until_ready()
    health.cancel()
    log(f"[warm_r5] backend={jax.default_backend()} devices={jax.devices()}")
    t_proc0 = time.time()

    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    scores = AlignmentScores.parse("0,5,8,2,24,1")
    cfg_on = RunnerConfig(scores=scores, threads=16)
    cfg_off = RunnerConfig(scores=scores, threads=16, wide_host_total_cells=0)

    def reset(al):
        for k, v in list(al.stats.items()):
            al.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(al, attr):
                delattr(al, attr)

    def split(al):
        return " ".join(
            f"{k}={al.stats.get(k, 0):.3f}"
            for k in ("orient_s", "dispatch_s", "collect_s", "anchored_s")
        ) + f" host_windows={al.stats.get('host_windows', 0)}"

    # ---- 1. latency A/B --------------------------------------------------
    seqs9 = make_sequence_set(bench.synth_hla())
    pairs9 = all_ordered_pairs(9)
    al_on = WfaAligner(seqs9, cfg_on)
    al_off = WfaAligner(seqs9, cfg_off)
    al_on.align_pairs(pairs9)
    al_off.align_pairs(pairs9)
    log(f"[warm_r5] latency warm done at {time.time() - t_proc0:.0f}s")
    for rep in range(3):
        for tag, al in (("bulk-host ON ", al_on), ("bulk-host OFF", al_off)):
            reset(al)
            t0 = time.time()
            res = al.align_pairs(pairs9)
            dt = time.time() - t0
            log(
                f"[warm_r5] latency {tag} rep{rep}: {len(res)}/72 in {dt:.3f}s"
                f" = {len(res) / dt:.0f}/s | {split(al)}"
            )

    # ---- 2. headline -----------------------------------------------------
    seqs25 = make_sequence_set(bench.synth_hla(n_seqs=25))
    pairs600 = all_ordered_pairs(25)
    al_sat = WfaAligner(seqs25, cfg_on)
    al_sat.align_pairs(pairs600)
    best, _ = bench._timed_best_passes(al_sat, pairs600, 3)
    log(f"[warm_r5] headline 600-pair best-of-3: {600 / best:.0f}/s ({best:.3f}s)")

    # ---- 3. sweepga ------------------------------------------------------
    from seqrush_tpu.align.sweep import SweepAligner

    al_sw = SweepAligner(seqs25, cfg_on)
    al_sw.align_pairs(pairs600)
    sw_best = None
    for _ in range(3):
        reset(al_sw)
        t0 = time.time()
        al_sw.align_pairs(pairs600)
        dtw = time.time() - t0
        sw_best = dtw if sw_best is None or dtw < sw_best else sw_best
    log(f"[warm_r5] sweepga 600-pair best-of-3: {600 / sw_best:.0f} pairs/s ({sw_best:.3f}s)")

    # ---- 4. e2e + second-gene layout -------------------------------------
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU

    for tag, named in (
        ("gene A cold", bench.synth_hla()),
        ("gene A warm", bench.synth_hla()),
        ("gene B (distinct, layout must not recompile)", bench.synth_hla(n_seqs=8, length=2900, seed=99)),
    ):
        sr = SeqRushTPU(make_sequence_set(named), Args(output="/tmp/warm_e2e.gfa"))
        t0 = time.time()
        sr.align_and_unite()
        sr.write_gfa()
        log(
            f"[warm_r5] e2e {tag}: {time.time() - t0:.2f}s phases "
            + " ".join(f"{k}={v:.2f}" for k, v in sr.timer.phases.items())
        )

    # ---- 5. tree workload (new shapes possible) ---------------------------
    log(f"[warm_r5] tree phase starting at {time.time() - t_proc0:.0f}s")
    from seqrush_tpu.align.pairs import parse_sparsification, schedule_pairs
    from seqrush_tpu.ops.kmer import kmer_distance_matrix

    seqs_tree = make_sequence_set(bench.synth_zoo_families())
    al_tree = WfaAligner(seqs_tree, cfg_on)
    t0 = time.time()
    kdist = kmer_distance_matrix(al_tree.codes, 16)
    pairs_tree = schedule_pairs(
        len(seqs_tree), parse_sparsification("tree:3,3,0.1"), seed=42,
        kmer_distances=kdist,
    )
    log(f"[warm_r5] tree schedule: {len(pairs_tree)} pairs in {time.time() - t0:.2f}s")
    t0 = time.time()
    al_tree.align_pairs(pairs_tree)  # compiles any new shapes
    log(f"[warm_r5] tree warm pass: {time.time() - t0:.1f}s "
        f"(escalations {al_tree.stats['band_escalations']})")
    tree_best = None
    for _ in range(2):
        reset(al_tree)
        t0 = time.time()
        res_t = al_tree.align_pairs(pairs_tree)
        dt = time.time() - t0
        tree_best = dt if tree_best is None or dt < tree_best else tree_best
    log(
        f"[warm_r5] tree best-of-2: {len(res_t)}/{len(pairs_tree)} in "
        f"{tree_best:.2f}s = {len(res_t) / tree_best:.0f} pairs/s "
        f"({al_tree.stats['cells_padded'] / 1e9:.1f}G padded cells)"
    )

    # ---- 6. iterative 1k ---------------------------------------------------
    log(f"[warm_r5] iterative phase starting at {time.time() - t_proc0:.0f}s")
    seqs_1k = make_sequence_set(bench.synth_locus_1k())
    for rep in range(2):
        sr1k = SeqRushTPU(seqs_1k, Args(output="/tmp/warm_iter.gfa", iterative=True))
        t0 = time.time()
        sr1k.align_and_unite()
        dt = time.time() - t0
        st = sr1k.stats
        npairs = st.get("iterative_tree_pairs", 0) + st.get("iterative_random_pairs", 0)
        log(
            f"[warm_r5] iterative 1k rep{rep}: {npairs} pairs in {dt:.2f}s = "
            f"{npairs / dt:.0f} pairs/s (stabilized {st.get('iterative_stabilized')}, "
            f"dispatches {st.get('iterative_dispatches')}, "
            f"aligner wall {st['aligner']['wall_s']:.2f}s)"
        )

    log(f"[warm_r5] DONE in {time.time() - t_proc0:.0f}s")


if __name__ == "__main__":
    main()
