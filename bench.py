"""Benchmark: pairwise alignments/sec on an HLA-like all-pairs workload.

Runs on whatever JAX backend the environment provides (the driver runs this
on a real TPU chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "alignments/s", "vs_baseline": N}

Headline workload (the JSON "value"): 25 synthetic HLA-like sequences
(~3.3 kb, ~2% SNPs + indels), all ordered pairs (25*24 = 600) with the
reference's default scoring 0,5,8,2,24,1.  600 pairs is the smallest
all-pairs workload that actually fills the device batch dimension — the
scale an HLA-zoo run (28 genes, ~1.3k pairs) or any production sweep sees.
The measured phase is what the reference parallelizes with 64 rayon
threads: orientation pre-check + full two-piece WFA + CIGAR/match-run
extraction (SURVEY.md §3.1 hot loops 1-2).

Secondary keys: `latency_72pair_alignments_per_s` reports the 9-sequence
/ 72-pair single-gene workload of BASELINE.md's "HLA-zoo single gene" row;
`saturated_gcells_per_s` the padded DP-cell rate of the headline run (the
padding-economics regression canary); `e2e_fasta_to_gfa_s` the full
FASTA→GFA wall-clock of BASELINE.md's e2e row.
That workload is latency-bound by construction — 72 pairs fit in ONE
device dispatch, so its wall-clock is serial DP depth + host-link round
trip, not throughput; 64-thread Rust on 72 pairs is likewise measuring
per-pair latency, not pool throughput.  Both numbers are reported; the
saturated one is the headline because the 10x north-star target
(BASELINE.json: >= 20,000 pairs/s on v5e-8) is a pool-throughput target
scaled from the Rust pool estimate.

vs_baseline: BASELINE.md publishes no reference throughput (the reference
repo has no benchmarks).  We use an explicit estimate for 64-thread Rust
SeqRush: ~2 ms/pair/thread for WFA2 + CIGAR walk + unite at 3.3 kb / ~2%
divergence => ~2000 pairs/s pool throughput.  The sensitivity of
vs_baseline is therefore the estimate's; the absolute alignments/s value
is the durable number.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: the kernel compiles at most once per shape
# across processes (important over the tunneled TPU, where long compiles are
# the dominant cost and risk)
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_ALIGNMENTS_PER_S = 2000.0  # estimated 64-thread Rust SeqRush


def synth_hla(n_seqs=9, length=3300, seed=7):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=length)]
    out = [("gene*00", base.tobytes())]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    for k in range(1, n_seqs):
        s = bytearray(base.tobytes())
        # ~2% SNPs
        for pos in rng.integers(0, len(s), size=int(0.02 * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        # a few indels
        for _ in range(rng.integers(2, 6)):
            pos = int(rng.integers(0, len(s) - 50))
            ln = int(rng.integers(1, 30))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                ins = bases[rng.integers(0, 4, size=ln)].tobytes()
                s[pos:pos] = ins
        if k == n_seqs - 1:
            # an inversion-carrying sample: middle third reverse-complemented
            a, b = len(s) // 3, 2 * len(s) // 3
            s[a:b] = bytes(s[a:b]).translate(comp)[::-1]
        out.append((f"gene*{k:02d}", bytes(s)))
    return out


def synth_zoo_families(n_fam=28, haps_per_fam=11, length=3300, seed=13):
    """~300-seq multi-family corpus modeling the HLA-zoo FULL set
    (BASELINE.json config 3): families derive from one ancestral base
    (4-8% family-defining divergence + indels, like allele groups of one
    locus), haplotypes 0.5-2% within — so cross-family pairs are divergent
    but band-boundedly alignable, which is what makes TreeSampling's
    k-near/k-far split meaningful."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ancestor = bases[rng.integers(0, 4, size=length)]
    out = []
    for f in range(n_fam):
        fam = bytearray(ancestor.tobytes())
        for pos in rng.integers(0, len(fam), size=int(rng.uniform(0.04, 0.08) * len(fam))):
            fam[pos] = bases[rng.integers(0, 4)]
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(fam) - 60))
            ln = int(rng.integers(3, 40))
            if rng.random() < 0.5:
                del fam[pos : pos + ln]
            else:
                fam[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        base = bytes(fam)
        for k in range(haps_per_fam):
            s = bytearray(base)
            for pos in rng.integers(0, len(s), size=int(rng.uniform(0.005, 0.02) * len(s))):
                s[pos] = bases[rng.integers(0, 4)]
            for _ in range(int(rng.integers(0, 3))):
                pos = int(rng.integers(0, len(s) - 40))
                ln = int(rng.integers(1, 20))
                if rng.random() < 0.5:
                    del s[pos : pos + ln]
                else:
                    s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
            out.append((f"fam{f:02d}*{k:02d}", bytes(s)))
    return out


def synth_locus_1k(n_hap=1000, length=3300, seed=23):
    """1,000-haplotype single-locus corpus (BASELINE.json config 4:
    iterative two-phase at 1k seqs).  Divergence ~0.5% per haplotype —
    the allele-set regime where the reference's component-count early
    stop actually fires (at >=2% private SNPs per haplotype, coincident
    same-base SNP pairs keep changing the count and the random phase
    never stabilizes — measured r5; the reference's semantics are
    identical, seqrush.rs:1038-1121)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=length)]
    out = [("locus*0000", base.tobytes())]
    for k in range(1, n_hap):
        s = bytearray(base.tobytes())
        for pos in rng.integers(0, len(s), size=int(0.005 * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        if rng.random() < 0.3:
            pos = int(rng.integers(0, len(s) - 40))
            ln = int(rng.integers(1, 15))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        out.append((f"locus*{k:04d}", bytes(s)))
    return out


def _timed_best_passes(aligner, pairs, n_passes, *, budget_s=None, t_start=None):
    """Best wall-clock over up to n_passes steady-state align_pairs runs.

    Resets per-run stats and the orientation sketch cache before each pass
    (the measured phase = sketch + align + CIGAR decode, the reference's
    per-pair rayon work).  budget_s/t_start bound the TOTAL process time:
    extra passes stop once the budget is spent (tunnel-window throughput
    drifts 2-3x, docs/ROUND3_NOTES.md — more samples only help)."""
    best_dt, results = None, None
    for _ in range(n_passes):
        if budget_s is not None and time.time() - t_start > budget_s:
            break
        for k, v in list(aligner.stats.items()):
            aligner.stats[k] = 0.0 if isinstance(v, float) else 0
        for attr in ("_mh_fwd", "_mh_rc"):
            if hasattr(aligner, attr):
                delattr(aligner, attr)
        t0 = time.time()
        res = aligner.align_pairs(pairs)
        dt = time.time() - t0
        if best_dt is None or dt < best_dt:
            best_dt, results = dt, res
    return best_dt, results


def main():
    t_proc0 = time.time()
    # in-process watchdogs: a dead axon tunnel hangs jax calls indefinitely,
    # which would stall the driver.  (A subprocess probe is NOT safe - two
    # concurrent tunnel clients crash the TPU worker.)  One short fuse for
    # initial health, one long fuse covering the whole run in case the
    # tunnel dies mid-benchmark.
    import threading

    def _abort(msg):
        print(msg, file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    run_watchdog = threading.Timer(2400.0, _abort, ("[bench] run watchdog fired; aborting",))
    run_watchdog.daemon = True
    run_watchdog.start()
    health = threading.Timer(120.0, _abort, ("[bench] device unresponsive; aborting",))
    health.daemon = True
    health.start()
    import jax.numpy as jnp

    jnp.ones((8, 8)).sum().block_until_ready()
    health.cancel()

    from seqrush_tpu.align.pairs import all_ordered_pairs
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores
    from seqrush_tpu.sequences import make_sequence_set

    seqs = make_sequence_set(synth_hla())
    n = len(seqs)
    pairs = all_ordered_pairs(n)

    # chunks form per certified-band bucket (runner._make_nw_chunks); jobs
    # whose optimal score defeats the band certificate re-run at the
    # certified width, so every reported alignment is exactly optimal
    cfg = RunnerConfig(
        scores=AlignmentScores.parse("0,5,8,2,24,1"),
        threads=16,
    )

    # warmup: compile every (band, batch) shape and upload the resident
    # sequence arrays (one-time costs in any real run)
    aligner = WfaAligner(seqs, cfg)
    aligner.align_pairs(pairs)

    # measured runs (jit caches + resident arrays warm = steady state):
    # best of 3 removes tunnel-latency jitter.  The orientation sketch
    # cache is cleared per run so the measured phase includes the full
    # per-batch work the reference's rayon loop does (sketch + align +
    # CIGAR decode); stats reset so the report covers one run.
    dt, results = _timed_best_passes(aligner, pairs, 3)

    completed = len(results)
    lat_value = completed / dt
    st = aligner.stats
    cells = st["cells_padded"]
    # v5e VPU ~ 4 int ops/cycle/lane * 8x128 lanes * ~0.94 GHz; the sweep
    # does ~25 vector ops/cell -> crude speed-of-light ~1.5e11 cells/s.
    # The roofline for this serial-anti-diagonal formulation is the loop
    # latency: rows x ~per-row-cost, not raw VPU throughput.
    print(
        f"[bench] latency workload: {completed}/{len(pairs)} pairs in {dt:.3f}s "
        f"({st['band_escalations']} band escalations, "
        f"{st['int16_retries']} int16 retries, {st['dropped']} dropped); "
        f"{cells / 1e6:.0f}M padded DP cells = {cells / dt / 1e9:.2f} G cells/s "
        f"({st['cells_true'] / 1e6:.0f}M true cells; "
        f"{st['anchored_pairs']} wide pairs via the anchored route; "
        f"exactness: band certificate + DP-oracle-checked anchored stitches)",
        file=sys.stderr,
    )
    print(
        "[bench] latency split: "
        + " ".join(
            f"{k}={st.get(k, 0):.3f}s"
            for k in ("orient_s", "dispatch_s", "collect_s", "anchored_s")
        )
        + f" host_windows={st.get('host_windows', 0)}",
        file=sys.stderr,
    )

    # headline workload: 25 sequences, 600 ordered pairs — the batch
    # dimension actually filled, which is what an HLA-zoo-scale run
    # (28 genes, ~1.3k pairs) or any production sweep sees.
    value = 0.0
    try:
        seqs_sat = make_sequence_set(synth_hla(n_seqs=25))
        pairs_sat = all_ordered_pairs(25)
        al_sat = WfaAligner(seqs_sat, cfg)
        al_sat.align_pairs(pairs_sat)  # warm compile + resident upload
        # best-of-4 = the headline (anchor_first); the same workload is
        # resampled after the e2e/sweepga phases below as anchor_last, so
        # the JSON carries the window's own 2-3x drift bar (ROUND3_NOTES)
        sat_best, res_sat = _timed_best_passes(al_sat, pairs_sat, 4)
        value = len(res_sat) / sat_best
        st = al_sat.stats
        sat_gcells = st["cells_padded"] / sat_best / 1e9
        print(
            f"[bench] headline (saturated): {len(res_sat)}/{len(pairs_sat)} "
            f"pairs in {sat_best:.3f}s = {value:.0f} alignments/s "
            f"({st['band_escalations']} band escalations, "
            f"{st['cells_padded'] / 1e6:.0f}M padded cells = "
            f"{st['cells_padded'] / sat_best / 1e9:.2f} G cells/s)",
            file=sys.stderr,
        )
    except Exception as e:
        sat_gcells = 0.0
        print(f"[bench] headline saturated run failed: {e}", file=sys.stderr)

    # the driver runs this under a hard timeout; in a catastrophically slow
    # tunnel window the optional phases below must not starve the final
    # JSON print (no line = no recorded round).  Skip them past the deadline.
    def _past_deadline(s=300.0):
        late = time.time() - t_proc0 > s
        if late:
            print(f"[bench] {s:.0f}s deadline passed; skipping optional phase", file=sys.stderr)
        return late

    # end-to-end FASTA->GFA wall-clock (BASELINE.md's e2e row; stderr only —
    # the JSON metric stays the alignment-throughput north star)
    try:
        if _past_deadline():
            raise TimeoutError("deadline")
        from seqrush_tpu.config import Args
        from seqrush_tpu.pipeline import SeqRushTPU

        seqs2 = make_sequence_set(synth_hla())
        # one untimed pass first — the e2e row is steady-state like every
        # other phase (the align workloads get warmup passes too): the
        # graph-phase jit programs (SGD layout above all) cost ~1 s of
        # trace + compile-cache load ONCE per process
        sr = SeqRushTPU(seqs2, Args(output="/tmp/bench_e2e.gfa"))
        sr.align_and_unite()
        sr.write_gfa()
        sr = SeqRushTPU(seqs2, Args(output="/tmp/bench_e2e.gfa"))
        t0 = time.time()
        sr.align_and_unite()
        g = sr.write_gfa()
        e2e = time.time() - t0
        # phase split (VERDICT r3 weak #2: a layout-quality feature silently
        # ate the e2e row once; the split makes any regression attributable)
        e2e_phases = {k: round(v, 3) for k, v in sr.timer.phases.items()}
        print(
            f"[bench] e2e FASTA->GFA: {e2e:.2f}s "
            f"({g.node_count()} nodes, validated); phases: "
            + " ".join(f"{k}={v:.2f}s" for k, v in sr.timer.phases.items()),
            file=sys.stderr,
        )
    except Exception as e:  # never let the e2e extra break the metric line
        e2e = 0.0
        e2e_phases = {}
        print(f"[bench] e2e run failed: {e}", file=sys.stderr)

    # TreeSampling-sparsified multi-family workload (BASELINE.json config 3,
    # never measured before round 5): ~300 seqs, 'tree:3,3,0.1' schedule
    # (k-mer sketch distances -> k-near/k-far/MST tree pairs + 10% random),
    # aligned with the production runner
    tree_value = 0.0
    tree_pairs_n = 0
    tree_sched_s = 0.0
    try:
        if _past_deadline(300.0):
            raise TimeoutError("deadline")
        from seqrush_tpu.align.pairs import (
            parse_sparsification,
            schedule_pairs,
        )
        from seqrush_tpu.ops.kmer import kmer_distance_matrix

        seqs_tree = make_sequence_set(synth_zoo_families())
        al_tree = WfaAligner(seqs_tree, cfg)
        t0 = time.time()
        kdist = kmer_distance_matrix(al_tree.codes, 16)
        pairs_tree = schedule_pairs(
            len(seqs_tree), parse_sparsification("tree:3,3,0.1"),
            seed=42, kmer_distances=kdist,
        )
        tree_sched_s = time.time() - t0
        tree_pairs_n = int(len(pairs_tree))
        al_tree.align_pairs(pairs_tree)  # warm any unseen shapes
        tree_dt, res_tree = _timed_best_passes(
            al_tree, pairs_tree, 2, budget_s=400.0, t_start=t_proc0
        )
        if tree_dt is not None:
            tree_value = len(res_tree) / tree_dt
            st = al_tree.stats
            print(
                f"[bench] tree:3,3,0.1 ({len(seqs_tree)} seqs): "
                f"{len(res_tree)}/{tree_pairs_n} pairs in {tree_dt:.3f}s = "
                f"{tree_value:.0f} pairs/s (schedule {tree_sched_s:.2f}s, "
                f"{st['band_escalations']} band escalations, "
                f"{st['cells_padded'] / 1e6:.0f}M padded cells); split "
                + " ".join(
                    f"{kk}={st.get(kk, 0):.3f}s"
                    for kk in ("orient_s", "dispatch_s", "collect_s", "anchored_s")
                ),
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] tree-sparsified run failed: {e}", file=sys.stderr)

    # iterative two-phase at 1,000 sequences (BASELINE.json config 4, never
    # measured before round 5): tree pairs, then random pairs with the
    # reference's component-count early stop.  Measured as one full
    # align_and_unite run (alignment + bulk unite + component cadence).
    iter_value = 0.0
    iter_info = {}
    try:
        if _past_deadline(370.0):
            raise TimeoutError("deadline")
        from seqrush_tpu.config import Args
        from seqrush_tpu.pipeline import SeqRushTPU

        seqs_1k = make_sequence_set(synth_locus_1k())
        best = None
        for _ in range(2):
            sr1k = SeqRushTPU(seqs_1k, Args(output="/tmp/bench_iter.gfa", iterative=True))
            t0 = time.time()
            sr1k.align_and_unite()
            dt1k = time.time() - t0
            npairs = (
                sr1k.stats.get("iterative_tree_pairs", 0)
                + sr1k.stats.get("iterative_random_pairs", 0)
            )
            if best is None or dt1k < best[0]:
                best = (dt1k, npairs, sr1k.stats)
            if _past_deadline(420.0):
                break
        dt1k, npairs, st1k = best
        iter_value = npairs / dt1k
        iter_info = {
            "iterative_1k_pairs": int(npairs),
            "iterative_1k_wall_s": round(dt1k, 2),
            "iterative_1k_stabilized": bool(st1k.get("iterative_stabilized")),
            "iterative_1k_random_pairs": int(st1k.get("iterative_random_pairs", 0)),
        }
        print(
            f"[bench] iterative 1k seqs: {npairs} pairs in {dt1k:.2f}s = "
            f"{iter_value:.0f} pairs/s (tree {st1k.get('iterative_tree_pairs')}, "
            f"random {st1k.get('iterative_random_pairs')}, "
            f"stabilized={st1k.get('iterative_stabilized')}, "
            f"{st1k.get('iterative_dispatches')} dispatches)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] iterative 1k run failed: {e}", file=sys.stderr)

    # sweepga backend throughput on the same saturated workload (the
    # reference's FastGA+filter path is its FAST mode, estimated 5-10x its
    # WFA path, docs/sweepga_integration.md:403-406 — so it needs its own
    # measured number; VERDICT r2 #3)
    sweep_value = 0.0
    try:
        if _past_deadline(430.0):
            raise TimeoutError("deadline")
        from seqrush_tpu.align.sweep import SweepAligner

        al_sw = SweepAligner(seqs_sat, cfg)
        al_sw.align_pairs(pairs_sat)  # warm compiles
        sw_best = None
        for _ in range(2):
            # reset stats so the reported counts cover ONE pass; re-pay the
            # orientation sketch like the headline loop, but keep the
            # minimizer index (_min_cache): FastGA indexes each sequence
            # once per run, so a warm index IS the modeled steady state
            for k, v in list(al_sw.stats.items()):
                al_sw.stats[k] = 0.0 if isinstance(v, float) else 0
            for attr in ("_mh_fwd", "_mh_rc"):
                if hasattr(al_sw, attr):
                    delattr(al_sw, attr)
            t0 = time.time()
            res_sw = al_sw.align_pairs(pairs_sat)
            dtw = time.time() - t0
            if sw_best is None or dtw < sw_best:
                sw_best = dtw
        sweep_value = len(pairs_sat) / sw_best
        print(
            f"[bench] sweepga backend: {len(pairs_sat)} pairs in "
            f"{sw_best:.3f}s = {sweep_value:.0f} pairs/s "
            f"({len(res_sw)} records kept, {al_sw.stats['chains']} chains, "
            f"{al_sw.stats['filtered_1to1']} filtered 1:1)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] sweepga run failed: {e}", file=sys.stderr)

    # second sampling of the SAME anchor workload, minutes after the first:
    # tunnel-window throughput drifts 2-3x (docs/ROUND3_NOTES.md), so the
    # first/last pair carries the round's own drift bar in the JSON
    # (VERDICT r3 next #5).  The headline `value` stays the FIRST round's
    # best-of-4 — comparable with every prior recorded round; the resample
    # is reported separately, never folded into `value` (ADVICE r3 medium).
    anchor_last = 0.0
    try:
        # only start the resample with enough margin for one worst-case
        # pass (~40 s in a catastrophically slow window) before the 550 s
        # driver timeout would eat the JSON line (ADVICE r3 low)
        if value > 0.0 and not _past_deadline(460.0):
            sat2, res2 = _timed_best_passes(
                al_sat, pairs_sat, 4, budget_s=500.0, t_start=t_proc0
            )
            if sat2 is not None:
                anchor_last = len(res2) / sat2
                print(
                    f"[bench] headline resample (anchor_last): "
                    f"{anchor_last:.0f} alignments/s (best_dt {sat2:.3f}s; "
                    f"anchor_first {value:.0f})",
                    file=sys.stderr,
                )
            else:
                print("[bench] headline resample skipped: budget spent", file=sys.stderr)
    except Exception as e:
        print(f"[bench] headline resample failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "hla_allpairs_600pair_alignments_per_s",
                "value": round(value, 2),
                "unit": "alignments/s",
                "vs_baseline": round(value / BASELINE_ALIGNMENTS_PER_S, 3),
                "anchor_first_alignments_per_s": round(value, 2),
                "anchor_last_alignments_per_s": round(anchor_last, 2),
                "latency_72pair_alignments_per_s": round(lat_value, 2),
                "saturated_gcells_per_s": round(sat_gcells, 2),
                "e2e_fasta_to_gfa_s": round(e2e, 2),
                "e2e_phases_s": e2e_phases,
                "sweepga_600pair_pairs_per_s": round(sweep_value, 2),
                "tree_sparsified_pairs_per_s": round(tree_value, 2),
                "tree_sparsified_pairs": tree_pairs_n,
                "tree_schedule_s": round(tree_sched_s, 2),
                "iterative_1k_pairs_per_s": round(iter_value, 2),
                **iter_info,
                # no Rust toolchain exists here to measure the 64-thread
                # reference pool; the 2,000/s divisor is an estimate
                # (VERDICT r4 #8)
                "baseline_estimated": True,
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
