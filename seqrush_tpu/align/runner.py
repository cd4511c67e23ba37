"""Batched alignment runner: orientation pre-check, length-bucketed batching,
chunk pipelining, and divergence filtering.

This is the TPU-native counterpart of the allwave all-pairs driver
(/root/reference/src/seqrush.rs:611-757 + the allwave crate): where the
reference fans pairs out to rayon threads each calling the WFA2 C kernel, we
pack pairs into padded, shape-quantized device batches and run them through
one of two exact kernels:

* kernel="nw" (default): banded anti-diagonal Gotoh sweep (ops/nw.py) —
  fixed trip count, single pass, divergence caps applied as a post-filter
  (the optimal score is always computed);
* kernel="wfa": score-adaptive wavefront (ops/wfa.py) with score-budget
  escalation (4x retries up to a guaranteed-completion bound); with
  --max-divergence, pairs exceeding the reference's cap are dropped like a
  non-completing WFA2 run.

Orientation per pair: a mash-style k-mer sketch fwd-vs-RC comparison decides
clear cases in one pass; ambiguous pairs get an exact banded edit-distance
probe with the '0,1,1,1' orientation scores (reference --orientation-scores,
seqrush.rs:48-50), smaller score wins, ties forward.

Chunks are double-buffered: the device computes chunk k+1 while the host
runs chunk k's traceback (C++).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..pos import encode_bases, reverse_complement_codes
from ..scores import AlignmentScores
from ..sequences import SequenceSet
from ..ops import wfa
from ..ops.wfa import Penalties


@dataclass
class AlignmentResult:
    query_idx: int
    target_idx: int
    is_reverse: bool
    score: int
    cigar: list[tuple[int, str]]  # standard ops =,X,I,D (query-consuming I)
    # local-alignment starts (0 for global backends; RC-space when is_reverse)
    query_start: int = 0
    target_start: int = 0

    @property
    def cigar_string(self) -> str:
        return "".join(f"{n}{op}" for n, op in self.cigar)


@dataclass
class RunnerConfig:
    scores: AlignmentScores = field(default_factory=AlignmentScores)
    orientation_scores: AlignmentScores = field(
        default_factory=lambda: AlignmentScores(0, 1, 1, 1, None, None)
    )
    max_divergence: float | None = None
    band_slack: int = 64  # minimum extra diagonals beyond the length difference
    initial_smax: int = 256
    # traceback-tensor budget per dispatch ([B, tmax, W] uint8 HBM scratch).
    # 2.6 GB lets a saturated ~650-job workload pack into ONE mega chunk:
    # measured 1,742 pairs/s vs 729 for the 1.5 GB two-chunk split in the
    # same window (docs/PROFILE_TPU_WARM.json) — every dispatch pays a
    # fixed host-link round trip and the sweep cost is flat-in-B until far
    # past these batch sizes.  Do NOT raise it toward HBM size to merge
    # band buckets: an 8 GB budget (one 640-row band-1535 chunk, 6.5 GB
    # traceback) OOMs on v5e-16GB via XLA temp copies (round 3, r3e)
    memory_budget_bytes: int = int(2.6e9)
    verbose: bool = False
    # alignment kernel: 'nw' = banded anti-diagonal Gotoh (shift-only,
    # TPU speed-of-light); 'wfa' = score-adaptive wavefront
    kernel: str = "nw"
    # kernel implementation: 'auto' (default) probes the runtime once — on a
    # direct TPU backend it try-compiles the pallas Gotoh kernel and uses it
    # when the probe passes; 'xla' forces the XLA sweep; 'pallas' forces the
    # hand-placed kernel.  The axon TPU tunnel's remote-compile helper
    # crashes on ANY pallas program (including trivial ones), so 'auto'
    # never probes through it (ops/unionfind.on_axon_tunnel — the plugin
    # registers as platform "tpu" in current builds, so the backend name
    # alone does not exclude the tunnel).
    kernel_impl: str = "auto"
    # optional jax.sharding.Mesh with a 'data' axis: alignment batches are
    # sharded on the batch dim across its devices (single-host multi-chip)
    mesh: object = None
    # cap pairs per chunk (0 = memory budget only); lets callers balance
    # chunk sizes onto one padded kernel shape
    max_chunk_pairs: int = 0
    # host-side worker threads for CIGAR decode/resolution (the reference's
    # -t rayon thread count analog for the host phase)
    threads: int = 4
    # pairs longer than this (qlen+tlen) stream through the segmented
    # kernel (bounded per-segment memory and program size) instead of the
    # single-shot sweep
    long_pair_threshold: int = 65536
    # walk tracebacks on device (reverse scan) and transfer only 2-bit
    # opcodes (~W times less host-link traffic than the packed byte tensor);
    # False fetches the byte tensor and walks on the host (C++/Python spec)
    device_traceback: bool = True
    # DP state dtype for the Gotoh sweep: 'int32' (always exact), 'int16'
    # (saturating; scores >= nw.INT16_CUTOFF auto-retry in int32 — halves
    # vector register pressure on TPU).  Measured on v5e: int32 is FASTER
    # in the latency-bound regime (int16's saturation clamps add ops to the
    # serial chain, docs/PROFILE_TPU_V3.json)
    dp_dtype: str = "int32"
    # forward sweep: 'antidiag' = anti-diagonal v3 (default), 'rows' =
    # row-major v4.  v4 halves the serial trip count but its within-row
    # gap recurrence needs a lane-axis cummin, which XLA lowers
    # pathologically on TPU (measured 10-40x slower per step than v3,
    # docs/PROFILE_TPU_V4.json) — it remains a tested option and the
    # better choice on backends with cheap associative scans.  Pairs whose
    # compacted gap list overflows nw.GAP_MAX retry on the anti-diagonal
    # kernel automatically.
    sweep: str = "antidiag"
    # bidirectional fold: run each pair as forward + backward batch rows
    # meeting at the middle anti-diagonal (ops/nw.py nw_align_fold) — half
    # the serial steps for 2x the batch rows.  Exact (same scores as the
    # single sweep; fold tests assert parity); the kernel band widens by
    # the chunk's max |qlen - tlen| so the certified-K region stays
    # covered.  **Negative result on XLA-TPU** (docs/PROFILE_TPU_FOLD.json,
    # same fate as the v4 row kernel): the per-row snapshot captures add
    # fused regions to the scan body, and with per-step cost dominated by
    # per-region sequencing overhead that costs MORE than halving the trip
    # count saves (b72: 378 vs 510 pairs/s; forced-fold 128-pair chunks:
    # 850 vs 1167).  Default off; 'auto' folds chunks whose padded batch
    # is <= fold_max_batch, True folds everything — the right shape for a
    # backend where the captures are free stores (Pallas, GPU).
    fold: bool | str = False
    fold_max_batch: int = 128
    # seed-frequency cutoff for the sweepga backend (FastGA's -f threshold,
    # forwarded by the reference's --frequency flag, seqrush.rs:795-802);
    # None = no cutoff.  Ignored by the allwave (exact all-pairs) backend,
    # which has no seeding stage.
    frequency: int | None = None
    # scan unroll factors for the fused kernels (forward sweep / reverse
    # walk).  Round-2 measured unroll effects as shape-unstable with the
    # dynamic-slice body; the streamed body is pure elementwise, where
    # deeper unroll amortizes per-region sequencing across rows.
    unroll: int = 4
    tb_unroll: int = 4
    # deeper unroll for SMALL chunks (padded B*(band+1) cell-rows at or
    # below small_chunk_cells): the mega chunk is HBM-carry-bound, where
    # deeper unroll measured WORSE (ROUND3_NOTES §1 ladder), but a small
    # chunk's per-step tile (e.g. the 64-row band-1535 inversion bucket:
    # 98k cells ≈ 2.4 MB carry) cannot hide the scan's per-step
    # sequencing floor, which deeper unroll amortizes.  0 = disabled
    # (use the flat unroll/tb_unroll above).
    unroll_small: int = 0
    tb_unroll_small: int = 0
    small_chunk_cells: int = 1 << 17
    # traceback emission on the fused device path: 'runs' fetches run-length
    # (op, len) tokens ([B, nw.RUN_MAX] int32, ~6x smaller than packed
    # opcodes over the slow host link) and decodes at run granularity;
    # 'ops' fetches 2-bit packed per-step opcodes; 'auto' uses runs whenever
    # the program fits the token format (tmax < ~32k; pairs whose walk
    # overflows RUN_MAX runs retry via opcodes automatically)
    emit: str = "auto"
    # band tiling: 'auto' merges a wide band bucket into its neighbouring
    # narrow chunk by giving each wide pair (band_wide+1)/(band+1)
    # consecutive batch rows coupled by per-step halo columns
    # (ops/nw.py nw_align_with_runs_tiled) — ONE serial program instead of
    # two.  Results are bit-identical either way (tests/test_tiled.py).
    # **Measured NEGATIVE on the tunnel TPU** (docs/PROFILE_TILED.json,
    # interleaved same-window: merged 0.62-0.97 s vs 0.39-0.60 s for the
    # two-dispatch shape on bench600) — the merged program's per-step body
    # costs more than the deleted dispatch saved; decomposition in
    # docs/PROFILE_TILED2.json attributes it.  Default 'off' until a
    # variant beats the split on hardware.
    band_tiling: str = "off"
    # cap on tiles per wide pair (wider jobs keep their own chunk)
    band_tiling_max_tiles: int = 4
    # wide-pair route: 'anchored' (default) aligns jobs whose band exceeds
    # wide_band_threshold piecewise — exact-match minimizer chain + exact
    # DP only on the inter-anchor windows (align/anchored.py) — instead of
    # brute-forcing a monster-band sweep (the band-1535 chunk was ~45% of
    # bench wall for 8% of pairs, docs/ROUND3_NOTES.md §1); 'full' keeps
    # the wide-band sweep.  Pairs with no usable chain always fall back to
    # the full route.  Stitched results are exact per window; global
    # optimality is DP-oracle-checked in tests (48/48 on the bench family)
    # and certified at runtime when wide_verify is on.
    wide_route: str = "anchored"
    wide_band_threshold: int = 767
    # anchored route only activates for long pairs (small pairs' full-band
    # programs are already cheap, and small inversion tests pin the direct
    # wide-band semantics)
    wide_min_len: int = 2048
    # above this many wide jobs in one round, moderately-wide jobs go back
    # to banded chunks instead of the anchored route: the piecewise path's
    # host work (chain + flanks + window DP + stitch) costs ~1.9 ms/pair
    # and scales per pair, while banded chunks amortize their serial steps
    # across batch rows — measured r5 on the tree-sparsified workload
    # (9.6k cross-family pairs: anchored host 18.3 s vs ~10-12 s of banded
    # device cells).  Very wide (> 2*wide_band_threshold+1) or long pairs
    # stay anchored at any count.  0 disables the cap.
    anchored_max_jobs: int = 256
    # verify every stitched score against a score-only banded sweep at the
    # certified band (no traceback/walk); mismatches fall back to the full
    # wide route, making anchored results certified-exact end to end
    wide_verify: bool = False
    # anchored-route / sweepga gap windows with at most this many DP cells
    # run on the HOST (threaded C++ full-matrix exact DP,
    # native.window_dp_native): tiny irregular windows cost a dispatch
    # round trip + a compile shape each on a (tunneled) TPU and
    # microseconds natively — and the host work fully overlaps the mega
    # chunk's device time.  Large windows (e.g. ~1.2M-cell inversion
    # cores) stay on the DEVICE: at ~2.2 ns/cell/core the bench host (4
    # cores) needs ~170 ms for 48 of them vs ~30 ms as one 2,304-step
    # device program.  Raise on many-core hosts.  0 disables host windows
    # entirely (also the no-toolchain fallback).
    wide_host_window_cells: int = 1 << 18
    # latency-scale bulk route: when the WHOLE anchored window workload
    # (including over-budget inversion cores) fits this many cells, every
    # window runs on the host.  NEGATIVE RESULT (r5, interleaved on-TPU
    # A/B): on this 4-core host the 72-pair workload's 16 inversion cores
    # cost ~50-70 ms of host DP vs ~20 ms riding the device queue
    # (0.085-0.190 s/pass ON vs 0.068-0.074 OFF) — the host DP does not
    # overlap enough and the thread pool oversubscribes.  Default 0
    # (disabled); the knob stays for many-core hosts.
    wide_host_total_cells: int = 0


class _TiledChunk(list):
    """A chunk whose wide-band entries run band-tiled (see RunnerConfig.
    band_tiling).  Entries look like plain chunk entries
    (p, rc, band, f32, q, t) — narrow ones carry base_band, wide ones
    wide_band; the dispatch expands each wide entry into n_tiles
    consecutive batch rows."""

    def __init__(self, entries, base_band: int, wide_band: int, n_tiles: int):
        super().__init__(entries)
        self.base_band = base_band
        self.wide_band = wide_band
        self.n_tiles = n_tiles


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _quantized_pack(qs, ts):
    """pack_batch with quantized shapes so jit recompiles stay bounded:
    sequence lengths round up to 256 multiples, batch size to a power of 2
    (dummy zero-length pairs complete at score 0 and cost nothing)."""
    B = _next_pow2(len(qs))
    empty = np.zeros(0, dtype=np.uint8)
    qs = list(qs) + [empty] * (B - len(qs))
    ts = list(ts) + [empty] * (B - len(ts))
    lq = _round_up(max((q.size for q in qs), default=1), 256)
    lt = _round_up(max((t.size for t in ts), default=1), 256)
    Q = np.stack([np.concatenate([q, np.full(lq + wfa.EXTEND_CHUNK - q.size, wfa.QPAD, np.uint8)]) for q in qs])
    T = np.stack([np.concatenate([t, np.full(lt + wfa.EXTEND_CHUNK - t.size, wfa.TPAD, np.uint8)]) for t in ts])
    qlens = np.array([q.size for q in qs], dtype=np.int32)
    tlens = np.array([t.size for t in ts], dtype=np.int32)
    return Q, T, qlens, tlens


class WfaAligner:
    """Aligns batches of sequence pairs on device."""

    def __init__(self, seqs: SequenceSet, config: RunnerConfig | None = None):
        self.seqs = seqs
        self.cfg = config or RunnerConfig()
        self.codes = [encode_bases(s.data) for s in seqs.sequences]
        self.rc_codes = [reverse_complement_codes(c).copy() for c in self.codes]
        self.stats = {
            "alignments": 0,
            "dropped": 0,
            "wall_s": 0.0,
            "escalations": 0,
            "band_escalations": 0,
            "int16_retries": 0,
            "cells_padded": 0,  # B_padded * rows * W summed over dispatches
            "cells_true": 0,  # (qlen+tlen+1) * W summed over aligned jobs
            "gap_overflows": 0,  # row-major walks overflowing nw.GAP_MAX
            "run_overflows": 0,  # runs-emission walks overflowing nw.RUN_MAX
            "band_sharded": 0,  # pairs routed through the lane-sharded kernel
            "long_pairs": 0,  # pairs routed through the segmented kernel
            "tiled_chunks": 0,  # band-tiled merged dispatches
            "tiled_rows": 0,  # extra batch rows spent on wide-pair tiles
            "anchored_pairs": 0,  # wide jobs aligned via the anchored route
            "anchored_windows": 0,  # divergence-core windows across those jobs
            "host_windows": 0,  # windows aligned by the host C++ DP
            "anchored_fallbacks": 0,  # wide jobs sent back to the full route
            "wide_verified": 0,  # stitched scores certified by score-only sweep
            # host-side phase timers (seconds; overlap-aware only in that
            # collect time includes the device wait for the oldest chunk)
            "orient_s": 0.0,
            "dispatch_s": 0.0,
            "collect_s": 0.0,
            "anchored_s": 0.0,
        }
        self._pallas_ok: bool | None = None
        # per-(sequence, orientation) minimizer cache for the anchored wide
        # route / sweepga backend (each sequence is indexed once, not once
        # per pair — the FastGA model)
        self.anchor_k = 15
        self.anchor_w = 10
        self._min_cache: dict[tuple[int, bool], tuple] = {}
        # (pair_idx, rc) jobs already routed through the anchored wide path
        # (a failed/suboptimal stitch must not loop back into it)
        self._anchored_tried: set[tuple[int, bool]] = set()
        # (pair_idx, rc) jobs forced onto the anti-diagonal kernel (their
        # row-major gap list overflowed nw.GAP_MAX)
        self._v3_set: set[tuple[int, bool]] = set()
        # (pair_idx, rc) jobs forced onto the opcode emission (their walk
        # produced more than nw.RUN_MAX runs)
        self._runs_off_set: set[tuple[int, bool]] = set()

    def _minimizers(self, idx: int, rc: bool):
        from ..ops import anchors as anchors_mod

        key = (idx, rc)
        if key not in self._min_cache:
            codes = self.rc_codes[idx] if rc else self.codes[idx]
            self._min_cache[key] = anchors_mod.minimizers(
                codes, self.anchor_k, self.anchor_w
            )
        return self._min_cache[key]

    def _minimizers_sorted(self, idx: int, rc: bool):
        """Value-sorted minimizer index (cached): the all-pairs anchor join
        sorts each TARGET index once, not once per pair."""
        from ..ops import anchors as anchors_mod

        key = (idx, rc, "sorted")
        if key not in self._min_cache:
            self._min_cache[key] = anchors_mod.sort_minimizers(
                self._minimizers(idx, rc)
            )
        return self._min_cache[key]

    # -- orientation ---------------------------------------------------------

    def _orient_and_estimate(
        self, pairs: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sketch-stage orientation calls plus per-pair divergence estimates.

        Returns (is_rev[P] bool, undecided[P] bool, d_est[P] float): sketch
        comparison decides orientation where the fwd/RC cosine margin is
        clear; undecided pairs are resolved by the caller (the nw path
        aligns both orientations in the main batch — no extra dispatch).
        d_est converts the winning cosine distance to an approximate
        per-base divergence (shared k-mer fraction ~ (1-d)^k), which sizes
        the initial alignment band.
        """
        P = len(pairs)
        is_rev = np.zeros(P, dtype=bool)
        undecided = np.zeros(P, dtype=bool)
        d_est = np.zeros(P, dtype=np.float64)
        if P == 0:
            return is_rev, undecided, d_est
        identical = np.zeros(P, dtype=bool)
        for p, (i, j) in enumerate(pairs):
            qi, tj = self.codes[i], self.codes[j]
            if qi.size == tj.size and (qi == tj).all():
                identical[p] = True
        MARGIN = 0.02  # on the mash per-base-divergence scale
        K_SKETCH = 15
        d_fwd, d_rc = self._sketch_orientation_distances(pairs)
        is_rev = (~identical) & (d_rc < d_fwd - MARGIN)
        undecided = (
            (~identical) & ~is_rev & ~(d_fwd < d_rc - MARGIN)
        )
        d_est = np.where(identical, 0.0, np.minimum(d_fwd, d_rc))
        # mixed-orientation content (e.g. an inverted block): BOTH
        # orientations share substantial k-mer content, and the chosen
        # orientation will pay near-mismatch cost over the opposite-strand
        # fraction f — invisible to unordered k-mer distance.  Estimate f
        # from the two orientations' shared-kmer proportions and fold an
        # empirical ~40%-of-random-mismatch block cost into d_est so the
        # initial band certifies in one pass (the certificate still
        # escalates if this underestimates).
        mixed = (~identical) & (d_fwd < 0.35) & (d_rc < 0.35)
        if mixed.any():
            s_f = np.exp(-K_SKETCH * d_fwd)
            s_r = np.exp(-K_SKETCH * d_rc)
            f_opp = np.where(
                is_rev, s_f, s_r
            ) / np.maximum(s_f + s_r, 1e-9)
            d_block = 0.45 * 0.75 * f_opp + np.minimum(d_fwd, d_rc)
            d_est = np.where(mixed, np.maximum(d_est, d_block), d_est)
        return is_rev, undecided, d_est

    def choose_orientations(self, pairs: np.ndarray) -> np.ndarray:
        """bool[P]: True where the query should be reverse-complemented.

        Two-stage: a mash-style k-mer sketch comparison (fwd and RC sketches)
        decides clear cases; ambiguous pairs fall back to an exact banded
        edit-distance probe with the reference's '0,1,1,1' orientation
        scores.  (The nw kernel path resolves ambiguity inside the main
        batch instead — see _align_pairs_nw.)
        """
        osc = self.cfg.orientation_scores
        out, undecided_mask, _ = self._orient_and_estimate(pairs)
        out = out.copy()
        undecided = [p for p in range(len(pairs)) if undecided_mask[p]]
        if not undecided:
            return out
        # stage 2: capped edit-distance probe, both orientations
        qs, ts = [], []
        for p in undecided:
            i, j = pairs[p]
            qs.append(self.codes[i])
            ts.append(self.codes[j])
            qs.append(self.rc_codes[i])
            ts.append(self.codes[j])
        pen = Penalties(osc.mismatch_penalty, osc.gap1_open, osc.gap1_extend)
        scores = self._score_batches(qs, ts, pen, score_only=True)
        fwd = scores[0::2]
        rev = scores[1::2]
        # unfinished probes (-1) rank worst
        fwd = np.where(fwd < 0, np.iinfo(np.int32).max, fwd)
        rev = np.where(rev < 0, np.iinfo(np.int32).max, rev)
        for k, p in enumerate(undecided):
            out[p] = rev[k] < fwd[k]
        return out

    def _sketch_orientation_distances(self, pairs: np.ndarray):
        """Mash distances (q fwd vs t, q RC vs t) for every pair — unbiased
        per-base divergence estimates (allwave's use_mash_orientation
        analog).  Bucketed count-vector cosine was retired here: its
        collision floor underestimated divergence ~5x at 3 kb, mis-sizing
        every initial band.  The same estimate sizes the alignment band."""
        from ..ops.kmer import mash_distance_batch, mash_sketches

        t0 = time.time()
        if not hasattr(self, "_mh_fwd"):
            self._mh_fwd = mash_sketches(self.codes)
            self._mh_rc = mash_sketches(self.rc_codes)
        n = len(self.codes)
        sketches = self._mh_fwd + self._mh_rc  # rc sketch of seq i at n + i
        pa = np.asarray(pairs)
        d_fwd = mash_distance_batch(sketches, pa[:, 0], pa[:, 1])
        d_rc = mash_distance_batch(sketches, pa[:, 0] + n, pa[:, 1])
        self.stats["orient_s"] += time.time() - t0
        return d_fwd, d_rc

    # -- full alignment ------------------------------------------------------

    def align_pairs(self, pairs: np.ndarray) -> list[AlignmentResult]:
        """Align all (query_idx, target_idx) pairs; returns completed results."""
        t0 = time.time()
        if len(pairs) == 0:
            return []
        sc = self.cfg.scores
        pen = Penalties(
            sc.mismatch_penalty,
            sc.gap1_open,
            sc.gap1_extend,
            sc.gap2_open if sc.has_two_piece else None,
            sc.gap2_extend if sc.has_two_piece else None,
        )

        if self.cfg.kernel == "nw":
            results = self._align_pairs_nw(pairs, pen)
            self.stats["alignments"] += len(results)
            self.stats["wall_s"] += time.time() - t0
            if self.cfg.verbose:
                print(
                    f"[runner] aligned {len(results)}/{len(pairs)} pairs in "
                    f"{self.stats['wall_s']:.2f}s ({self.stats['dropped']} dropped, "
                    f"{self.stats['band_escalations']} band escalations)"
                )
            return results

        is_rev = self.choose_orientations(pairs)
        results = self._align_pairs_wfa(pairs, is_rev, pen)

        self.stats["alignments"] += len(results)
        self.stats["wall_s"] += time.time() - t0
        if self.cfg.verbose:
            print(
                f"[runner] aligned {len(results)}/{len(pairs)} pairs in "
                f"{self.stats['wall_s']:.2f}s ({self.stats['dropped']} dropped)"
            )
        return results

    def align_pairs_oriented(self, pairs, is_rev) -> list[AlignmentResult]:
        """Align every pair in a FORCED orientation, skipping the mash/probe
        orientation stage — the reference's inversion-aware pipeline aligns
        every distinct pair BOTH fwd-fwd and fwd-rev unconditionally
        (/root/reference/src/inversion_aware_seqrush.rs:140-251); this is
        the primitive that mode builds on."""
        t0 = time.time()
        pairs = np.asarray(pairs)
        if len(pairs) == 0:
            return []
        sc = self.cfg.scores
        pen = Penalties(
            sc.mismatch_penalty,
            sc.gap1_open,
            sc.gap1_extend,
            sc.gap2_open if sc.has_two_piece else None,
            sc.gap2_extend if sc.has_two_piece else None,
        )
        forced = np.asarray(is_rev, dtype=bool)
        if self.cfg.kernel == "nw":
            results = self._align_pairs_nw(pairs, pen, forced_rev=forced)
        else:
            results = self._align_pairs_wfa(pairs, forced, pen)
        self.stats["alignments"] += len(results)
        self.stats["wall_s"] += time.time() - t0
        return results

    def _align_pairs_wfa(self, pairs, is_rev, pen) -> list[AlignmentResult]:
        results = []
        # order pairs by max length for bucketing
        maxlens = np.array(
            [max(self.codes[i].size, self.codes[j].size) for i, j in pairs]
        )
        order = np.argsort(maxlens, kind="stable")

        # initial score budget; escalate unfinished pairs
        pending = [(int(p), int(self.cfg.initial_smax)) for p in order]
        while pending:
            batch, rest = self._take_batch(pending, pairs)
            pending = rest
            batch_results, retries = self._run_full_batch(batch, pairs, is_rev, pen)
            results.extend(batch_results)
            if retries:
                self.stats["escalations"] += len(retries)
            pending.extend(retries)
        return results

    # -- banded anti-diagonal Gotoh path --------------------------------------
    #
    # Exactness contract (the reference aligner is exact end-to-end,
    # /root/reference/src/wfa.rs:49-75): a banded score S with half-width K
    # is certified globally optimal iff S < 2*o_min + e_min*(2K + 2 - |diff|)
    # — any path using a cell outside |i-j| <= K is forced through at least
    # 2K+2-|diff| indel bases in >= 2 gap runs, which costs at least that
    # bound.  Non-certified jobs re-run with the band sized from the
    # measured score (Ukkonen band doubling, but jumping straight to the
    # certified width).  Initial bands are sized per pair from the k-mer
    # sketch divergence estimate so most pairs certify on the first pass.

    def _gap_mins(self) -> tuple[int, int]:
        sc = self.cfg.scores
        if sc.has_two_piece:
            return min(sc.gap1_extend, sc.gap2_extend), min(sc.gap1_open, sc.gap2_open)
        return sc.gap1_extend, sc.gap1_open

    def _quantize_band(self, k: int, qlen: int, tlen: int) -> int:
        # lane width W = k+1 in multiples of 128 (VPU lane tiling); coarser
        # 256 quanta above 512 so near-identical wide bands share one chunk
        quantum = 128 if k < 512 else 256
        k = _round_up(k + 1, quantum) - 1
        return min(k, max(qlen, tlen) + 1)

    def _cert_bound(self, band: int, qlen: int, tlen: int) -> int:
        e_min, o_min = self._gap_mins()
        diff = abs(qlen - tlen)
        return 2 * o_min + e_min * max(2 * band + 2 - diff, 0)

    def _initial_band(self, qlen: int, tlen: int, d_est: float) -> int:
        sc = self.cfg.scores
        e_min, o_min = self._gap_mins()
        diff = abs(qlen - tlen)
        # estimated score: SNP cost + indel headroom; size K so the
        # certificate holds at that score with a little margin
        s_est = d_est * min(qlen, tlen) * max(sc.mismatch_penalty, 1) + 280
        k_cert = (s_est - 2 * o_min) / (2 * max(e_min, 1)) + diff / 2
        k = max(diff + self.cfg.band_slack, int(k_cert) + 1)
        return self._quantize_band(k, qlen, tlen)

    def _escalated_band(self, score: int, band: int, qlen: int, tlen: int) -> int:
        e_min, o_min = self._gap_mins()
        diff = abs(qlen - tlen)
        k = max(
            (score - 2 * o_min) // (2 * max(e_min, 1)) + diff // 2 + 2,
            band + 1,
        )
        return self._quantize_band(int(k), qlen, tlen)

    @staticmethod
    def _quantize_batch(n: int) -> int:
        """Smallest ladder value >= n: multiples of 8 up to 64 (tight
        padding where chunks are small), x1.5 geometric steps to 256
        (96, 144, 216, 256), then multiples of 64.  Above 256 the sweep is
        no longer flat in B (bandwidth-bound regime), so padding waste is
        real compute — 64-quanta cap it at <= 10% while keeping the
        compiled-shape count bounded."""
        if n <= 64:
            return max(((n + 7) // 8) * 8, 8)
        for b in (96, 144, 216, 256):
            if n <= b:
                return b
        return _round_up(n, 64)

    def _align_pairs_nw(self, pairs, pen, forced_rev=None) -> list[AlignmentResult]:
        # per-call loop control: a failed/suboptimal stitch must not
        # re-enter the anchored route within THIS call, but a fresh call
        # (e.g. the bench's steady-state passes) starts clean
        self._anchored_tried = set()
        if forced_rev is not None:
            # forced orientation: no probe stage; the sketch still sizes the
            # initial band, using the FORCED orientation's divergence
            d_fwd, d_rc = self._sketch_orientation_distances(pairs)
            is_rev = forced_rev
            undecided = np.zeros(len(pairs), dtype=bool)
            d_est = np.where(is_rev, d_rc, d_fwd)
        else:
            is_rev, undecided, d_est = self._orient_and_estimate(pairs)
        # jobs: (pair_idx, rc, band, force_int32).  Sketch-undecided pairs
        # enter the batch in BOTH orientations (the reference's orientation
        # probe as part of the main alignment — zero extra dispatches);
        # the better score wins, ties forward (seqrush.rs simple_align
        # policy: keep completed/better, default fwd).
        jobs: list[tuple[int, bool, int, bool]] = []
        for p, (qi, tj) in enumerate(pairs):
            qlen = self.codes[qi].size
            tlen = self.codes[tj].size
            band0 = self._initial_band(qlen, tlen, float(d_est[p]))
            if undecided[p]:
                # both orientations run as a PROBE at a modest band: the
                # orientation decision is relative (both banded equally),
                # so d_est-sized bands would waste work on the garbage
                # orientation; the winner escalates from its own score.
                diff = abs(qlen - tlen)
                band0 = min(band0, self._quantize_band(diff + 255, qlen, tlen))
                orients = (False, True)
                if self.cfg.mesh is not None and self._needs_band_shard(
                    (p, False, band0, True), pairs
                ):
                    # a pair too big even for the probe band must not race
                    # BOTH orientations through sharded full-band
                    # escalation (each step is a sharded dispatch + fresh
                    # compile); commit to the sketch's better orientation
                    if forced_rev is None:
                        d_fwd, d_rc = self._sketch_orientation_distances(
                            pairs[p : p + 1]
                        )
                        orients = (bool(d_rc[0] < d_fwd[0]),)
                    else:
                        orients = (bool(is_rev[p]),)
            else:
                orients = (bool(is_rev[p]),)
            for rc in orients:
                jobs.append((p, rc, band0, self.cfg.dp_dtype == "int32"))

        attempts: dict[tuple[int, bool], AlignmentResult | None] = {}
        queue = jobs
        while queue:
            # wide jobs divert to the anchored piecewise route FIRST: DP
            # only where the pair actually diverges, instead of a
            # monster-band serial program (align/anchored.py).  Checked
            # before band-sharding — a divergent pair whose wide traceback
            # would bust the budget is far cheaper piecewise than
            # lane-sharded; chainless fallbacks re-enter the queue and
            # band-shard on the next round.
            anchored_jobs: list = []
            if self.cfg.wide_route == "anchored":
                rest = []
                for job in queue:
                    if self._wants_anchored(job, pairs):
                        anchored_jobs.append(job)
                    else:
                        rest.append(job)
                queue = rest
                cap = self.cfg.anchored_max_jobs
                if cap and len(anchored_jobs) > cap:
                    # saturation regime (measured r5, tree workload: 9.6k
                    # moderately-wide cross-family pairs): banded chunks
                    # amortize their serial steps across rows while the
                    # piecewise route's host work scales per pair (~1.9
                    # ms each) — keep anchored only the jobs the banded
                    # path handles poorly (very wide bands, long pairs)
                    keep, back = [], []
                    for job in anchored_jobs:
                        p, rc, band, _f32 = job
                        qi, tj = pairs[p]
                        big = band > 2 * self.cfg.wide_band_threshold + 1 or (
                            self.codes[qi].size + self.codes[tj].size
                            > self.cfg.long_pair_threshold
                        )
                        (keep if big else back).append(job)
                    anchored_jobs = keep
                    queue.extend(back)
            if self.cfg.mesh is not None:
                # sequence parallelism: a pair whose traceback footprint
                # exceeds one chip's budget routes through the lane-sharded
                # kernel (parallel/bandshard.py) instead of capping out —
                # the capability the reference lacks (its sequences must fit
                # one thread's memory, /root/reference/README.md:225)
                local = []
                for job in queue:
                    if self._needs_band_shard(job, pairs):
                        key, res = self._align_job_bandsharded(job, pairs, pen)
                        attempts[key] = res
                    else:
                        local.append(job)
                queue = local
            chunks = self._make_nw_chunks(queue, pairs)
            chunks = self._plan_band_tiling(chunks)
            queue = []
            retries_scored = []  # (job, banded_score)
            a_fallbacks: list = []
            # pipeline: dispatch chunk k+1 (async device work) before the
            # host decode of chunk k
            inflight = None
            for chunk in chunks:
                t0 = time.time()
                dispatched = self._dispatch_nw_chunk(chunk, pen, pairs)
                self._start_fetch(dispatched)
                self.stats["dispatch_s"] += time.time() - t0
                if inflight is not None:
                    t0 = time.time()
                    done, retries = self._collect_nw_chunk(*inflight, pairs)
                    self.stats["collect_s"] += time.time() - t0
                    attempts.update(done)
                    retries_scored.extend(retries)
                inflight = dispatched
            a_state = None
            if anchored_jobs:
                # host chaining + window dispatches run while the (already
                # dispatched) narrow chunks compute; the window programs
                # queue behind them on the device
                t0 = time.time()
                a_state = self._align_anchored_start(anchored_jobs, pairs, pen)
                self.stats["anchored_s"] += time.time() - t0
            if inflight is not None:
                # mega-chunk host decode overlaps the window device time
                t0 = time.time()
                done, retries = self._collect_nw_chunk(*inflight, pairs)
                self.stats["collect_s"] += time.time() - t0
                attempts.update(done)
                retries_scored.extend(retries)
            if a_state is not None:
                t0 = time.time()
                a_done, a_fallbacks, a_retries = self._align_anchored_finish(
                    a_state, pairs, pen
                )
                self.stats["anchored_s"] += time.time() - t0
                attempts.update(a_done)
                retries_scored.extend(a_retries)
            queue = self._prune_orientation_losers(attempts, retries_scored)
            # chainless wide jobs re-enter the full route unpruned (a
            # missing chain says nothing about which orientation wins)
            queue.extend(a_fallbacks)

        results: list[AlignmentResult] = []
        for p in range(len(pairs)):
            best = None
            for rc in (False, True):
                res = attempts.get((p, rc))
                if res is not None and (best is None or res.score < best.score):
                    best = res
            if best is None:
                if (p, False) in attempts or (p, True) in attempts:
                    self.stats["dropped"] += 1  # exceeded divergence cap
            else:
                results.append(best)
        return results

    def _prune_orientation_losers(self, attempts, retries_scored):
        """Escalate only the better-scoring orientation of each pair.

        The reference decides orientation with a cheap heuristic and aligns
        ONE orientation exactly (allwave use_mash_orientation / the 0,1,1,1
        probe, seqrush.rs:48-50); racing both orientations through band
        escalation would spend near-full-matrix sweeps on garbage RC
        alignments.  Banded scores are upper bounds of the true scores, so
        choosing the smaller banded score IS the reference's probe — just a
        sharper one.  Ties keep forward."""
        best_known: dict[int, tuple[int, bool]] = {}
        for (p, rc), res in attempts.items():
            if res is not None:
                s = res.score
                cur = best_known.get(p)
                if cur is None or (s, rc) < cur:
                    best_known[p] = (s, rc)
        for (p, rc, _band, _f32), s in retries_scored:
            cur = best_known.get(p)
            if cur is None or (s, rc) < cur:
                best_known[p] = (s, rc)
        out = []
        for (p, rc, band, f32), s in retries_scored:
            cur = best_known.get(p)
            if cur is not None and (cur[0], cur[1]) < (s, rc):
                continue  # the other orientation already scores better
            out.append((p, rc, band, f32))
        return out

    def _wants_anchored(self, job, pairs) -> bool:
        """Route this job through the anchored piecewise path?  Wide band
        (the job would form/join a monster-band chunk), long enough that
        the full-length serial program actually hurts, default kernel
        stack, not tried before (failed stitches must not loop).  Pairs of
        ANY length qualify — windows are bounded by divergence, not pair
        length, so a 100 kb inversion carrier costs its divergence cores
        instead of a segmented monster-band program — except in verify
        mode, whose score-only certification sweep needs the single-shot
        program size."""
        p, rc, band, _f32 = job
        if (p, rc) in self._anchored_tried:
            return False
        qi, tj = pairs[p]
        qlen, tlen = self.codes[qi].size, self.codes[tj].size
        return (
            band > self.cfg.wide_band_threshold
            and max(qlen, tlen) >= self.cfg.wide_min_len
            and (
                not self.cfg.wide_verify
                or qlen + tlen <= self.cfg.long_pair_threshold
            )
            and self.cfg.device_traceback
            and self.cfg.sweep != "rows"
            and not self._use_pallas()
        )

    def _align_anchored_start(self, wide_jobs, pairs, pen):
        """Phase 1 of the anchored route: build plans (host chaining) and
        issue the window dispatches (async device work, queued behind the
        already-dispatched narrow chunks).  The mega chunk's host decode
        then overlaps the window programs' device time; _align_anchored_
        finish collects and stitches."""
        from . import anchored

        plans, fallbacks, window_jobs = [], [], []
        runs_per_job = anchored.chain_jobs(self, wide_jobs, pairs)
        flanks_per_job = anchored.flank_trim_jobs(
            self, wide_jobs, pairs, runs_per_job
        )
        for job, runs, flanks in zip(wide_jobs, runs_per_job, flanks_per_job):
            self._anchored_tried.add((job[0], job[1]))
            plan = anchored.build_plan(
                self, job, pairs, pen, window_jobs, runs=runs, flanks=flanks
            )
            if plan is None:
                self.stats["anchored_fallbacks"] += 1
                fallbacks.append(job)
            else:
                plans.append(plan)
        dispatched = anchored.dispatch_windows(self, window_jobs, pen)
        self.stats["anchored_windows"] += len(window_jobs)
        return plans, fallbacks, window_jobs, dispatched

    def _align_anchored_finish(self, state, pairs, pen):
        """Phase 2: collect windows, stitch, (optionally) verify.

        Returns (done, fallback_jobs, retries_scored): ``done`` maps
        (pair_idx, rc) to results (None = divergence-cap drop), fallbacks
        are chainless jobs for the full wide route, retries are
        verify-failed jobs re-queued at their certified band."""
        from . import anchored

        plans, fallbacks, window_jobs, dispatched = state
        witems = anchored.collect_windows(self, window_jobs, dispatched, pen)

        done: dict[tuple[int, bool], AlignmentResult | None] = {}
        retries_scored = []
        verify_entries = []  # (plan, items, stitched_score, band_v)
        e_min, o_min = self._gap_mins()
        for plan in plans:
            items, nq, nt = anchored.stitch(plan, witems)
            s = anchored.cigar_cost(items, pen)
            qlen, tlen = plan.q.size, plan.t.size
            if nq != qlen or nt != tlen:
                raise RuntimeError(
                    f"anchored stitch consumption mismatch: q {nq}/{qlen} "
                    f"t {nt}/{tlen} (pair {pairs[plan.p]}, rc={plan.rc})"
                )
            if self.cfg.wide_verify:
                diff = abs(qlen - tlen)
                k_v = max(
                    anchored.max_excursion(items),
                    (s - 2 * o_min) // (2 * max(e_min, 1)) + diff // 2 + 2,
                )
                band_v = self._quantize_band(int(k_v), qlen, tlen)
                verify_entries.append((plan, items, s, band_v))
                continue
            self._finish_anchored(plan, items, s, pairs, done)

        if verify_entries:
            scores_v = anchored.verify_scores(
                self,
                [(pl.q, pl.t, bv) for pl, _i, _s, bv in verify_entries],
                pen,
            )
            for (plan, items, s, band_v), s_v in zip(verify_entries, scores_v):
                s_v = int(s_v)
                if s_v > s:
                    raise RuntimeError(
                        f"verify sweep beat its own band: {s_v} > {s} "
                        f"(pair {pairs[plan.p]}, band {band_v})"
                    )
                if s_v == s:
                    # the stitched alignment achieves the certified-optimal
                    # score => it IS an optimal alignment
                    self.stats["wide_verified"] += 1
                    self._finish_anchored(plan, items, s, pairs, done)
                else:
                    # optimum is better than the stitch: re-run the full
                    # wide route at band_v (already certified for s_v)
                    retries_scored.append(
                        ((plan.p, plan.rc, band_v, plan.f32), s_v)
                    )
        return done, fallbacks, retries_scored

    def _finish_anchored(self, plan, items, score, pairs, done):
        self.stats["anchored_pairs"] += 1
        qi, tj = pairs[plan.p]
        if score > self._pair_cap(plan.q.size, plan.t.size):
            done[(plan.p, plan.rc)] = None  # exceeds the divergence cap
        else:
            done[(plan.p, plan.rc)] = AlignmentResult(
                int(qi), int(tj), plan.rc, score, items
            )

    def _needs_band_shard(self, job, pairs) -> bool:
        """True when this job ALONE would bust the per-dispatch traceback
        budget — the single-chip cap that _make_nw_chunks sizes chunks by
        (a lone over-budget job otherwise dispatches anyway and risks OOM).
        Only meaningful with a mesh: without one there is nowhere to shard."""
        p, _rc, band, _f32 = job
        qi, tj = pairs[p]
        qlen, tlen = self.codes[qi].size, self.codes[tj].size
        tmax = _round_up(qlen + tlen, 512)
        bytes_needed = self._quantize_batch(1) * (tmax + 2) * (band + 1)
        return bytes_needed > self.cfg.memory_budget_bytes

    def _align_job_bandsharded(self, job, pairs, pen):
        """Align one over-budget job with its band lane-sharded across the
        mesh (parallel/bandshard.py): per-device traceback memory drops to
        O(T·W/D).  Band certification and escalation run here (the sharded
        kernel is exact within its band, same contract as the local one);
        returns ((pair_idx, rc), result-or-None) like a collected chunk entry.
        """
        from ..parallel import bandshard
        from ..pos import decode_bases

        p, rc, band, _f32 = job
        qi, tj = pairs[p]
        q = self.rc_codes[qi] if rc else self.codes[qi]
        t = self.codes[tj]
        qlen, tlen = q.size, t.size
        full = max(qlen, tlen)
        mesh = self.cfg.mesh
        n = int(mesh.devices.size)
        qb, tb = decode_bases(q), decode_bases(t)
        while True:
            b = bandshard.band_for_mesh(min(band, full), n)
            score, items = bandshard.align_pair_sharded(
                mesh,
                qb,
                tb,
                mismatch=pen.mismatch,
                o1=pen.gap1_open,
                e1=pen.gap1_extend,
                o2=pen.gap2_open if pen.two_piece else -1,
                e2=pen.gap2_extend if pen.two_piece else -1,
                band=b,
            )
            if b >= full or score < self._cert_bound(b, qlen, tlen):
                break
            self.stats["band_escalations"] += 1
            band = self._escalated_band(score, b, qlen, tlen)
        self.stats["band_sharded"] += 1
        self.stats["cells_true"] += (qlen + tlen + 1) * (b + 1)
        if score > self._pair_cap(qlen, tlen):
            return (p, rc), None  # certified-exact score exceeds the cap
        return (p, rc), AlignmentResult(int(qi), int(tj), rc, score, items)

    def _make_nw_chunks(self, queue, pairs):
        """Pack jobs into as FEW dispatches as possible (measured: the
        sweep's per-step cost is flat in both B and W on TPU, and every
        dispatch pays a fixed host-link round trip) — jobs sort by
        (dtype, band, length) and chunks cut only at the traceback memory
        budget / max_chunk_pairs, with every job in a chunk sharing the
        chunk-max band (wider bands are always correct; the flat-in-W cost
        model makes them free until the memory budget binds)."""
        entries = []
        for p, rc, band, force32 in queue:
            qi, tj = pairs[p]
            q = self.rc_codes[qi] if rc else self.codes[qi]
            t = self.codes[tj]
            v3 = (p, rc) in self._v3_set
            roff = (p, rc) in self._runs_off_set
            entries.append((force32, v3, roff, band, q.size + t.size, p, rc, q, t))
        entries.sort(key=lambda e: (e[0], e[1], e[2], e[3], e[4]))

        chunks = []
        i = 0
        while i < len(entries):
            chunk = []
            band = 0
            while i < len(entries):
                f32, v3, roff, bandj, _ln, p, rc, q, t = entries[i]
                if chunk and (
                    f32 != chunk[0][3]
                    or v3 != ((chunk[0][0], chunk[0][1]) in self._v3_set)
                    or roff != ((chunk[0][0], chunk[0][1]) in self._runs_off_set)
                ):
                    break  # dtype / kernel impl / emission are static: no mixing
                trial_band = max(band, bandj)
                trial_tmax = _round_up(q.size + t.size, 512)
                B_pad = self._quantize_batch(len(chunk) + 1)
                bytes_needed = B_pad * (trial_tmax + 2) * (trial_band + 1)
                if chunk and bytes_needed > self.cfg.memory_budget_bytes:
                    break
                if self.cfg.max_chunk_pairs and len(chunk) >= self.cfg.max_chunk_pairs:
                    break
                chunk.append((p, rc, trial_band, f32, q, t))
                band = trial_band
                i += 1
            # every job in the chunk runs at the chunk band
            chunk = [(p, rc, band, f32, q, t) for (p, rc, _b, f32, q, t) in chunk]
            chunks.append(chunk)
        return chunks

    def _plan_band_tiling(self, chunks):
        """Merge wide-band chunks into their narrow neighbour as band tiles.

        _make_nw_chunks sorts entries by (dtype, impl, emission, band), so
        band buckets form consecutive chunks.  When a narrow chunk is
        followed by wide chunk(s) of the same static class, the wide pairs
        can ride the narrow chunk as n_tiles consecutive rows each —
        deleting a whole serial program from the dispatch sequence at the
        cost of (n_tiles-1) extra rows per wide pair (the scan is flat in
        B, ROUND3_NOTES §1).  Bit-identical results (tests/test_tiled.py).

        Merge conditions: single-chip resident path (no mesh/fold/rows/
        pallas/host-traceback), runs emission available, W even, n_tiles
        in [2, band_tiling_max_tiles], merged traceback under the memory
        budget, and tile rows not dominating the batch (stay in the
        flat-in-B regime)."""
        cfg = self.cfg
        if (
            cfg.band_tiling == "off"
            or len(chunks) < 2
            or cfg.mesh is not None
            or cfg.fold is not False
            or cfg.sweep == "rows"
            or not cfg.device_traceback
            or cfg.emit == "ops"
            or self._use_pallas()
        ):
            return chunks

        def klass(chunk):
            p, rc, _band, f32, _q, _t = chunk[0]
            return (
                f32,
                (p, rc) in self._v3_set,
                (p, rc) in self._runs_off_set,
            )

        out = []
        i = 0
        while i < len(chunks):
            base = chunks[i]
            W = base[0][2] + 1 if base else 0
            if (
                isinstance(base, _TiledChunk)
                or not base
                or W % 2
                or klass(base)[1]
                or klass(base)[2]
            ):
                out.append(base)
                i += 1
                continue
            narrow = list(base)
            wides: list = []  # wide entries, band rewritten to n_tiles*W-1
            n_tiles = 1
            j = i + 1
            while j < len(chunks):
                cand = chunks[j]
                if (
                    not cand
                    or isinstance(cand, _TiledChunk)
                    or klass(cand) != klass(base)
                    or cand[0][2] <= base[0][2]
                ):
                    break
                R = max(n_tiles, -(-(cand[0][2] + 1) // W))
                if R < 2 or R > cfg.band_tiling_max_tiles:
                    break
                trial_wides = wides + list(cand)
                n_narrow, n_wide = len(narrow), len(trial_wides)
                rows_total = n_narrow + R * n_wide
                tmax = _round_up(
                    max(q.size + t.size for *_, q, t in narrow + trial_wides),
                    512,
                )
                if (
                    tmax > cfg.long_pair_threshold
                    or tmax + 4 >= (1 << 15)
                    or self._quantize_batch(rows_total) * (tmax + 2) * W
                    > cfg.memory_budget_bytes
                    or (R - 1) * n_wide > n_narrow + n_wide
                ):
                    break  # tile rows would bust memory or dominate the batch
                wides = trial_wides
                n_tiles = R
                j += 1
            if n_tiles > 1:
                bandw = n_tiles * W - 1
                entries = narrow + [
                    (p, rc, bandw, f32, q, t) for (p, rc, _b, f32, q, t) in wides
                ]
                out.append(_TiledChunk(entries, W - 1, bandw, n_tiles))
                i = j
            else:
                out.append(base)
                i += 1
        return out

    # -- device-resident sequences -------------------------------------------

    def _ensure_resident(self):
        """Upload the sequence set once: queries (fwd + RC rows, QPAD) and
        targets (fwd rows, TPAD), plus base-REVERSED twins of each row for
        the bidirectional fold's backward halves.  Per-dispatch host->device
        traffic then shrinks to row indices + lengths (the tunnel's h2d link
        is slow: ~30 ms for a 96x3584 byte batch), and repeated align_pairs
        calls on one aligner re-upload nothing."""
        if getattr(self, "_resident", None) is not None:
            return self._resident
        import jax

        n = len(self.codes)
        lmax = _round_up(max(c.size for c in self.codes), 256)
        Rq = np.full((2 * n, lmax), wfa.QPAD, np.uint8)
        Rt = np.full((n, lmax), wfa.TPAD, np.uint8)
        Rqr = np.full((2 * n, lmax), wfa.QPAD, np.uint8)
        Rtr = np.full((n, lmax), wfa.TPAD, np.uint8)
        for k, c in enumerate(self.codes):
            Rq[k, : c.size] = c
            Rq[n + k, : self.rc_codes[k].size] = self.rc_codes[k]
            Rt[k, : c.size] = c
            Rqr[k, : c.size] = c[::-1]
            Rqr[n + k, : self.rc_codes[k].size] = self.rc_codes[k][::-1]
            Rtr[k, : c.size] = c[::-1]
        self._resident = (
            jax.device_put(Rq),
            jax.device_put(Rt),
            jax.device_put(Rqr),
            jax.device_put(Rtr),
            n,
            lmax,
        )
        return self._resident

    def _use_rows(self, chunk) -> bool:
        """Row-major v4 kernel for this chunk?  Chunks are homogeneous in
        forced-v3 membership (_make_nw_chunks segregates them)."""
        if self.cfg.sweep != "rows":
            return False
        p, rc = chunk[0][0], chunk[0][1]
        return (p, rc) not in self._v3_set

    def _use_runs(self, chunk, tmax: int) -> bool:
        """Run-length emission for this chunk?  Chunks are homogeneous in
        runs-overflow membership (_make_nw_chunks segregates them)."""
        from ..ops import nw

        if self.cfg.emit == "ops":
            return False
        if tmax + 4 >= 1 << 15:  # token position field (t_total <= tmax + 1)
            if self.cfg.emit == "runs":
                raise ValueError("emit='runs' requires tmax < 32k; use 'auto'")
            return False
        p, rc = chunk[0][0], chunk[0][1]
        return (p, rc) not in self._runs_off_set

    def _use_pallas(self) -> bool:
        if self._pallas_ok is not None:
            return self._pallas_ok
        mode = self.cfg.kernel_impl
        if mode == "pallas":
            self._pallas_ok = True
        elif mode == "auto":
            self._pallas_ok = self._probe_pallas()
        else:
            self._pallas_ok = False
        return self._pallas_ok

    def _probe_pallas(self) -> bool:
        """Try-compile the pallas kernel on a tiny shape (once per runner).

        Only attempted on a direct TPU backend: pallas cannot lower on CPU
        outside interpret mode, and the axon tunnel's remote compiler
        crashes on any pallas program (its backend name is 'axon')."""
        import jax

        try:
            from ..ops.unionfind import on_axon_tunnel

            # the axon plugin registers as platform "tpu" in current builds
            # — the backend-name gate alone no longer excludes the tunnel,
            # and a pallas program crashes its remote-compile helper
            if jax.default_backend() != "tpu" or on_axon_tunnel():
                return False
            from ..ops import nw_pallas

            Q = np.zeros((8, 32), np.uint8)
            T = np.zeros((8, 32), np.uint8)
            lens = np.full(8, 16, np.int32)
            scores, _ = nw_pallas.nw_align_pallas(
                Q, T, lens, lens, mismatch=5, o1=8, e1=2, o2=24, e2=1,
                band=15, tmax=32,
            )
            return int(np.asarray(scores)[0]) == 0
        except Exception:
            return False

    def _dispatch_nw_chunk_tiled(self, chunk: _TiledChunk, pen, pairs):
        """Dispatch a band-tiled merged chunk (RunnerConfig.band_tiling):
        narrow entries ride one row each, wide entries n_tiles consecutive
        rows, one fused program.  Returns the standard dispatched tuple
        with a 'runs_tiled' payload carrying the per-entry primary-row map
        (collect slices scores/tokens/counts through it and then proceeds
        exactly like a 'runs' chunk)."""
        import jax.numpy as jnp

        from ..ops import nw

        band = chunk.base_band
        W = band + 1
        R = chunk.n_tiles
        force32 = chunk[0][3]
        use_int16 = self.cfg.dp_dtype in ("int16", "auto") and not force32
        tmax = _round_up(max(q.size + t.size for *_, q, t in chunk), 512)

        rows = []  # (entry_idx, tile)
        rowmap = np.zeros(len(chunk), np.int32)
        for e, (p, rc, bandj, _f32, q, t) in enumerate(chunk):
            rowmap[e] = len(rows)
            ntile = R if bandj > band else 1
            rows.extend((e, r) for r in range(ntile))
        B = self._quantize_batch(len(rows))
        self.stats["tiled_chunks"] += 1
        self.stats["tiled_rows"] += len(rows) - len(chunk)
        self.stats["cells_padded"] += B * (tmax + 2) * W

        Rq, Rt, Rqr, Rtr, n, lmax = self._ensure_resident()
        q_idx = np.zeros(B, np.int32)
        t_idx = np.zeros(B, np.int32)
        qlens = np.zeros(B, np.int32)
        tlens = np.zeros(B, np.int32)
        o_off = np.zeros(B, np.int32)
        is_wide = np.zeros(B, bool)
        hl = np.zeros(B, bool)
        hr = np.zeros(B, bool)
        sibf = np.zeros((R - 1, B), bool)
        for b, (e, r) in enumerate(rows):
            p, rc, bandj, _f32, q, t = chunk[e]
            qi, tj = pairs[p]
            q_idx[b] = int(qi) + (n if rc else 0)
            t_idx[b] = int(tj)
            qlens[b] = q.size
            tlens[b] = t.size
            wide = bandj > band
            o_off[b] = r * W
            is_wide[b] = wide
            hl[b] = wide and r > 0
            hr[b] = wide and r < R - 1
            for k in range(1, R):
                if wide and r + k < R:
                    sibf[k - 1, b] = True
        Q = jnp.take(Rq, q_idx, axis=0)
        T = jnp.take(Rt, t_idx, axis=0)
        scores, tokens, counts = nw.nw_align_with_runs_tiled(
            Q, T, qlens, tlens, o_off, is_wide, hl, hr, jnp.asarray(sibf),
            mismatch=pen.mismatch,
            o1=pen.gap1_open,
            e1=pen.gap1_extend,
            o2=pen.gap2_open if pen.two_piece else -1,
            e2=pen.gap2_extend if pen.two_piece else -1,
            band=band, band_wide=chunk.wide_band, tmax=tmax, n_tiles=R,
            use_int16=use_int16, unroll=self.cfg.unroll,
            tb_unroll=self.cfg.tb_unroll, run_max=nw.RUN_MAX,
        )
        return (
            chunk, scores, ("runs_tiled", (tokens, counts, rowmap)),
            qlens[rowmap], tlens[rowmap], band, use_int16,
        )

    def _unroll_for(self, B: int, band: int) -> tuple[int, int]:
        """Per-chunk scan unroll factors (sweep, walk).  Small chunks —
        padded B*(band+1) cell-rows at or below small_chunk_cells — use the
        deeper unroll_small to amortize the scan's per-step sequencing
        floor; the mega chunk keeps the flat default (deeper unroll
        measured worse there, ROUND3_NOTES §1)."""
        if self.cfg.unroll_small and B * (band + 1) <= self.cfg.small_chunk_cells:
            return (
                self.cfg.unroll_small,
                self.cfg.tb_unroll_small or self.cfg.tb_unroll,
            )
        return self.cfg.unroll, self.cfg.tb_unroll

    def _dispatch_nw_chunk(self, chunk, pen, pairs):
        from ..ops import nw

        if isinstance(chunk, _TiledChunk):
            return self._dispatch_nw_chunk_tiled(chunk, pen, pairs)
        band = chunk[0][2]
        force32 = chunk[0][3]
        tmax = _round_up(max(q.size + t.size for *_, q, t in chunk), 512)
        B = self._quantize_batch(len(chunk))
        u_sweep, u_walk = self._unroll_for(B, band)
        use_int16 = self.cfg.dp_dtype in ("int16", "auto") and not force32
        kw = dict(
            mismatch=pen.mismatch,
            o1=pen.gap1_open,
            e1=pen.gap1_extend,
            o2=pen.gap2_open if pen.two_piece else -1,
            e2=pen.gap2_extend if pen.two_piece else -1,
            band=band,
            tmax=tmax,
        )

        needs_host_arrays = (
            self.cfg.mesh is not None
            or kw["tmax"] > self.cfg.long_pair_threshold
            or not self.cfg.device_traceback
            or self._use_pallas()
        )
        fold_cfg = self.cfg.fold
        fold_on = (
            fold_cfg is True
            or (fold_cfg == "auto" and B <= self.cfg.fold_max_batch)
        )
        use_fold = fold_on and not needs_host_arrays and not self._use_rows(chunk)
        if not use_fold:
            self.stats["cells_padded"] += B * (tmax + 2) * (band + 1)
        if not needs_host_arrays:
            # hot path: gather query/target rows from the device-resident
            # sequence arrays — per-dispatch h2d is just indices + lengths
            import jax.numpy as jnp

            Rq, Rt, Rqr, Rtr, n, lmax = self._ensure_resident()
            q_idx = np.zeros(B, np.int32)
            t_idx = np.zeros(B, np.int32)
            qlens = np.zeros(B, np.int32)
            tlens = np.zeros(B, np.int32)
            for b, (p, rc, *_rest, q, t) in enumerate(chunk):
                qi, tj = pairs[p]
                q_idx[b] = int(qi) + (n if rc else 0)
                t_idx[b] = int(tj)
                qlens[b] = q.size
                tlens[b] = t.size
            Q = jnp.take(Rq, q_idx, axis=0)
            T = jnp.take(Rt, t_idx, axis=0)
            if self._use_rows(chunk):
                kwr = {k: v for k, v in kw.items() if k != "tmax"}
                out = nw.nw_align_rows(
                    Q, T, qlens, tlens, use_int16=use_int16, **kwr
                )
                return (
                    chunk, out[0], ("rowtok", out[1:]),
                    qlens, tlens, band, use_int16,
                )
            if use_fold:
                # bidirectional fold: backward halves read the resident
                # reversed rows; the kernel band widens by the chunk's max
                # length difference (fold region must cover the certified-K
                # band — see ops/nw.py) and the trip count halves
                maxdiff = max(abs(q.size - t.size) for *_, q, t in chunk)
                maxlen = max(max(q.size, t.size) for *_, q, t in chunk)
                band_eff = self._quantize_band(band + maxdiff, maxlen, maxlen)
                tmax_half = _round_up(tmax // 2 + 2, 256)
                Qr = jnp.take(Rqr, q_idx, axis=0)
                Tr = jnp.take(Rtr, t_idx, axis=0)
                kwf = {k: v for k, v in kw.items() if k not in ("band", "tmax")}
                scores, packed2, cross_m = nw.nw_align_fold(
                    Q, T, Qr, Tr, qlens, tlens, use_int16=use_int16,
                    band=band_eff, tmax_half=tmax_half, **kwf,
                )
                self.stats["cells_padded"] += (
                    2 * B * (tmax_half + 2) * (band_eff + 1)
                )
                return (
                    chunk, scores, ("fold", (packed2, cross_m)),
                    qlens, tlens, band_eff, use_int16,
                )
            if self._use_runs(chunk, tmax):
                # unroll stays at the kernel default (4): deeper unroll won
                # on one raw B=512 point (docs/PROFILE_TPU_RUNS.json) but
                # regressed the real chunk shapes 2x (docs/
                # PROFILE_TPU_WARM.json b600_default) — unroll effects are
                # shape-dependent and unstable on this backend
                scores, tokens, counts = nw.nw_align_with_runs(
                    Q, T, qlens, tlens, use_int16=use_int16,
                    run_max=nw.RUN_MAX, unroll=u_sweep,
                    tb_unroll=u_walk, **kw
                )
                return (
                    chunk, scores, ("runs", (tokens, counts)),
                    qlens, tlens, band, use_int16,
                )
            scores, opcodes = nw.nw_align_with_opcodes(
                Q, T, qlens, tlens, use_int16=use_int16,
                unroll=u_sweep, tb_unroll=u_walk, **kw
            )
            return chunk, scores, ("ops", opcodes), qlens, tlens, band, use_int16

        lq = _round_up(max(q.size for *_, q, _t in chunk), 256)
        lt = _round_up(max(t.size for *_, t in chunk), 256)
        Q = np.full((B, lq), wfa.QPAD, dtype=np.uint8)
        T = np.full((B, lt), wfa.TPAD, dtype=np.uint8)
        qlens = np.zeros(B, np.int32)
        tlens = np.zeros(B, np.int32)
        for b, (*_, q, t) in enumerate(chunk):
            Q[b, : q.size] = q
            T[b, : t.size] = t
            qlens[b] = q.size
            tlens[b] = t.size
        if self.cfg.mesh is not None:
            # shard the batch dim over the mesh; the kernel is elementwise
            # over pairs so XLA partitions it with zero communication
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            n = self.cfg.mesh.devices.size
            if B % n:
                pad = ((B + n - 1) // n) * n - B
                Q = np.concatenate([Q, np.full((pad, Q.shape[1]), wfa.QPAD, np.uint8)])
                T = np.concatenate([T, np.full((pad, T.shape[1]), wfa.TPAD, np.uint8)])
                qlens = np.concatenate([qlens, np.zeros(pad, np.int32)])
                tlens = np.concatenate([tlens, np.zeros(pad, np.int32)])
            sh = NamedSharding(self.cfg.mesh, P("data"))
            Q, T, qlens, tlens = (jax.device_put(a, sh) for a in (Q, T, qlens, tlens))
            if self._use_rows(chunk):
                kwr = {k: v for k, v in kw.items() if k != "tmax"}
                out = nw.nw_align_rows(
                    Q, T, qlens, tlens, use_int16=use_int16, **kwr
                )
                return (
                    chunk, out[0], ("rowtok", out[1:]),
                    np.asarray(qlens), np.asarray(tlens), band, use_int16,
                )
            if self._use_runs(chunk, tmax):
                # the kernel is elementwise over pairs (top_k runs along the
                # token axis), so the sharded batch needs no communication —
                # and each chip's fetch shrinks the same ~6x as single-chip
                scores, tokens, counts = nw.nw_align_with_runs(
                    Q, T, qlens, tlens, use_int16=use_int16,
                    run_max=nw.RUN_MAX, unroll=u_sweep,
                    tb_unroll=u_walk, **kw
                )
                return (
                    chunk, scores, ("runs", (tokens, counts)),
                    np.asarray(qlens), np.asarray(tlens), band, use_int16,
                )
            scores, opcodes = nw.nw_align_with_opcodes(
                Q, T, qlens, tlens, use_int16=use_int16,
                unroll=u_sweep, tb_unroll=u_walk, **kw
            )
            return (
                chunk, scores, ("ops", opcodes),
                np.asarray(qlens), np.asarray(tlens), band, use_int16,
            )
        if self._use_pallas():
            try:
                from ..ops import nw_pallas

                scores, tb = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, **kw)
                try:
                    # hand-placed walk kernel: one program per 8 pairs
                    # instead of a per-step-sequenced XLA scan (the walk is
                    # ~55% of the fused kernel's wall)
                    ops = nw_pallas.nw_walk_pallas(
                        tb, qlens, tlens, band=band, tmax=tmax
                    )
                    return (
                        chunk, scores, ("ops_unpacked", ops),
                        qlens, tlens, band, False,
                    )
                except Exception:
                    opcodes = nw.traceback_scan_device(
                        tb, qlens, tlens, band=band, tmax=tmax
                    )
                    return chunk, scores, ("ops", opcodes), qlens, tlens, band, False
            except Exception:
                self._pallas_ok = False  # lowering failed: stick to XLA
        if kw["tmax"] > self.cfg.long_pair_threshold:
            # long pairs: segmented sweep with carried state (bounded memory
            # and compile size regardless of sequence length)
            from ..ops.wfa import Penalties as _P

            lp = _P(
                kw["mismatch"], kw["o1"], kw["e1"],
                kw["o2"] if kw["o2"] >= 0 else None,
                kw["e2"] if kw["e2"] >= 0 else None,
            )
            scores, items_list = nw.nw_align_long(Q, T, qlens, tlens, lp, band=band)
            self.stats["long_pairs"] += len(chunk)
            return chunk, scores, ("items", items_list), qlens, tlens, band, False
        if self.cfg.device_traceback:
            # fused sweep + walk: single dispatch, opcodes-only transfer
            if self._use_rows(chunk):
                kwr = {k: v for k, v in kw.items() if k != "tmax"}
                out = nw.nw_align_rows(
                    Q, T, qlens, tlens, use_int16=use_int16, **kwr
                )
                return (
                    chunk, out[0], ("rowtok", out[1:]),
                    qlens, tlens, band, use_int16,
                )
            scores, opcodes = nw.nw_align_with_opcodes(
                Q, T, qlens, tlens, use_int16=use_int16,
                unroll=u_sweep, tb_unroll=u_walk, **kw
            )
            return chunk, scores, ("ops", opcodes), qlens, tlens, band, use_int16
        scores, tb = nw.nw_align_device(Q, T, qlens, tlens, with_traceback=True, **kw)
        return chunk, scores, ("tb", tb), qlens, tlens, band, False

    @staticmethod
    def _start_fetch(dispatched):
        """Begin async device->host copies of a dispatched chunk's outputs
        so the transfer overlaps the NEXT chunk's device compute (and the
        host decode of the previous one) instead of serializing inside
        collect's np.asarray."""
        _chunk, scores, (_mode, data), *_rest = dispatched
        arrays = [scores]
        for a in data if isinstance(data, tuple) else (data,):
            arrays.append(a)
        for a in arrays:
            fn = getattr(a, "copy_to_host_async", None)
            if fn is not None:
                try:
                    fn()
                except Exception:
                    pass

    def _collect_nw_chunk(
        self, chunk, scores, payload, qlens, tlens, band, used_int16, pairs
    ):
        """Returns (done: {(pair_idx, rc): result-or-None}, retries: jobs).

        A job is retried (not returned) when its score saturated the int16
        DP or when the band certificate fails; a None result means the pair
        exceeded the divergence cap with a certified-exact score (the
        reference's non-completing-WFA drop)."""
        from ..ops import nw

        scores = np.asarray(scores)
        mode, data = payload
        if mode == "runs_tiled":
            # band-tiled chunk: slice every per-row output down to each
            # entry's primary (first-tile) row, then proceed as 'runs'
            tokens, counts, rowmap = data
            scores = scores[rowmap]
            data = (np.asarray(tokens)[rowmap], np.asarray(counts)[rowmap])
            mode = "runs"
        elif mode == "fold":
            # two packed half-walk streams per pair: unpack, merge
            # fwd ++ [M crossing op] ++ reversed(bwd), then decode as 'ops'
            packed2, cross_m = data
            packed2 = np.asarray(packed2)
            ops2 = nw.unpack_opcodes(packed2, packed2.shape[1] * 4)
            data = nw.merge_fold_ops(ops2, np.asarray(cross_m))
            mode = "ops"
        elif mode == "rowtok":
            steps_p, grows, gvals, gcount = (np.asarray(a) for a in data)
            steps = nw.unpack_opcodes(steps_p, steps_p.shape[1] * 4)
            data = (steps, grows, gvals, gcount)
        elif mode == "runs":
            data = tuple(np.asarray(a) for a in data)  # (tokens, counts)
        elif mode == "ops_unpacked":
            # pallas walk output: per-step opcodes, already unpacked
            data = np.asarray(data)
            mode = "ops"
        elif mode != "items":
            data = np.asarray(data)
            if mode == "ops":
                # 2-bit-packed opcode rows: unpack the whole batch vectorized
                data = nw.unpack_opcodes(data, data.shape[1] * 4)

        done: dict[tuple[int, bool], AlignmentResult | None] = {}
        retries: list[tuple[tuple[int, bool, int, bool], int]] = []
        decode_jobs = []
        for b, (p, rc, bandj, force32, q, t) in enumerate(chunk):
            qlen, tlen = int(qlens[b]), int(tlens[b])
            score = int(scores[b])
            if used_int16 and score >= nw.INT16_CUTOFF:
                self.stats["int16_retries"] += 1
                retries.append(((p, rc, bandj, True), score))
                continue
            exact = bandj >= max(qlen, tlen) or (
                0 <= score < self._cert_bound(bandj, qlen, tlen)
            )
            if not exact:
                self.stats["band_escalations"] += 1
                retries.append(
                    (
                        (p, rc, self._escalated_band(max(score, 0), bandj, qlen, tlen), force32),
                        score if score >= 0 else np.iinfo(np.int32).max,
                    )
                )
                continue
            if score < 0 or score > self._pair_cap(qlen, tlen):
                done[(p, rc)] = None  # certified-exact score exceeds the cap
                continue
            if mode == "rowtok" and int(data[3][b]) > nw.GAP_MAX:
                # compacted gap list overflowed: retry on the anti-diagonal
                # kernel (same band — the score is already certified)
                self.stats["gap_overflows"] += 1
                self._v3_set.add((p, rc))
                retries.append(((p, rc, bandj, force32), score))
                continue
            if mode == "runs" and int(data[1][b]) > nw.RUN_MAX:
                # run list truncated on device: retry via opcode emission
                # (same band — the score is already certified)
                self.stats["run_overflows"] += 1
                self._runs_off_set.add((p, rc))
                retries.append(((p, rc, bandj, force32), score))
                continue
            self.stats["cells_true"] += (qlen + tlen + 1) * (bandj + 1)
            decode_jobs.append((b, p, rc, q, t, score))

        if mode == "runs" and decode_jobs:
            rows = [b for b, *_ in decode_jobs]
            items_all = nw.decode_runs_batch(
                data[0][rows],
                data[1][rows],
                [q for _b, _p, _rc, q, _t, _s in decode_jobs],
                [t for _b, _p, _rc, _q, t, _s in decode_jobs],
            )
            for (b, p, rc, q, t, score), items in zip(decode_jobs, items_all):
                qi, tj = pairs[p]
                done[(p, rc)] = AlignmentResult(int(qi), int(tj), rc, score, items)
            return done, retries

        if mode == "ops" and decode_jobs:
            # hot path: one vectorized decode over the whole chunk (cursor
            # cumsums + one gather + one RLE) instead of per-pair walks
            rows = [b for b, *_ in decode_jobs]
            items_all = nw.decode_batch(
                data[rows],
                [q for _b, _p, _rc, q, _t, _s in decode_jobs],
                [t for _b, _p, _rc, _q, t, _s in decode_jobs],
            )
            for (b, p, rc, q, t, score), items in zip(decode_jobs, items_all):
                qi, tj = pairs[p]
                done[(p, rc)] = AlignmentResult(int(qi), int(tj), rc, score, items)
            return done, retries

        def decode(args):
            b, p, rc, q, t, score = args
            qi, tj = pairs[p]
            if mode == "items":
                items = data[b]
            elif mode == "rowtok":
                steps, grows, gvals, gcount = data
                items = nw.decode_rowtokens(
                    steps[b], grows[b], gvals[b], int(gcount[b]), int(qlens[b])
                )
            else:
                items = nw.traceback_pair(
                    data[b], int(qlens[b]), int(tlens[b]), band
                )
            items = nw.resolve_matches(items, q, t)
            return (p, rc), AlignmentResult(int(qi), int(tj), rc, score, items)

        if self.cfg.threads > 1 and len(decode_jobs) > 3:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.cfg.threads) as ex:
                decoded = list(ex.map(decode, decode_jobs))
        else:
            decoded = [decode(j) for j in decode_jobs]
        done.update(dict(decoded))
        return done, retries

    # -- internals -----------------------------------------------------------

    def _pair_cap(self, qlen: int, tlen: int) -> int:
        sc = self.cfg.scores
        hard = sc.mismatch_penalty * max(qlen, tlen) + sc.gap1_open + sc.gap1_extend * (
            qlen + tlen
        )
        if self.cfg.max_divergence is not None:
            return min(hard, sc.max_score_for_divergence(max(qlen, tlen), self.cfg.max_divergence))
        return hard

    def _take_batch(self, pending, pairs):
        """Slice off a prefix of (pair_idx, smax) jobs fitting the memory budget
        with a shared smax and band."""
        first_smax = pending[0][1]
        same = [job for job in pending if job[1] == first_smax]
        other = [job for job in pending if job[1] != first_smax]
        # estimate shapes from the longest pair in the prospective batch
        batch = []
        for job in same:
            p = job[0]
            i, j = pairs[p]
            qlen, tlen = self.codes[i].size, self.codes[j].size
            band = self._band_for(qlen, tlen)
            trial = batch + [job]
            max_band = max(self._band_for(self.codes[pairs[b[0]][0]].size, self.codes[pairs[b[0]][1]].size) for b in trial)
            max_lt = max(self.codes[pairs[b[0]][1]].size for b in trial)
            ndiag = 2 * max_band + 1
            hist_bytes = len(trial) * 5 * (first_smax + 1) * ndiag * 2
            # ext table: int16 [B, NDIAG, Lt] plus ~2x transient during build
            ext_bytes = len(trial) * ndiag * (max_lt + 256) * 2 * 3
            bytes_needed = hist_bytes + ext_bytes
            if batch and bytes_needed > self.cfg.memory_budget_bytes:
                other.append(job)
            else:
                batch.append(job)
        return batch, other

    def _band_for(self, qlen: int, tlen: int) -> int:
        # band half-width K; W = K+1 lanes — keep W a multiple of 128 so the
        # per-step [B, W] rows tile the VPU lanes exactly
        diff = abs(tlen - qlen)
        k = _round_up(diff + self.cfg.band_slack + 1, 128) - 1
        return min(k, max(qlen, tlen) + 1)

    def _run_full_batch(self, batch, pairs, is_rev, pen):
        if not batch:
            return [], []
        smax = batch[0][1]
        qs, ts, caps, bands = [], [], [], []
        for p, _ in batch:
            i, j = pairs[p]
            q = self.rc_codes[i] if is_rev[p] else self.codes[i]
            t = self.codes[j]
            qs.append(q)
            ts.append(t)
            caps.append(self._pair_cap(q.size, t.size))
            bands.append(self._band_for(q.size, t.size))
        band = max(bands)
        Q, T, qlens, tlens = _quantized_pack(qs, ts)
        caps = caps + [0] * (len(qlens) - len(caps))
        smax_eff = min(smax, max(caps))
        scores, hists = wfa.wfa_align_device(
            Q,
            T,
            qlens,
            tlens,
            np.minimum(np.array(caps, dtype=np.int32), smax_eff),
            mismatch=pen.mismatch,
            o1=pen.gap1_open,
            e1=pen.gap1_extend,
            o2=pen.gap2_open if pen.two_piece else -1,
            e2=pen.gap2_extend if pen.two_piece else -1,
            smax=smax_eff,
            band=band,
            keep_history=True,
        )
        scores = np.asarray(scores)[: len(batch)]
        hists = {k: np.asarray(v) for k, v in hists.items()}

        results, retries = [], []
        for b, (p, _) in enumerate(batch):
            i, j = pairs[p]
            if scores[b] < 0:
                if smax_eff < caps[b]:
                    retries.append((p, min(smax * 4, caps[b] + 1)))
                else:
                    self.stats["dropped"] += 1  # exceeded divergence cap
                continue
            items = wfa.backtrace_pair(
                {k: v[b] for k, v in hists.items()},
                int(scores[b]),
                int(qlens[b]),
                int(tlens[b]),
                band,
                pen,
            )
            results.append(
                AlignmentResult(int(i), int(j), bool(is_rev[p]), int(scores[b]), items)
            )
        return results, retries

    def _score_batches(self, qs, ts, pen, score_only=True) -> np.ndarray:
        """Score-only batched edit-distance alignment for the orientation
        pre-check.  Uses the banded Gotoh kernel (nw): fixed trip count and
        the same program class as the main aligner (the score-adaptive WFA
        probe is avoided — its while-loop programs crash the axon tunnel's
        remote compiler)."""
        from ..ops import nw

        out = np.full(len(qs), -1, dtype=np.int64)
        idx = np.argsort([max(q.size, t.size) for q, t in zip(qs, ts)], kind="stable")
        CHUNK = 64
        for lo in range(0, len(idx), CHUNK):
            sel = idx[lo : lo + CHUNK]
            bq = [qs[k] for k in sel]
            bt = [ts[k] for k in sel]
            B = max(_next_pow2(len(sel)), 8)
            lq = _round_up(max(q.size for q in bq), 256)
            lt = _round_up(max(t.size for t in bt), 256)
            Q = np.full((B, lq), wfa.QPAD, np.uint8)
            T = np.full((B, lt), wfa.TPAD, np.uint8)
            qlens = np.zeros(B, np.int32)
            tlens = np.zeros(B, np.int32)
            for b, (q, t) in enumerate(zip(bq, bt)):
                Q[b, : q.size] = q
                T[b, : t.size] = t
                qlens[b] = q.size
                tlens[b] = t.size
            # a narrow band suffices for the fwd-vs-rc comparison (both
            # orientations are banded identically; only the order matters)
            diff = max(abs(int(q.size) - int(t.size)) for q, t in zip(bq, bt))
            band = max(127, _round_up(diff + 2, 128) - 1)
            tmax = _round_up(int((qlens + tlens).max()) + 1, 512)
            scores, _ = nw.nw_align_device(
                Q,
                T,
                qlens,
                tlens,
                mismatch=pen.mismatch,
                o1=pen.gap1_open,
                e1=pen.gap1_extend,
                o2=-1,
                e2=-1,
                band=band,
                tmax=tmax,
                with_traceback=False,
            )
            out[sel] = np.asarray(scores)[: len(sel)]
        return out
