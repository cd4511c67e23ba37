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
    band_slack: int = 128  # extra diagonals beyond the length difference
    initial_smax: int = 256
    memory_budget_bytes: int = int(1.5e9)
    verbose: bool = False
    # alignment kernel: 'nw' = banded anti-diagonal Gotoh (shift-only,
    # TPU speed-of-light); 'wfa' = score-adaptive wavefront
    kernel: str = "nw"
    # kernel implementation: 'xla' (default) or 'pallas'.  The pallas Gotoh
    # kernel is validated bit-identical in interpret mode, but the axon
    # TPU tunnel's remote-compile helper crashes on ANY pallas program
    # (including trivial ones), so it must be opted into explicitly on
    # environments with a direct TPU runtime.
    kernel_impl: str = "xla"
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
        self.stats = {"alignments": 0, "dropped": 0, "wall_s": 0.0, "escalations": 0}
        self._pallas_ok: bool | None = None

    # -- orientation ---------------------------------------------------------

    def choose_orientations(self, pairs: np.ndarray) -> np.ndarray:
        """bool[P]: True where the query should be reverse-complemented.

        Two-stage: a mash-style k-mer sketch comparison (fwd and RC sketches)
        decides clear cases; ambiguous pairs fall back to an exact banded
        edit-distance probe with the reference's '0,1,1,1' orientation
        scores.
        """
        osc = self.cfg.orientation_scores
        P = len(pairs)
        out = np.zeros(P, dtype=bool)
        if P == 0:
            return out
        # stage 0: identical sequences are forward
        maybe = []
        for p, (i, j) in enumerate(pairs):
            qi, tj = self.codes[i], self.codes[j]
            if qi.size == tj.size and (qi == tj).all():
                continue
            maybe.append(p)
        if not maybe:
            return out
        # stage 1: k-mer sketch orientation (fwd vs RC cosine distance)
        MARGIN = 0.05
        d_fwd, d_rc = self._sketch_orientation_distances(pairs)
        undecided = []
        for p in maybe:
            if d_rc[p] < d_fwd[p] - MARGIN:
                out[p] = True
            elif d_fwd[p] < d_rc[p] - MARGIN:
                out[p] = False
            else:
                undecided.append(p)
        if not undecided:
            return out
        # stage 2: capped edit-distance wavefront probe, both orientations
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
        """Cosine sketch distances (q fwd vs t, q RC vs t) for every pair."""
        from ..ops.kmer import kmer_sketches

        if not hasattr(self, "_sk_fwd"):
            k = 15
            self._sk_fwd = kmer_sketches(self.codes, k)
            self._sk_rc = kmer_sketches(self.rc_codes, k)
        qf = self._sk_fwd[pairs[:, 0]]
        qr = self._sk_rc[pairs[:, 0]]
        t = self._sk_fwd[pairs[:, 1]]
        d_fwd_sel = 1.0 - np.einsum("pd,pd->p", qf, t)
        d_rc_sel = 1.0 - np.einsum("pd,pd->p", qr, t)
        d_fwd = np.ones(len(pairs))
        d_rc = np.ones(len(pairs))
        d_fwd[:] = d_fwd_sel
        d_rc[:] = d_rc_sel
        return d_fwd, d_rc

    # -- full alignment ------------------------------------------------------

    def align_pairs(self, pairs: np.ndarray) -> list[AlignmentResult]:
        """Align all (query_idx, target_idx) pairs; returns completed results."""
        t0 = time.time()
        if len(pairs) == 0:
            return []
        is_rev = self.choose_orientations(pairs)
        results: list[AlignmentResult] = []
        sc = self.cfg.scores
        pen = Penalties(
            sc.mismatch_penalty,
            sc.gap1_open,
            sc.gap1_extend,
            sc.gap2_open if sc.has_two_piece else None,
            sc.gap2_extend if sc.has_two_piece else None,
        )

        # order pairs by max length for bucketing
        maxlens = np.array(
            [max(self.codes[i].size, self.codes[j].size) for i, j in pairs]
        )
        order = np.argsort(maxlens, kind="stable")

        if self.cfg.kernel == "nw":
            results = self._align_pairs_nw(pairs, order, is_rev, pen)
            self.stats["alignments"] += len(results)
            self.stats["wall_s"] += time.time() - t0
            if self.cfg.verbose:
                print(
                    f"[runner] aligned {len(results)}/{len(pairs)} pairs in "
                    f"{self.stats['wall_s']:.2f}s ({self.stats['dropped']} dropped)"
                )
            return results

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

        self.stats["alignments"] += len(results)
        self.stats["wall_s"] += time.time() - t0
        if self.cfg.verbose:
            print(
                f"[runner] aligned {len(results)}/{len(pairs)} pairs in "
                f"{self.stats['wall_s']:.2f}s ({self.stats['dropped']} dropped)"
            )
        return results

    # -- banded anti-diagonal Gotoh path --------------------------------------

    def _align_pairs_nw(self, pairs, order, is_rev, pen) -> list[AlignmentResult]:
        # bucket by length so padded shapes stay tight
        chunks = []
        i = 0
        order = list(order)
        while i < len(order):
            chunk = []
            while i < len(order):
                p = int(order[i])
                qi, tj = pairs[p]
                q = self.rc_codes[qi] if is_rev[p] else self.codes[qi]
                t = self.codes[tj]
                trial = chunk + [(p, q, t)]
                band = max(self._band_for(x[1].size, x[2].size) for x in trial)
                tmax = _round_up(max(x[1].size + x[2].size for x in trial), 512)
                # must match _dispatch_nw_chunk's padded batch (B >= 8), or a
                # small chunk of long pairs under-budgets by up to 8x
                bytes_needed = max(_next_pow2(len(trial)), 8) * (tmax + 1) * (band + 1)
                if chunk and bytes_needed > self.cfg.memory_budget_bytes:
                    break
                if self.cfg.max_chunk_pairs and len(chunk) >= self.cfg.max_chunk_pairs:
                    break
                chunk.append((p, q, t))
                i += 1
            chunks.append(chunk)

        # pipeline: dispatch chunk k+1 (async device work) before the host
        # traceback of chunk k
        results: list[AlignmentResult] = []
        inflight = None
        for chunk in chunks:
            dispatched = self._dispatch_nw_chunk(chunk, pen)
            if inflight is not None:
                results.extend(self._collect_nw_chunk(*inflight, pairs, is_rev))
            inflight = dispatched
        if inflight is not None:
            results.extend(self._collect_nw_chunk(*inflight, pairs, is_rev))
        return results

    def _use_pallas(self) -> bool:
        if self._pallas_ok is False:
            return False
        return self.cfg.kernel_impl == "pallas"

    def _dispatch_nw_chunk(self, chunk, pen):
        from ..ops import nw

        band = max(self._band_for(q.size, t.size) for _, q, t in chunk)
        tmax = _round_up(max(q.size + t.size for _, q, t in chunk), 512)
        B = max(_next_pow2(len(chunk)), 8)
        lq = _round_up(max(q.size for _, q, _ in chunk), 256)
        lt = _round_up(max(t.size for _, _, t in chunk), 256)
        Q = np.full((B, lq), wfa.QPAD, dtype=np.uint8)
        T = np.full((B, lt), wfa.TPAD, dtype=np.uint8)
        qlens = np.zeros(B, np.int32)
        tlens = np.zeros(B, np.int32)
        for b, (_, q, t) in enumerate(chunk):
            Q[b, : q.size] = q
            T[b, : t.size] = t
            qlens[b] = q.size
            tlens[b] = t.size
        kw = dict(
            mismatch=pen.mismatch,
            o1=pen.gap1_open,
            e1=pen.gap1_extend,
            o2=pen.gap2_open if pen.two_piece else -1,
            e2=pen.gap2_extend if pen.two_piece else -1,
            band=band,
            tmax=tmax,
        )
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
            from ..ops import nw as nw_mod

            scores, tb = nw_mod.nw_align_device(Q, T, qlens, tlens, with_traceback=True, **kw)
            return self._finish_dispatch(chunk, scores, tb, np.asarray(qlens), np.asarray(tlens), band, kw)
        if self._use_pallas():
            try:
                from ..ops import nw_pallas

                scores, tb = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, **kw)
                return self._finish_dispatch(chunk, scores, tb, qlens, tlens, band, kw)
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
            return chunk, scores, ("items", items_list), qlens, tlens, band
        if self.cfg.device_traceback:
            # fused sweep + walk: single dispatch, opcodes-only transfer
            scores, opcodes = nw.nw_align_with_opcodes(Q, T, qlens, tlens, **kw)
            return chunk, scores, ("ops", opcodes), qlens, tlens, band
        scores, tb = nw.nw_align_device(Q, T, qlens, tlens, with_traceback=True, **kw)
        return self._finish_dispatch(chunk, scores, tb, qlens, tlens, band, kw)

    def _finish_dispatch(self, chunk, scores, tb, qlens, tlens, band, kw):
        """Optionally run the device traceback scan before returning the
        in-flight handle (tb stays on device in that mode)."""
        if self.cfg.device_traceback:
            from ..ops import nw

            opcodes = nw.traceback_scan_device(
                tb, qlens, tlens, band=band, tmax=kw["tmax"]
            )
            return chunk, scores, ("ops", opcodes), qlens, tlens, band
        return chunk, scores, ("tb", tb), qlens, tlens, band

    def _collect_nw_chunk(self, chunk, scores, payload, qlens, tlens, band, pairs, is_rev):
        from ..ops import nw

        scores = np.asarray(scores)
        mode, data = payload
        if mode != "items":
            data = np.asarray(data)

        def decode(args):
            b, p, q, t = args
            qi, tj = pairs[p]
            score = int(scores[b])
            if score < 0:
                return None
            cap = self._pair_cap(int(qlens[b]), int(tlens[b]))
            if score > cap:
                return None  # exceeds divergence cap
            if mode == "items":
                items = data[b]
            elif mode == "ops":
                items = nw.decode_opcodes(data[b])
            else:
                items = nw.traceback_pair(data[b], int(qlens[b]), int(tlens[b]), band)
            items = nw.resolve_matches(items, q, t)
            return AlignmentResult(int(qi), int(tj), bool(is_rev[p]), score, items)

        jobs = [(b, p, q, t) for b, (p, q, t) in enumerate(chunk)]
        if self.cfg.threads > 1 and len(jobs) > 3:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=self.cfg.threads) as ex:
                decoded = list(ex.map(decode, jobs))
        else:
            decoded = [decode(j) for j in jobs]
        out = [r for r in decoded if r is not None]
        self.stats["dropped"] += sum(1 for r in decoded if r is None)
        return out

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
