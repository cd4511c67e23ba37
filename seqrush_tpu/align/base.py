"""Backend-agnostic aligner abstraction.

Mirrors the reference's aligner trait layer (/root/reference/src/aligner.rs:
5-96): PAF-shaped records, a backend-agnostic protocol, and a factory.  The
'allwave' backend is the native batched wavefront runner; 'sweepga' is the
native seed-and-extend backend (minimizer anchors + colinear chaining +
gap fill, align/sweep.py) — no external FastGA binary is involved.  The
factory and the pipeline share one backend table (``runner_class``), so the
two can never disagree about what a backend name means.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from ..sequences import SequenceSet
from .pairs import all_ordered_pairs
from .runner import RunnerConfig, WfaAligner


@dataclass
class AlignmentRecord:
    """PAF-shaped record (reference aligner.rs:5-24)."""

    query_name: str
    query_len: int
    query_start: int
    query_end: int
    strand: str
    target_name: str
    target_len: int
    target_start: int
    target_end: int
    cigar: str


class Aligner(Protocol):
    def align_sequences(self, seqs: SequenceSet) -> list[AlignmentRecord]: ...


def runner_class(backend: str):
    """Backend name -> runner class (single source of truth, shared with
    pipeline.align_and_unite).  Raises ValueError on unknown names."""
    if backend == "allwave":
        return WfaAligner
    if backend == "sweepga":
        from .sweep import SweepAligner

        return SweepAligner
    raise ValueError(f"Unknown aligner '{backend}'. Available: allwave, sweepga")


class AllwaveBackend:
    """All-pairs batched backend (the reference's AllwaveAligner); the
    runner class is pluggable so the same record conversion serves both
    native backends."""

    def __init__(self, config: RunnerConfig | None = None, runner_cls=WfaAligner):
        self.config = config or RunnerConfig()
        self.runner_cls = runner_cls

    def align_sequences(self, seqs: SequenceSet) -> list[AlignmentRecord]:
        runner = self.runner_cls(seqs, self.config)
        out = []
        for r in runner.align_pairs(all_ordered_pairs(len(seqs))):
            q = seqs[r.query_idx]
            t = seqs[r.target_idx]
            out.append(
                AlignmentRecord(
                    query_name=q.id,
                    query_len=len(q.data),
                    query_start=0,
                    query_end=len(q.data),
                    strand="-" if r.is_reverse else "+",
                    target_name=t.id,
                    target_len=len(t.data),
                    target_start=0,
                    target_end=len(t.data),
                    cigar=r.cigar_string,
                )
            )
        return out


def create_aligner(backend: str, config: RunnerConfig | None = None) -> Aligner:
    """Factory (reference aligner.rs:36-96)."""
    return AllwaveBackend(config, runner_cls=runner_class(backend))
