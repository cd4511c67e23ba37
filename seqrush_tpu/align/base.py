"""Backend-agnostic aligner abstraction.

Mirrors the reference's aligner trait layer (/root/reference/src/aligner.rs:
5-96): PAF-shaped records, a backend-agnostic protocol, and a factory.  The
'allwave' backend is the native batched wavefront runner; 'sweepga' (FastGA
seed-and-extend + 1:1 plane-sweep filtering) depends on an external C binary
that is not bundled — its role is covered by the PAF input path (-p) for
externally computed alignments, and requesting it raises a clear error from
the factory (callers can catch and fall back).
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


class AllwaveBackend:
    """All-pairs batched wavefront backend (the reference's AllwaveAligner)."""

    def __init__(self, config: RunnerConfig | None = None):
        self.config = config or RunnerConfig()

    def align_sequences(self, seqs: SequenceSet) -> list[AlignmentRecord]:
        runner = WfaAligner(seqs, self.config)
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
    if backend == "allwave":
        return AllwaveBackend(config)
    if backend == "sweepga":
        raise ValueError(
            "sweepga backend requires the external FastGA binary, which is not "
            "bundled; produce a PAF externally and use the -p input path, or "
            "use the 'allwave' backend"
        )
    raise ValueError(f"Unknown aligner '{backend}'. Available: allwave")
