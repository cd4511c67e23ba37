"""Standalone all-pairs aligner -> PAF (reference src/bin/simple_align.rs):
align every ordered pair both forward and reverse-complemented, keep the
better orientation, emit PAF with cg:Z: CIGARs.

  python -m seqrush_tpu.tools.simple_align in.fa out.paf
"""

from __future__ import annotations

import argparse

# pipeline imports happen inside main() AFTER the device pin (alignment
# runs on device; see tools/fuzz.py for the import-order hazard)


def main(argv=None) -> int:
    import jax

    p = argparse.ArgumentParser(prog="simple_align")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-S", "--scores", default="0,5,8,2,24,1")
    p.add_argument("-d", "--max-divergence", type=float, default=None)
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument(
        "--device", default="default", choices=["cpu", "default"],
        help="'default' (the session backend) — this IS an alignment tool; "
        "pass cpu to keep a one-off run off a shared/tunneled TPU",
    )
    ns = p.parse_args(argv)
    if ns.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu"
    from ..align.pairs import all_ordered_pairs
    from ..align.runner import RunnerConfig, WfaAligner
    from ..io.paf import alignment_to_paf
    from ..scores import AlignmentScores
    from ..sequences import load_fasta

    seqs = load_fasta(ns.input)
    cfg = RunnerConfig(
        scores=AlignmentScores.parse(ns.scores),
        max_divergence=ns.max_divergence,
        verbose=ns.verbose,
    )
    runner = WfaAligner(seqs, cfg)
    results = runner.align_pairs(all_ordered_pairs(len(seqs)))
    with open(ns.output, "w") as fh:
        for r in results:
            fh.write(alignment_to_paf(r, seqs).to_line() + "\n")
    if ns.verbose:
        print(f"Wrote {len(results)} alignments to {ns.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
