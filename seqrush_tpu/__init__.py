"""seqrush_tpu — TPU-native pangenome graph construction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
SeqRush reference (lock-free parallel pangenome graph constructor): all-vs-all
wavefront alignment, bidirected union-find transitive closure, graph
induction, linear-chain compaction, the Ygs layout pipeline (path-guided SGD,
grooming, topological sort), and GFA 1.0 output.
"""

__version__ = "0.1.0"

from .config import Args  # noqa: F401
from .scores import AlignmentScores  # noqa: F401
from .sequences import Sequence, SequenceSet, load_fasta, load_fasta_str, make_sequence_set  # noqa: F401


def run_seqrush(args):
    """Top-level pipeline entry (lazy import keeps `import seqrush_tpu` light)."""
    from .pipeline import run_seqrush as _run

    return _run(args)
