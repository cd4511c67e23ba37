"""Inversion detection + inversion-aware alignment tests
(reference tests/test_inversion_detection.rs, test_real_inversion.rs,
src/cigar_analysis.rs tests)."""

import numpy as np

from seqrush_tpu.align.inversion import (
    Gap,
    find_potential_inversion_sites,
    is_potential_inversion,
)
from seqrush_tpu.config import Args
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def revcomp(seq: bytes) -> bytes:
    return seq.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


def test_find_divergent_gap():
    # anchor matches flank a 30X divergent region
    items = [(25, "="), (30, "X"), (25, "=")]
    gaps = find_potential_inversion_sites(items, 20)
    assert len(gaps) == 1
    g = gaps[0]
    assert g.gap_type == "divergent"
    assert (g.query_start, g.query_end) == (25, 55)
    assert (g.target_start, g.target_end) == (25, 55)
    assert is_potential_inversion(g, 20)


def test_short_matches_absorbed_into_gap():
    # a spurious 5= inside the divergent region does not split it
    items = [(25, "="), (20, "I"), (5, "="), (1, "X"), (20, "D"), (25, "=")]
    gaps = find_potential_inversion_sites(items, 20)
    assert len(gaps) == 1
    assert gaps[0].gap_type == "divergent"
    assert is_potential_inversion(gaps[0], 20)


def test_indel_gap_classification():
    items = [(25, "="), (25, "I"), (25, "=")]
    gaps = find_potential_inversion_sites(items, 20)
    assert len(gaps) == 1
    assert gaps[0].gap_type == "query_only"
    assert not is_potential_inversion(gaps[0], 20)

    items = [(25, "="), (25, "D"), (25, "=")]
    gaps = find_potential_inversion_sites(items, 20)
    assert gaps[0].gap_type == "target_only"


def test_size_ratio_rule():
    g = Gap(0, 100, 0, 30, "divergent")
    assert not is_potential_inversion(g, 20)  # ratio > 1.5
    g2 = Gap(0, 100, 0, 80, "divergent")
    assert is_potential_inversion(g2, 20)


def test_inversion_aware_pipeline_shares_middle():
    """Middle-inverted pair: inversion-aware mode unites the inverted middle
    (reverse-orientation steps), plain mode leaves it separate."""
    left = rand_seq(150, 1)
    mid = rand_seq(90, 2)
    right = rand_seq(150, 3)
    s1 = left + mid + right
    s2 = left + revcomp(mid) + right

    def run(inv_aware):
        seqs = make_sequence_set([("plain", s1), ("inverted", s2)])
        sr = SeqRushTPU(
            seqs,
            Args(
                no_sort=True,
                no_compact=True,
                output="/tmp/inv.gfa",
                inversion_aware=inv_aware,
            ),
        )
        sr.align_and_unite()
        graph = sr.write_gfa()
        assert sr.validate_paths_match_sequences(graph) == []
        return graph

    g_plain = run(False)
    g_inv = run(True)
    # the inverted middle collapses: ~90 fewer nodes
    assert g_inv.node_count() <= g_plain.node_count() - 60
    # and the second path traverses some nodes in reverse
    p2 = g_inv.paths[1]
    assert (p2.steps & 1).sum() >= 60
