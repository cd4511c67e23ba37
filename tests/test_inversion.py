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


def test_patch_accept_and_reject_branches():
    """Pins the reference's patch acceptance rule — completed AND
    inv_score < forward_score/2 (inversion_aware_seqrush.rs:190):
    a true inverted middle is accepted; an equally large RANDOM divergent
    middle (garbage in both orientations) is rejected."""
    from seqrush_tpu.align.inversion import inversion_patch_alignments
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores

    left = rand_seq(150, 11)
    mid = rand_seq(90, 12)
    right = rand_seq(150, 13)

    def patches(mid2):
        seqs = make_sequence_set([("a", left + mid + right), ("b", left + mid2 + right)])
        al = WfaAligner(seqs, RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1")))
        res_f = al.align_pairs_oriented(np.array([[0, 1]]), np.zeros(1, bool))
        assert len(res_f) == 1 and not res_f[0].is_reverse
        u, v = inversion_patch_alignments(res_f, al, min_match_length=0)
        return u

    # accept branch: the middle really is an inversion -> RC window aligns
    # near-perfectly, far under half the forward score
    assert patches(revcomp(mid)).size > 0
    # reject branch: random replacement -> RC window is as bad as forward
    assert patches(rand_seq(90, 14)).size == 0


def test_full_fwd_rev_pass_unites_whole_rc_pair():
    """The reference mode also aligns every distinct pair full fwd-rev
    (inversion_aware_seqrush.rs:225-251): a pair that is a COMPLETE reverse
    complement (which gap patches never see — the forward alignment has no
    anchor matches) still unites under --inversion-aware."""
    s1 = rand_seq(300, 15)
    s2 = revcomp(s1)
    seqs = make_sequence_set([("f", s1), ("r", s2)])
    sr = SeqRushTPU(
        seqs,
        Args(no_sort=True, no_compact=True, output="/tmp/frc.gfa",
             inversion_aware=True, min_match_length=10),
    )
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []
    # fully united: ~300 nodes, not ~600 separate ones
    assert g.node_count() <= 320
    # the second path walks in reverse orientation
    assert (g.paths[1].steps & 1).sum() >= 250


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
