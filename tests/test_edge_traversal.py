"""Edge-traversal verifier battery.

Port of the reference's edge-traversal suite
(/root/reference/tests/test_edge_traversal.rs:17-243): no GFA L line may
exist that no path traverses, self-loops must stay minimal (and only be
legal when a path actually walks them), and mixed-variation inputs must
produce structurally complete GFA.  The checks themselves live in
``BidirectedGraph.comprehensive_verify`` (VERDICT r3 missing #3).
"""

import numpy as np
import pytest

from seqrush_tpu.config import Args
from seqrush_tpu.graph.bigraph import BidirectedGraph, parse_gfa
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set


def _run(seqs, tmp_path, **kwargs):
    out = str(tmp_path / "out.gfa")
    args = Args(output=out, scores="0,5,8,2,24,1", **kwargs)
    sr = SeqRushTPU(make_sequence_set(seqs), args)
    sr.align_and_unite()
    g = sr.write_gfa()
    return g, open(out).read()


def _gfa_untraversed_edges(gfa_text: str) -> list[tuple]:
    """Edges from L lines not walked (in either direction) by any P line —
    the reference test's check, applied to the serialized file itself."""
    edges = []
    traversed = set()
    for line in gfa_text.splitlines():
        parts = line.split("\t")
        if parts[0] == "L":
            edges.append((parts[1], parts[2], parts[3], parts[4]))
        elif parts[0] == "P":
            steps = parts[2].split(",")
            for a, b in zip(steps[:-1], steps[1:]):
                fa, oa = a[:-1], a[-1]
                fb, ob = b[:-1], b[-1]
                traversed.add((fa, oa, fb, ob))
                flip = {"+": "-", "-": "+"}
                traversed.add((fb, flip[ob], fa, flip[oa]))
    return [e for e in edges if e not in traversed]


def test_no_untraversed_edges_in_output(tmp_path):
    # reference test_no_untraversed_edges_in_output (:17-104)
    seqs = [
        ("seq1", b"ATCGATCGATCG"),
        ("seq2", b"ATCGATCGATCG"),
        ("seq3", b"ATCGATCGTTCG"),  # single SNP
        ("seq4", b"ATCGATCGATCG"),
    ]
    g, gfa = _run(seqs, tmp_path, min_match_length=4, no_compact=True, no_sort=True)
    assert gfa.count("\nP\t") == 4
    assert gfa.count("\nL\t") > 0
    assert _gfa_untraversed_edges(gfa) == []
    assert g.comprehensive_verify() == []


def test_self_loops_minimal(tmp_path):
    # reference test_self_loops_in_gfa (:106-175): repeat content may
    # create self-loops, but they must be minimal (<= 2) and path-walked
    seqs = [("seq1", b"AAAAAAAA"), ("seq2", b"AAAAAAAA")]
    g, gfa = _run(seqs, tmp_path, min_match_length=1, no_sort=True)
    loops = 0
    for line in gfa.splitlines():
        parts = line.split("\t")
        if parts[0] == "L" and parts[1] == parts[3]:
            loops += 1
    assert loops <= 2, f"expected minimal self-loops, found {loops}"
    assert g.comprehensive_verify() == []


def test_complex_graph_produces_valid_gfa(tmp_path):
    # reference test_complex_graph_produces_valid_gfa (:177-243)
    seqs = [
        ("ref", b"ATCGATCGATCGATCG"),
        ("snp", b"ATCGATGGATCGATCG"),
        ("del", b"ATCGATCGATCG"),
        ("inv", b"ATCGATCGATGCTAGC"),
    ]
    g, gfa = _run(
        seqs, tmp_path, min_match_length=3, max_divergence=0.2,
        no_compact=True, no_sort=True,
    )
    assert gfa.startswith("H\tVN:Z:1.0")
    assert any(l.startswith("S") for l in gfa.splitlines())
    assert any(l.startswith("L") for l in gfa.splitlines())
    assert gfa.count("\nP\t") + gfa.startswith("P") == 4
    assert _gfa_untraversed_edges(gfa) == []
    assert g.comprehensive_verify() == []


def test_verifier_flags_untraversed_edge_and_spurious_self_loop():
    """comprehensive_verify unit semantics: a stored edge no path walks is
    an error; a node-level self-loop is legal iff a path traverses it."""
    g = BidirectedGraph()
    g.add_node(1, np.frombuffer(b"A", dtype=np.uint8))
    g.add_node(2, np.frombuffer(b"C", dtype=np.uint8))
    g.add_edge(1 << 1, 2 << 1)
    g.build_path("p", [(1, False), (2, False)])
    assert g.comprehensive_verify() == []

    # an edge nobody walks
    g.add_node(3, np.frombuffer(b"G", dtype=np.uint8))
    g.add_edge(2 << 1, 3 << 1)
    g.build_path("q", [(3, False)])  # covers node 3 but not the edge
    errs = g.comprehensive_verify()
    assert any("not traversed" in e for e in errs)

    # a legal, path-walked self-loop (tandem repeat)
    g2 = BidirectedGraph()
    g2.add_node(1, np.frombuffer(b"A", dtype=np.uint8))
    g2.add_edge(1 << 1, 1 << 1)
    g2.build_path("p", [(1, False), (1, False)])
    assert g2.comprehensive_verify() == []

    # a spurious self-loop (stored, never walked)
    g3 = BidirectedGraph()
    g3.add_node(1, np.frombuffer(b"A", dtype=np.uint8))
    g3.add_node(2, np.frombuffer(b"C", dtype=np.uint8))
    g3.add_edge(2 << 1, 2 << 1)
    g3.add_edge(1 << 1, 2 << 1)
    g3.build_path("p", [(1, False), (2, False)])
    errs = g3.comprehensive_verify()
    assert any("self-loop" in e for e in errs)


def test_reverse_direction_traversal_counts():
    """A path walking an edge in the complement direction traverses it."""
    g = BidirectedGraph()
    g.add_node(1, np.frombuffer(b"A", dtype=np.uint8))
    g.add_node(2, np.frombuffer(b"C", dtype=np.uint8))
    # stored as 1+ -> 2+, walked as 2- -> 1- (the bidirected complement)
    g.add_edge(1 << 1, 2 << 1)
    g.build_path("p", [(2, True), (1, True)])
    assert g.comprehensive_verify() == []
