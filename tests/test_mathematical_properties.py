"""Property-style tests ported from the reference's mathematical suites
(tests/mathematical_bidirected_tests.rs, tests/test_mathematical_correctness.rs):
encoding properties, RC involution, union-find math, path reconstruction,
palindromes, transitivity."""

import numpy as np
import pytest

from seqrush_tpu.config import Args
from seqrush_tpu.ops import unionfind as uf
from seqrush_tpu.ops.unionfind import BidirectedUnionFind
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.pos import make_pos, reverse_complement
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def run(named, **kw):
    defaults = dict(no_compact=True, no_sort=True, output="/tmp/m.gfa")
    defaults.update(kw)
    seqs = make_sequence_set(named)
    sr = SeqRushTPU(seqs, Args(**defaults))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []
    return sr, g


# -- encoding properties ------------------------------------------------------


def test_rc_involution():
    s = np.frombuffer(rand_seq(100, 0), dtype=np.uint8)
    assert (reverse_complement(reverse_complement(s)) == s).all()


def test_pos_encoding_bijective():
    offs = np.arange(1000)
    for rev in (False, True):
        ps = make_pos(offs, np.full(1000, rev))
        assert len(np.unique(ps)) == 1000
    assert not np.intersect1d(
        make_pos(offs, np.zeros(1000, bool)), make_pos(offs, np.ones(1000, bool))
    ).size


# -- union-find math ----------------------------------------------------------


def test_forward_reverse_unification():
    u = BidirectedUnionFind(100)
    u.pre_unite_orientations(100)
    for i in range(100):
        assert u.same(make_pos(i, False), make_pos(i, True))


def test_transitive_closure():
    u = BidirectedUnionFind(100)
    u.unite(make_pos(1, False), make_pos(2, False))
    u.unite(make_pos(2, False), make_pos(3, False))
    u.unite(make_pos(3, False), make_pos(4, False))
    assert u.same(make_pos(1, False), make_pos(4, False))


def test_single_component_per_position():
    """Each position belongs to exactly one component."""
    rng = np.random.default_rng(2)
    n = 200
    p = uf.create(n)
    e = rng.integers(0, n, size=(80, 2))
    roots = np.asarray(uf.unite_edges(p, e[:, 0], e[:, 1]))
    # idempotent: find(find(x)) == find(x)
    assert (roots[roots] == roots).all()


def test_no_false_unifications():
    u = BidirectedUnionFind(100)
    u.unite(make_pos(1, False), make_pos(2, False))
    assert not u.same(make_pos(3, False), make_pos(4, False))
    assert not u.same(make_pos(1, False), make_pos(3, False))


def test_identical_sequences_produce_minimal_components():
    base = rand_seq(120, 3)
    sr, g = run([("a", base), ("b", base), ("c", base)])
    assert sr.count_components() == 120
    assert g.node_count() == 120


def test_partial_alignment():
    """Sharing a prefix only unites the prefix."""
    common = rand_seq(60, 4)
    a = common + rand_seq(60, 5)
    b = common + rand_seq(60, 6)
    sr, g = run([("a", a), ("b", b)])
    # prefix shared (60 components) + 2 distinct tails (120)
    assert g.node_count() == pytest.approx(180, abs=15)


# -- structural properties ----------------------------------------------------


def test_palindrome_sequence():
    """Self-reverse-complement sequences must still reconstruct."""
    half = rand_seq(60, 7)
    comp = half.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    pal = half + comp
    assert pal == pal.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    sr, g = run([("pal", pal), ("pal2", pal)])
    assert g.node_count() <= 120


def test_inductive_extension():
    """Adding a longer sequence sharing a prefix extends the graph."""
    base = rand_seq(80, 8)
    longer = base + rand_seq(40, 9)
    sr1, g1 = run([("a", base), ("b", base)])
    sr2, g2 = run([("a", base), ("b", longer)])
    assert g2.node_count() == g1.node_count() + 40


def test_edge_connectivity():
    """Every consecutive path step pair has a corresponding edge."""
    base = rand_seq(100, 10)
    alt = bytearray(base)
    alt[50] = BASES[(alt[50] + 1) % 4]
    sr, g = run([("a", base), ("b", bytes(alt))])
    for p in g.paths:
        for x, y in zip(p.steps[:-1], p.steps[1:]):
            assert g.has_edge(int(x), int(y))


def test_match_transitivity():
    """a~b and b~c matches imply a,c collapse into shared components."""
    base = rand_seq(100, 11)
    sr, g = run([("a", base), ("b", base), ("c", base)])
    steps = [p.steps >> 1 for p in g.paths]
    assert (steps[0] == steps[1]).all()
    assert (steps[1] == steps[2]).all()


def test_order_of_unite_irrelevant():
    rng = np.random.default_rng(12)
    n = 128
    edges = rng.integers(0, n, size=(60, 2))
    p1 = np.asarray(uf.unite_edges(uf.create(n), edges[:, 0], edges[:, 1]))
    for seed in range(3):
        perm = np.random.default_rng(seed).permutation(len(edges))
        p2 = np.asarray(uf.unite_edges(uf.create(n), edges[perm, 0], edges[perm, 1]))
        assert (p1 == p2).all()


def test_comprehensive_verify_and_gfa_roundtrip(tmp_path):
    """comprehensive_verify passes on pipeline output, and parsing the
    emitted GFA back reproduces an equivalent graph (format check)."""
    from seqrush_tpu.graph.bigraph import parse_gfa

    base = rand_seq(150, 20)
    alt = bytearray(base)
    alt[70] = BASES[(alt[70] + 1) % 4]
    sr, g = run([("a", base), ("b", bytes(alt))], no_compact=False)
    originals = {"a": base, "b": bytes(alt)}
    assert g.comprehensive_verify(originals) == []

    text = g.to_gfa_string()
    g2 = parse_gfa(text)
    assert g2.comprehensive_verify(originals) == []
    assert sorted(g2.nodes) == sorted(g.nodes)
    assert len(g2.edges) == len(g.edges)
    assert g2.to_gfa_string() == text  # stable round-trip
