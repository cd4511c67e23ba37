"""Ygs pipeline tests: toposort determinism/invariants, groom behavior, SGD
ordering quality — mirroring reference suites (src/ygs_sort.rs tests,
tests/test_topological_sort.rs, reference groom semantics)."""

import numpy as np

from seqrush_tpu.graph.bigraph import BidirectedGraph
from seqrush_tpu.graph.groom import apply_grooming, groom_order
from seqrush_tpu.graph.toposort import exact_odgi_topological_order
from seqrush_tpu.layout.sgd import PathSGDParams, path_sgd_sort
from seqrush_tpu.layout.ygs import YgsParams, ygs_sort


def H(nid, rev=False):
    return (nid << 1) | int(rev)


def simple_graph():
    g = BidirectedGraph()
    g.add_node(1, b"AAAA")
    g.add_node(2, b"CCCC")
    g.add_node(3, b"GGGG")
    g.add_edge(H(1), H(2))
    g.add_edge(H(2), H(3))
    g.add_path("p", np.array([H(1), H(2), H(3)], dtype=np.int64))
    return g


def path_seqs(g):
    return {p.name: g.path_sequence(p).tobytes() for p in g.paths}


def test_ygs_params_from_graph():
    g = simple_graph()
    p = YgsParams.from_graph(g)
    assert p.min_term_updates == 3  # sum of path step counts
    assert p.eta_max == 9.0  # (max step count)^2
    assert p.space == 12  # max path length bp


def test_toposort_sequential_ids():
    """After sort node ids are 1..N (tests/test_topological_sort.rs:6)."""
    g = BidirectedGraph()
    for i, nid in enumerate([7, 3, 9], start=0):
        g.add_node(nid, b"A")
    g.add_edge(H(9), H(3))
    g.add_edge(H(3), H(7))
    g.add_path("p", np.array([H(9), H(3), H(7)], dtype=np.int64))
    before = path_seqs(g)
    order = exact_odgi_topological_order(g)
    g.apply_ordering(order)
    assert sorted(g.nodes) == [1, 2, 3]
    assert path_seqs(g) == before
    # 9 is the head -> becomes node 1; chain follows
    assert [int(h) for h in g.paths[0].steps] == [H(1), H(2), H(3)]


def test_toposort_with_cycle():
    g = BidirectedGraph()
    for nid in (1, 2, 3):
        g.add_node(nid, b"A")
    g.add_edge(H(1), H(2))
    g.add_edge(H(2), H(3))
    g.add_edge(H(3), H(1))  # cycle
    g.add_path("p", np.array([H(1), H(2), H(3)], dtype=np.int64))
    order = exact_odgi_topological_order(g)
    assert len(order) == 3
    assert sorted(h >> 1 for h in order) == [1, 2, 3]


def test_toposort_deterministic():
    g1, g2 = simple_graph(), simple_graph()
    assert exact_odgi_topological_order(g1) == exact_odgi_topological_order(g2)


def test_groom_flips_reverse_reached_nodes():
    # 1+ -> 2- : node 2 first reached via reverse => flipped
    g = BidirectedGraph()
    g.add_node(1, b"AC")
    g.add_node(2, b"AC")
    g.add_edge(H(1), H(2, True))
    g.add_path("p", np.array([H(1), H(2, True)], dtype=np.int64))
    before = path_seqs(g)
    order = groom_order(g)
    flipped = {h >> 1 for h in order if h & 1}
    assert flipped == {2}
    apply_grooming(g, order)
    assert path_seqs(g) == before  # sequences preserved under flips
    # after grooming the path traverses 2 forward
    assert [int(h) for h in g.paths[0].steps] == [H(1), H(2)]
    assert g.nodes[2].tobytes() == b"GT"  # reverse complement applied


def test_groom_forward_graph_unchanged():
    g = simple_graph()
    order = groom_order(g)
    assert all((h & 1) == 0 for h in order)


def test_sgd_orders_linear_path():
    """A linear path should come out in path order after SGD."""
    rng = np.random.default_rng(0)
    g = BidirectedGraph()
    n = 20
    perm = rng.permutation(n) + 1
    for nid in perm:
        g.add_node(int(nid), b"ACGT")
    steps = np.array([H(int(x)) for x in perm], dtype=np.int64)
    g.add_path("p", steps)
    g.verify_path_edges()
    params = YgsParams.from_graph(g).to_sgd()
    order = path_sgd_sort(g, params)
    got = [h >> 1 for h in order]
    want = [int(x) for x in perm]
    # SGD is stochastic; require exact linear recovery for this easy case
    assert got == want or got == want[::-1]


def test_sgd_stable_at_scale():
    """Zoo-scale regression: with u_per_sub approaching the node count, the
    old scatter-add tick compounded same-snapshot moves on repeatedly-drawn
    nodes and diverged (every position NaN -> stable sort -> the Y phase
    silently returned the identity ordering).  The per-node-mean update
    must stay finite at every mixing granularity and actually reorder a
    shuffled graph."""
    rng = np.random.default_rng(7)
    g = BidirectedGraph()
    n = 900
    perm = rng.permutation(n) + 1  # node ids shuffled vs path order
    for nid in perm:
        g.add_node(int(nid), b"AC")
    for k in range(8):  # 8 paths over subsets -> mtu ~ 0.8 * 8 * n
        keep = rng.random(n) < 0.8
        steps = np.array([H(int(x)) for x in perm[keep]], dtype=np.int64)
        g.add_path(f"p{k}", steps)
    g.verify_path_edges()
    from seqrush_tpu.layout.sgd import path_linear_sgd

    for n_sub in (1, 8):
        params = YgsParams.from_graph(g).to_sgd()
        params.n_sub = n_sub
        pos = path_linear_sgd(g, params)
        xs = np.array(list(pos.values()))
        assert np.isfinite(xs).all(), f"n_sub={n_sub}: non-finite positions"
    order = path_sgd_sort(g, YgsParams.from_graph(g).to_sgd())
    assert order != [nid << 1 for nid in sorted(g.nodes)], "Y phase is a no-op"
    # the recovered order must track the underlying path order far better
    # than the shuffled identity: compare mean |rank - path_rank|
    # (the 1D layout has mirror symmetry — accept either direction)
    path_rank = {int(x): r for r, x in enumerate(perm)}

    def err(ids):
        fwd = np.mean([abs(r - path_rank[nid]) for r, nid in enumerate(ids)])
        rev = np.mean(
            [abs(r - (n - 1 - path_rank[nid])) for r, nid in enumerate(ids)]
        )
        return min(fwd, rev)

    got_err = err([h >> 1 for h in order])
    id_err = err(sorted(g.nodes))
    assert got_err < id_err / 4, (got_err, id_err)


def test_full_ygs_preserves_paths():
    g = simple_graph()
    before = path_seqs(g)
    ygs_sort(g, YgsParams.from_graph(g))
    assert path_seqs(g) == before
    assert sorted(g.nodes) == [1, 2, 3]


def test_ygs_e2e_pipeline():
    """Full pipeline with sorting enabled keeps the golden invariant."""
    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU
    from seqrush_tpu.sequences import make_sequence_set

    rng = np.random.default_rng(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=180)].tobytes()
    alt = bytearray(base)
    alt[60] = ord("A") if alt[60] != ord("A") else ord("C")
    seqs = make_sequence_set([("ref", base), ("alt", bytes(alt))])
    sr = SeqRushTPU(seqs, Args(output="/tmp/ygs.gfa"))
    sr.align_and_unite()
    graph = sr.write_gfa()
    assert sr.validate_paths_match_sequences(graph) == []
    # node ids sequential from 1 after Ygs
    ids = sorted(graph.nodes)
    assert ids == list(range(1, len(ids) + 1))


def test_legacy_scc_and_cycle_tolerant_order():
    """Legacy node-level analysis utilities (reference graph_ops.rs
    :347-430 Tarjan SCCs, :431-517 cycle-tolerant multi-pass sort):
    DAGs give singleton SCCs and a valid topological order; cycles are
    detected as multi-node components and still ordered exactly once."""
    import numpy as np

    from seqrush_tpu.graph.bigraph import BidirectedGraph
    from seqrush_tpu.graph.toposort import (
        cycle_tolerant_topological_order,
        strongly_connected_components,
    )

    g = BidirectedGraph()
    for n in range(1, 6):
        g.add_node(n, np.frombuffer(b"A", np.uint8))
    for f, t in [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)]:
        g.add_edge(f << 1, t << 1)
    g.build_path("p", [(n, False) for n in [1, 2, 3, 4]])
    assert sorted(len(c) for c in strongly_connected_components(g)) == [1] * 5
    order = cycle_tolerant_topological_order(g)
    assert sorted(order) == [1, 2, 3, 4, 5]
    ridx = {n: i for i, n in enumerate(order)}
    assert all(ridx[f] < ridx[t] for f, t in [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4)])

    g2 = BidirectedGraph()
    for n in range(1, 5):
        g2.add_node(n, np.frombuffer(b"C", np.uint8))
    for f, t in [(1, 2), (2, 3), (3, 2), (3, 4)]:
        g2.add_edge(f << 1, t << 1)
    g2.build_path("p", [(1, False), (2, False), (3, False), (4, False)])
    comps = sorted(sorted(c) for c in strongly_connected_components(g2))
    assert [2, 3] in comps and [1] in comps and [4] in comps
    assert sorted(cycle_tolerant_topological_order(g2)) == [1, 2, 3, 4]

    # determinism
    assert strongly_connected_components(g2) == strongly_connected_components(g2)
    assert cycle_tolerant_topological_order(g2) == cycle_tolerant_topological_order(g2)


def _random_chain_graph(seed: int, n_nodes: int, n_paths: int = 3):
    """A linear chain of n_nodes with several full-length paths — enough
    structure for SGD to have nontrivial terms, cheap enough for CI."""
    rng = np.random.default_rng(seed)
    g = BidirectedGraph()
    for nid in range(1, n_nodes + 1):
        g.add_node(nid, bytes("ACGT"[int(rng.integers(0, 4))], "ascii") * int(rng.integers(1, 5)))
    for nid in range(1, n_nodes):
        g.add_edge(H(nid), H(nid + 1))
    steps = np.array([H(n) for n in range(1, n_nodes + 1)], dtype=np.int64)
    for p in range(n_paths):
        g.add_path(f"p{p}", steps)
    return g


def test_sgd_bucketing_bit_parity():
    """Shape bucketing (padding every _sgd_run input to the tier ladder)
    must not change the layout at all: with an equal tick width, the padded
    program's positions are bit-identical to the exact-shape program's."""
    from seqrush_tpu.layout.sgd import PathSGDParams, path_linear_sgd

    g = _random_chain_graph(3, 97)
    # force the same tick width on both routes (the bucketed route floors
    # u_per_sub to its step-bucket; pinning min_term_updates makes the
    # exact-shape route compute the identical width)
    mtu = 1024
    pos_bucketed = path_linear_sgd(g, PathSGDParams(min_term_updates=mtu, bucket=True))
    pos_exact = path_linear_sgd(g, PathSGDParams(min_term_updates=mtu, bucket=False))
    assert pos_bucketed == pos_exact


def test_sgd_bucketing_zero_new_compiles():
    """A second distinct graph in the same shape tier must reuse the
    compiled SGD program (VERDICT r4 #2: every previously-unseen FASTA used
    to pay a fresh XLA compile)."""
    from seqrush_tpu.layout.sgd import PathSGDParams, _sgd_run, path_linear_sgd

    path_linear_sgd(_random_chain_graph(11, 60), PathSGDParams())
    before = _sgd_run._cache_size()
    path_linear_sgd(_random_chain_graph(12, 150, n_paths=4), PathSGDParams())
    path_linear_sgd(_random_chain_graph(13, 220, n_paths=2), PathSGDParams())
    assert _sgd_run._cache_size() == before
