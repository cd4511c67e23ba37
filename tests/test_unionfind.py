"""Union-find tests — ported behavior from the reference suite
(/root/reference/src/bidirected_union_find.rs:137-258) plus determinism
properties unique to the TPU design."""

import numpy as np

from seqrush_tpu.ops import unionfind as uf
from seqrush_tpu.ops.unionfind import BidirectedUnionFind
from seqrush_tpu.pos import make_pos


def test_basic_operations():
    u = BidirectedUnionFind(1000)
    p1, p2, p3 = make_pos(100, False), make_pos(200, False), make_pos(100, True)
    assert not u.same(p1, p2)
    assert not u.same(p1, p3)
    u.unite(p1, p2)
    assert u.same(p1, p2)
    assert not u.same(p1, p3)
    u.unite(p1, p3)
    assert u.same(p1, p3)
    assert u.same(p2, p3)  # transitivity


def test_simple_rc_unite():
    u = BidirectedUnionFind(1000)
    p1 = make_pos(139, True)
    p2 = make_pos(215, False)
    u.unite(p1, p2)
    assert u.find(p1) == u.find(p2)
    assert u.same(p1, p2)


def test_unite_matching_region_forward():
    u = BidirectedUnionFind(1000)
    u.unite_matching_region(100, 200, 10, 15, 5, False, 100)
    assert u.same(make_pos(110, False), make_pos(215, False))
    assert u.same(make_pos(114, False), make_pos(219, False))


def test_unite_matching_region_reverse():
    u = BidirectedUnionFind(1000)
    u.unite_matching_region(100, 200, 10, 15, 3, True, 50)
    # RC pos 10 -> forward 50-1-10=39 -> global 139, reverse orientation
    assert u.same(make_pos(139, True), make_pos(215, False))
    assert u.same(make_pos(137, True), make_pos(217, False))


def test_min_root_determinism():
    """Representatives are component minima regardless of unite order."""
    rng = np.random.default_rng(0)
    n = 512
    edges = rng.integers(0, n, size=(200, 2))
    p1 = uf.create(n)
    p1 = np.asarray(uf.unite_edges(p1, edges[:, 0], edges[:, 1]))
    perm = rng.permutation(200)
    p2 = uf.create(n)
    p2 = np.asarray(uf.unite_edges(p2, edges[perm, 0], edges[perm, 1]))
    assert (p1 == p2).all()
    # every root is the min of its component
    for r in np.unique(p1):
        members = np.where(p1 == r)[0]
        assert r == members.min()


def test_batched_vs_incremental():
    rng = np.random.default_rng(1)
    n = 256
    edges = rng.integers(0, n, size=(100, 2))
    p_all = np.asarray(uf.unite_edges(uf.create(n), edges[:, 0], edges[:, 1]))
    p_inc = uf.create(n)
    for lo in range(0, 100, 10):
        p_inc = uf.unite_edges(p_inc, edges[lo : lo + 10, 0], edges[lo : lo + 10, 1])
    assert (p_all == np.asarray(p_inc)).all()


def test_count_components():
    u = BidirectedUnionFind(10)
    u.pre_unite_orientations(10)
    assert uf.count_components(u.parent, 10) == 10
    u.unite(make_pos(0, False), make_pos(1, False))
    u.unite(make_pos(1, False), make_pos(2, False))
    assert uf.count_components(u.parent, 10) == 8


def test_empty_unite():
    p = uf.create(16)
    p2 = uf.unite_edges(p, np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32))
    assert (np.asarray(p2) == np.arange(16)).all()


def test_count_components_fast_parity():
    """count_components_fast (self-root reduction) must equal the
    root-unique count under the pipeline's invariants (F/R pre-united,
    phantom slots isolated) across randomized unite workloads."""
    import numpy as np

    from seqrush_tpu.ops import unionfind as uf

    rng = np.random.default_rng(5)
    for _ in range(5):
        L = int(rng.integers(50, 4000))  # forward positions
        parent = uf.create((L << 1) + 2)
        i = np.arange(L, dtype=np.int64)
        parent = uf.unite_edges(parent, i << 1, (i << 1) | 1)  # F/R pre-unite
        m = int(rng.integers(0, 4 * L))
        if m:
            u = rng.integers(0, 2 * L, size=m)
            v = rng.integers(0, 2 * L, size=m)
            parent = uf.unite_edges(parent, u, v)
        slow = uf.count_components(parent, L)
        fast = uf.count_components_fast(parent, L << 1)
        assert slow == fast, (L, m, slow, fast)
        # numpy-parent path (the native _flush_unites representation)
        fast_np = uf.count_components_fast(np.asarray(parent), L << 1)
        assert fast_np == slow
