"""PAF interop (checkpoint/replay), iterative mode, sparsification, CLI, and
tool tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

from seqrush_tpu.align.pairs import all_ordered_pairs, parse_sparsification, schedule_pairs
from seqrush_tpu.config import Args
from seqrush_tpu.pipeline import SeqRushTPU, run_seqrush
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=n)].tobytes()


def variant_family(n=4, length=200, seed=5):
    base = bytearray(rand_seq(length, seed))
    rng = np.random.default_rng(seed + 1)
    fam = [("s0", bytes(base))]
    for k in range(1, n):
        s = bytearray(base)
        for pos in rng.integers(0, len(s), size=3):
            s[pos] = BASES[rng.integers(0, 4)]
        fam.append((f"s{k}", bytes(s)))
    return fam


def test_paf_roundtrip(tmp_path):
    """--output-alignments then -p replay produces the identical graph
    (the PAF file is the pipeline's checkpoint; reference seqrush.rs:510-609)."""
    fam = variant_family()
    paf = str(tmp_path / "aln.paf")
    out1 = str(tmp_path / "direct.gfa")
    out2 = str(tmp_path / "replay.gfa")

    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(output=out1, output_alignments=paf, no_sort=True))
    sr.align_and_unite()
    g1 = sr.write_gfa()

    # replay from PAF without aligning
    seqs2 = make_sequence_set(fam)
    sr2 = SeqRushTPU(seqs2, Args(output=out2, paf=paf, no_sort=True))
    sr2.align_and_unite()
    g2 = sr2.write_gfa()

    assert open(out1).read() == open(out2).read()
    assert g1.node_count() == g2.node_count()


def test_paf_format(tmp_path):
    fam = variant_family(n=2)
    paf = str(tmp_path / "a.paf")
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(output=str(tmp_path / "o.gfa"), output_alignments=paf, no_sort=True))
    sr.align_and_unite()
    lines = open(paf).read().splitlines()
    assert len(lines) == 2  # ordered pairs of 2 seqs
    f = lines[0].split("\t")
    assert len(f) >= 13
    assert f[4] in "+-"
    assert f[12].startswith("cg:Z:")


def test_iterative_mode():
    fam = variant_family(n=6, length=150, seed=9)
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(output="/tmp/iter.gfa", iterative=True, no_sort=True))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []
    # identical-ish family: most positions unified
    assert g.node_count() < 2 * 150


def test_iterative_mode_batches_dispatches(tmp_path):
    """The random phase aligns in device-sized batches, not one ~25 ms
    dispatch per 10 pairs (VERDICT r2 weak #5; reference config #4 scale).
    200 near-identical sequences stabilize after ~100 random pairs: the
    whole phase must take O(1) dispatches, not ~10."""
    rng = np.random.default_rng(21)
    base = bytearray(rand_seq(60, 20))
    fam = [("s0", bytes(base))]
    for k in range(1, 200):
        s = bytearray(base)
        for pos in rng.integers(0, len(s), size=2):
            s[pos] = BASES[rng.integers(0, 4)]
        fam.append((f"s{k}", bytes(s)))
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(output=str(tmp_path / "it.gfa"), iterative=True, no_sort=True))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []
    # 1 tree dispatch + >=1 random dispatch; stabilization (10 checks x 10
    # pairs) fits inside one 250-pair batch, so the total stays tiny
    assert 2 <= sr.stats["iterative_dispatches"] <= 4


def test_iterative_dispatch_size_invariant(tmp_path, monkeypatch):
    """Early-stop semantics depend on result order only: batching the random
    phase at 250 pairs/dispatch produces the same graph as the reference's
    10-pair cadence (pair-order consumption + phase-global check counter)."""
    import seqrush_tpu.pipeline as pl

    fam = variant_family(n=8, length=120, seed=33)
    outs = []
    for dispatch in (10, 250):
        monkeypatch.setattr(pl, "ITER_DISPATCH", dispatch)
        out = str(tmp_path / f"it{dispatch}.gfa")
        seqs = make_sequence_set(fam)
        sr = SeqRushTPU(seqs, Args(output=out, iterative=True, no_sort=True))
        sr.align_and_unite()
        sr.write_gfa()
        outs.append(open(out).read())
    assert outs[0] == outs[1]


def test_checkpoint_cli_roundtrip(tmp_path):
    """--save-checkpoint then --load-checkpoint reproduces the identical
    GFA without re-aligning (graph-phase resume — a capability beyond the
    reference's PAF-only replay)."""
    from seqrush_tpu.cli import main as cli_main

    fam = variant_family(n=4, length=150, seed=41)
    fasta = str(tmp_path / "in.fa")
    with open(fasta, "w") as fh:
        for name, seq in fam:
            fh.write(f">{name}\n{seq.decode()}\n")
    out1 = str(tmp_path / "a.gfa")
    out2 = str(tmp_path / "b.gfa")
    ck = str(tmp_path / "uf.npy")
    cli_main(["-s", fasta, "-o", out1, "--no-sort", "--save-checkpoint", ck])
    cli_main(["-s", fasta, "-o", out2, "--no-sort", "--load-checkpoint", ck])
    assert open(out1).read() == open(out2).read()


def test_sparsification_parser():
    assert parse_sparsification("none").kind == "none"
    assert parse_sparsification("auto").kind == "auto"
    s = parse_sparsification("random:0.5")
    assert s.kind == "random" and s.factor == 0.5
    s = parse_sparsification("connectivity:0.3")
    assert s.kind == "connectivity" and s.factor == 0.3
    s = parse_sparsification("tree:3,2,0.1,16")
    assert (s.k_nearest, s.k_farthest, s.rand_frac, s.kmer_size) == (3, 2, 0.1, 16)
    s = parse_sparsification("tree:3")
    assert (s.k_nearest, s.k_farthest) == (3, 0)
    s = parse_sparsification("0.7")  # backward compat float
    assert s.kind == "random" and s.factor == 0.7
    with pytest.raises(ValueError):
        parse_sparsification("random:1.5")
    with pytest.raises(ValueError):
        parse_sparsification("bogus")


def test_schedule_pairs_tree():
    from seqrush_tpu.ops.kmer import kmer_distance_matrix
    from seqrush_tpu.pos import encode_bases

    fam = variant_family(n=6, length=200, seed=11)
    codes = [encode_bases(s) for _, s in fam]
    kdist = kmer_distance_matrix(codes, 16)
    pairs = schedule_pairs(6, parse_sparsification("tree:2,1,0.1"), kmer_distances=kdist)
    assert len(pairs) >= 5  # at least a spanning tree
    assert (pairs[:, 0] != pairs[:, 1]).all()


def test_sparsified_pipeline_still_validates():
    fam = variant_family(n=6, length=150, seed=13)
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(
        seqs, Args(output="/tmp/sp.gfa", sparsification="tree:2,1,0.2", no_sort=True)
    )
    sr.align_and_unite()
    g = sr.write_gfa()
    assert sr.validate_paths_match_sequences(g) == []


def test_cli_end_to_end(tmp_path):
    fa = tmp_path / "in.fa"
    fam = variant_family(n=3, length=120, seed=15)
    fa.write_text("".join(f">{name}\n{seq.decode()}\n" for name, seq in fam))
    out = tmp_path / "out.gfa"
    from seqrush_tpu.cli import main

    rc = main(["-s", str(fa), "-o", str(out), "--no-sort"])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("H\tVN:Z:1.0")
    assert sum(1 for l in text.splitlines() if l.startswith("P")) == 3


def test_cli_profile_report(tmp_path):
    """--profile writes a machine-readable run report (phase timings,
    aligner stats, graph counts) — structured observability the reference
    lacks (SURVEY.md §5)."""
    import json

    fa = tmp_path / "in.fa"
    fam = variant_family(n=3, length=120, seed=15)
    fa.write_text("".join(f">{name}\n{seq.decode()}\n" for name, seq in fam))
    out = tmp_path / "out.gfa"
    prof = tmp_path / "prof.json"
    from seqrush_tpu.cli import main

    rc = main(["-s", str(fa), "-o", str(out), "--profile", str(prof)])
    assert rc == 0
    rep = json.loads(prof.read_text())
    assert rep["graph"]["paths"] == 3
    assert rep["stats"]["aligner"]["alignments"] == 6
    assert "align" in rep["phases_s"]


def test_sort_gfa_tool(tmp_path):
    fa = tmp_path / "in.fa"
    fam = variant_family(n=2, length=100, seed=17)
    fa.write_text("".join(f">{name}\n{seq.decode()}\n" for name, seq in fam))
    unsorted_gfa = tmp_path / "u.gfa"
    run_seqrush(Args(sequences=str(fa), output=str(unsorted_gfa), no_sort=True))
    sorted_gfa = tmp_path / "s.gfa"
    from seqrush_tpu.tools.sort_gfa import main as sort_main

    assert sort_main([str(unsorted_gfa), str(sorted_gfa)]) == 0
    from seqrush_tpu.graph.bigraph import parse_gfa

    g = parse_gfa(open(sorted_gfa).read())
    ids = sorted(g.nodes)
    assert ids == list(range(1, len(ids) + 1))


def test_measure_layout_quality_tool(tmp_path, capsys):
    fa = tmp_path / "in.fa"
    fam = variant_family(n=2, length=100, seed=19)
    fa.write_text("".join(f">{name}\n{seq.decode()}\n" for name, seq in fam))
    gfa = tmp_path / "g.gfa"
    run_seqrush(Args(sequences=str(fa), output=str(gfa)))
    from seqrush_tpu.tools.measure_layout_quality import main as mlq

    assert mlq([str(gfa), "--json"]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rmse" in q and q["n_terms"] > 0


def test_paf_prepass_covers_all_pairs_under_sparsification(tmp_path):
    """--output-alignments records the full all-pairs set even when the
    graph run is sparsified (reference runs a separate unsparsified PAF
    pre-pass, seqrush.rs:694-716)."""
    fam = variant_family(n=5, length=150, seed=23)
    paf = str(tmp_path / "a.paf")
    sr = SeqRushTPU(
        make_sequence_set(fam),
        Args(
            output=str(tmp_path / "o.gfa"),
            output_alignments=paf,
            sparsification="tree:1",
            no_sort=True,
        ),
    )
    sr.align_and_unite()
    sr.write_gfa()
    lines = open(paf).read().splitlines()
    assert len(lines) == 5 * 4  # all ordered pairs, not the sparsified subset


def test_malformed_paf_warn_and_skip(tmp_path, capsys):
    """Malformed PAF records are warned about and skipped, valid ones are
    processed (reference seqrush.rs:536-576)."""
    fam = variant_family(n=2, length=80, seed=31)
    # produce a valid PAF, then corrupt one line and add junk
    paf = tmp_path / "a.paf"
    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(output=str(tmp_path / "x.gfa"), output_alignments=str(paf), no_sort=True))
    sr.align_and_unite()
    lines = paf.read_text().splitlines()
    corrupted = ["too\tfew\tfields", lines[0], "q\t10\ta\tb\t+\tt\t10\t0\t10\t5\t10\t255\tcg:Z:10="]
    bad = tmp_path / "bad.paf"
    bad.write_text("\n".join(corrupted) + "\n")

    sr2 = SeqRushTPU(make_sequence_set(fam), Args(output=str(tmp_path / "y.gfa"), paf=str(bad), no_sort=True))
    sr2.align_and_unite()  # must not raise
    g = sr2.write_gfa()
    assert sr2.validate_paths_match_sequences(g) == []
    err = capsys.readouterr().err
    assert "Warning" in err


def test_paf_standard_strand_convention(tmp_path):
    """Replaying a minimap2-style '-' record (query coords on the ORIGINAL
    strand) requires --paf-strand-convention standard; the reference's own
    RC-space convention (seqrush.rs:594-601) mis-maps such records
    (VERDICT round-1 weak #8)."""
    import numpy as np

    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import SeqRushTPU
    from seqrush_tpu.pos import encode_bases, reverse_complement_codes
    from seqrush_tpu.sequences import make_sequence_set

    q = rand_seq(100, 11)
    sub = q[20:90]
    t = bytes(
        reverse_complement_codes(encode_bases(sub)).copy().tobytes()
    ).translate(bytes.maketrans(bytes(range(4)) + b"N", b"ACGTN"))
    seqs_named = [("q", q), ("t", t)]
    # standard-convention '-' record: q_start/q_end on the original strand
    paf = tmp_path / "std.paf"
    paf.write_text(f"q\t100\t20\t90\t-\tt\t70\t0\t70\t70\t70\t255\tcg:Z:70=\n")

    args = Args(paf=str(paf), output="/dev/null", paf_convention="standard")
    sr = SeqRushTPU(make_sequence_set(seqs_named), args)
    sr.align_and_unite()
    # 70 cross-sequence unites: components drop from 170 to 100
    assert sr.count_components() == 100

    # the same record under the reference convention mis-maps: the CIGAR
    # processor re-derives matches from actual base equality (reference
    # process_alignment semantics), so only coincidental ~25% of positions
    # unite — far from the true 70
    args2 = Args(paf=str(paf), output="/dev/null", paf_convention="seqrush")
    sr2 = SeqRushTPU(make_sequence_set(seqs_named), args2)
    sr2.align_and_unite()
    assert sr2.count_components() > 120  # garbage mapping, not the real 100

    # and a seqrush-convention record (RC-space coords 10..80) maps
    # correctly under the default convention
    paf2 = tmp_path / "rc.paf"
    paf2.write_text(f"q\t100\t10\t80\t-\tt\t70\t0\t70\t70\t70\t255\tcg:Z:70=\n")
    sr3 = SeqRushTPU(make_sequence_set(seqs_named), Args(paf=str(paf2), output="/dev/null"))
    sr3.align_and_unite()
    assert sr3.count_components() == 100


def test_mash_distance_batch_matches_per_pair():
    """The vectorized sort-merge mash estimator equals the per-pair
    union1d/intersect1d reference on random sketches, including empty and
    truncated sketches and the identical-sequence case."""
    import numpy as np

    from seqrush_tpu.ops.kmer import (
        mash_distance,
        mash_distance_batch,
        mash_sketches,
    )
    from seqrush_tpu.pos import encode_bases

    rng = np.random.default_rng(123)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = []
    base = bases[rng.integers(0, 4, size=900)].tobytes()
    for k in range(6):
        s = bytearray(base)
        for pos in rng.integers(0, len(s), size=5 * k):
            s[pos] = bases[rng.integers(0, 4)]
        seqs.append(encode_bases(np.frombuffer(bytes(s), np.uint8)))
    seqs.append(encode_bases(np.frombuffer(base, np.uint8)))  # identical to 0
    sk = mash_sketches(seqs)
    sk.append(np.zeros(0, np.uint64))  # empty sketch
    sk.append(sk[0][:9])  # tiny truncated sketch
    n = len(sk)
    ia, ib = np.meshgrid(np.arange(n), np.arange(n))
    ia, ib = ia.ravel(), ib.ravel()
    batch = mash_distance_batch(sk, ia, ib)
    ref = np.array([mash_distance(sk[i], sk[j]) for i, j in zip(ia, ib)])
    assert np.allclose(batch, ref)
