"""End-to-end pipeline tests: the golden invariant — every path reconstructs
its input sequence exactly (reference src/lib.rs:231-243 pattern, with the
programmatic mutators add_snp/add_deletion/add_insertion/add_tandem_dup
from src/lib.rs:112-176)."""

import numpy as np
import pytest

from seqrush_tpu.config import Args
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def generate_random_sequence(length, seed):
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=length)].tobytes()


def add_snp(seq: bytes, pos: int) -> bytes:
    s = bytearray(seq)
    s[pos] = ord("A") if s[pos] != ord("A") else ord("C")
    return bytes(s)


def add_deletion(seq: bytes, pos: int, length: int) -> bytes:
    return seq[:pos] + seq[pos + length :]


def add_insertion(seq: bytes, pos: int, ins: bytes) -> bytes:
    return seq[:pos] + ins + seq[pos:]


def add_tandem_duplication(seq: bytes, pos: int, length: int) -> bytes:
    return seq[:pos] + seq[pos : pos + length] + seq[pos:]


def revcomp(seq: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")
    return seq.translate(comp)[::-1]


def run_pipeline(named, **kwargs):
    defaults = dict(no_compact=True, no_sort=True, test_mode=True, output="/tmp/out.gfa")
    defaults.update(kwargs)
    args = Args(**defaults)
    seqs = make_sequence_set(named)
    sr = SeqRushTPU(seqs, args)
    sr.align_and_unite()
    graph = sr.write_gfa()
    return sr, graph


def assert_paths_reconstruct(sr, graph):
    assert sr.validate_paths_match_sequences(graph) == []


def test_identical_sequences_share_nodes():
    base = generate_random_sequence(150, 1)
    named = [(f"seq{i}", base) for i in range(5)]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)
    # 5 identical sequences collapse onto the same 150 nodes (lib.rs:570-604)
    assert graph.node_count() == 150
    for p in graph.paths:
        assert len(np.unique(p.steps >> 1)) == 150


def test_snp():
    base = generate_random_sequence(200, 2)
    named = [("ref", base), ("alt", add_snp(base, 100))]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)
    # one SNP bubble: 199 shared + 2 variant nodes
    assert graph.node_count() == 201


def test_deletion():
    base = generate_random_sequence(200, 3)
    named = [("ref", base), ("del", add_deletion(base, 100, 10))]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)
    assert graph.node_count() == 200


def test_insertion():
    base = generate_random_sequence(200, 4)
    named = [("ref", base), ("ins", add_insertion(base, 80, b"TTTGGCCA"))]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)


def test_tandem_duplication():
    base = generate_random_sequence(120, 5)
    named = [("ref", base), ("dup", add_tandem_duplication(base, 50, 15))]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)


def test_microsatellite_repeats():
    """Low-complexity (AT)n / (CA)n tracts with differing repeat counts —
    many co-optimal alignments; the golden invariant must hold regardless
    of which one the kernel picks (lib.rs repeats/microsatellites case)."""
    flank_l = generate_random_sequence(60, 21)
    flank_r = generate_random_sequence(60, 22)

    def sat(n_at, n_ca):
        return flank_l + b"AT" * n_at + b"GGG" + b"CA" * n_ca + flank_r

    named = [("r12_10", sat(12, 10)), ("r15_10", sat(15, 10)),
             ("r12_7", sat(12, 7)), ("r15_7", sat(15, 7))]
    sr, graph = run_pipeline(named)
    assert_paths_reconstruct(sr, graph)
    # and through the full sorted/compacted pipeline
    sr, graph = run_pipeline(named, no_compact=False, no_sort=False)
    assert_paths_reconstruct(sr, graph)


def test_duplicate_names_reference_parity():
    """The reference's loader does not dedup names and its validator finds
    the FIRST path per name (seqrush.rs:1747-1751): duplicate names with
    identical content pass (two paths, both valid); with differing content
    the run hard-fails validation.  Pin both behaviors."""
    base = generate_random_sequence(80, 29)
    sr, graph = run_pipeline([("dup", base), ("dup", base)])
    assert_paths_reconstruct(sr, graph)
    assert [p.name for p in graph.paths] == ["dup", "dup"]

    with pytest.raises(RuntimeError, match="validation failed"):
        run_pipeline([("dup", base), ("dup", add_snp(base, 40))])


def test_n_gap_sequences():
    """Assembly-style N gaps: N==N unites (one component), N vs base is a
    mismatch, and reconstruction returns the N's byte-for-byte."""
    base = generate_random_sequence(180, 23)
    gapped = base[:60] + b"N" * 25 + base[85:]
    gapped2 = base[:60] + b"N" * 25 + base[85:170] + b"NNNNN"
    sr, graph = run_pipeline([("ref", base), ("g1", gapped), ("g2", gapped2)])
    assert_paths_reconstruct(sr, graph)
    sr, graph = run_pipeline(
        [("ref", base), ("g1", gapped), ("g2", gapped2)],
        no_compact=False, no_sort=False,
    )
    assert_paths_reconstruct(sr, graph)


def test_complex_combination():
    base = generate_random_sequence(300, 6)
    s1 = add_snp(base, 50)
    s2 = add_deletion(add_snp(base, 200), 100, 8)
    s3 = add_insertion(base, 250, b"ACGTACGT")
    sr, graph = run_pipeline([("a", base), ("b", s1), ("c", s2), ("d", s3)])
    assert_paths_reconstruct(sr, graph)


def test_order_independence():
    """Same GRAPH (full isomorphism, not just node count) regardless of
    input order — the reference claim in src/lib.rs:396-424."""
    from seqrush_tpu.tools.isomorphic import isomorphic

    base = generate_random_sequence(150, 7)
    variants = [("x", base), ("y", add_snp(base, 75)), ("z", add_deletion(base, 30, 5))]
    sr1, g1 = run_pipeline(variants)
    sr2, g2 = run_pipeline(list(reversed(variants)))
    ok, msg = isomorphic(g1, g2)
    assert ok, f"graphs differ under input reversal: {msg}"


def test_min_match_length_reduces_unions():
    base = generate_random_sequence(150, 8)
    variants = [("a", base), ("b", add_snp(add_snp(base, 40), 90))]
    _, g_k0 = run_pipeline(variants, min_match_length=0)
    _, g_k20 = run_pipeline(variants, min_match_length=20)
    # larger k forbids short matches -> fewer unions -> more nodes
    assert g_k20.node_count() >= g_k0.node_count()


def test_empty_sequence_panics():
    with pytest.raises(ValueError):
        make_sequence_set([("empty", b"")])


def test_single_base():
    sr, graph = run_pipeline([("a", b"A"), ("b", b"A")])
    assert_paths_reconstruct(sr, graph)
    assert graph.node_count() == 1


def test_inversion_rc_alignment():
    """A sequence that only matches in reverse complement shares nodes via
    reverse-orientation steps (tests/test_real_inversion.rs semantics)."""
    base = generate_random_sequence(200, 9)
    inv = revcomp(base)
    sr, graph = run_pipeline([("fwd", base), ("rev", inv)])
    assert_paths_reconstruct(sr, graph)
    # full RC pair collapses onto the same nodes, traversed in reverse
    assert graph.node_count() == 200
    p0, p1 = graph.paths
    assert (np.sort(p0.steps >> 1) == np.sort(p1.steps >> 1)).all()
    # orientations are opposite
    assert ((p0.steps & 1) != (p1.steps[::-1] & 1)).all()


def test_middle_inversion():
    """Middle segment inverted: ends align forward, middle aligns RC."""
    left = generate_random_sequence(150, 10)
    mid = generate_random_sequence(120, 11)
    right = generate_random_sequence(150, 12)
    s1 = left + mid + right
    s2 = left + revcomp(mid) + right
    sr, graph = run_pipeline([("plain", s1), ("inverted", s2)])
    assert_paths_reconstruct(sr, graph)


def test_gfa_output_format(tmp_path):
    base = generate_random_sequence(50, 13)
    out = str(tmp_path / "t.gfa")
    sr, graph = run_pipeline([("s1", base), ("s2", add_snp(base, 25))], output=out)
    text = open(out).read()
    lines = text.splitlines()
    assert lines[0] == "H\tVN:Z:1.0"
    tags = {l.split("\t")[0] for l in lines}
    assert tags == {"H", "S", "L", "P"}
    # paths named after sequences
    pnames = [l.split("\t")[1] for l in lines if l.startswith("P")]
    assert pnames == ["s1", "s2"]


def test_lowercase_sequences_reconstruct():
    """Lowercase input reconstructs byte-for-byte; case is significant in
    matching (the reference compares raw bytes)."""
    base = generate_random_sequence(120, 30).lower()
    sr, graph = run_pipeline([("lo1", base), ("lo2", base)])
    assert_paths_reconstruct(sr, graph)
    assert graph.node_count() == 120  # identical lowercase seqs unite

    upper = base.upper()
    sr2, g2 = run_pipeline([("lo", base), ("up", upper)])
    assert_paths_reconstruct(sr2, g2)
    # case difference prevents uniting: two disjoint chains
    assert g2.node_count() == 240


def test_mixed_case_rc_pair():
    base = generate_random_sequence(100, 31).lower()
    comp = bytes.maketrans(b"acgt", b"tgca")
    rc = base.translate(comp)[::-1]
    sr, g = run_pipeline([("f", base), ("r", rc)])
    assert_paths_reconstruct(sr, g)
    assert g.node_count() == 100  # RC pair collapses (lowercase-consistent)


def test_max_divergence_drops_unrelated():
    """--max-divergence drops alignments whose optimal score exceeds the
    reference cap formula; unrelated sequences stay un-united."""
    a = generate_random_sequence(150, 40)
    b = generate_random_sequence(150, 41)  # unrelated
    sr, g = run_pipeline([("a", a), ("b", b)], max_divergence=0.05)
    assert sr.stats["aligner"]["dropped"] >= 2  # both directions dropped
    assert g.node_count() == 300  # nothing united
