"""Extended validation corpus (VERDICT r3 next #4).

The reference claims 28/28 HLA-zoo genes ODGI-validated
(/root/reference/CLAUDE.md:51-55); its zoo data is an empty submodule, so
validation here runs on synthetic genes at matched-and-beyond statistics:
the `extended` profile spans 1-30 kb, 1-10% divergence, indels to 300 bp,
inversion- AND tandem-duplication-bearing haplotypes
(tools/validate_zoo.py synth_gene_extended).  CI validates a fixed-seed
subset end to end (golden gate + structural verify + RMSE sanity); the
full 20-gene sweep is the tool run documented in docs/TESTING.md.  A
100 kb+ pair additionally drives the segmented long-pair kernel
(nw_align_long) through the pipeline in CI.
"""

import numpy as np
import pytest

from seqrush_tpu.config import Args
from seqrush_tpu.pipeline import SeqRushTPU
from seqrush_tpu.sequences import make_sequence_set
from seqrush_tpu.tools.validate_zoo import synth_gene_extended, validate_gene


def _small_extended_genes(n=6, seed=77, max_bp=9000):
    """Fixed-seed extended-profile genes small enough for CPU CI: keep
    drawing until n genes under max_bp are found (the profile's length
    distribution is log-uniform to 30 kb; CI skips the giants)."""
    rng = np.random.default_rng(seed)
    out = []
    i = 0
    while len(out) < n and i < 200:
        fam = synth_gene_extended(i, rng)
        i += 1
        if len(fam[0][1]) <= max_bp:
            out.append(fam)
    return out


_validated_cache: dict[int, dict] = {}


def _validated(gi: int) -> dict:
    """validate_gene result for CI extended gene gi (cached: the mean-RMSE
    gate test reuses the per-gene runs instead of re-aligning)."""
    if gi not in _validated_cache:
        import tempfile

        fam = _small_extended_genes()[gi]
        with tempfile.TemporaryDirectory() as d:
            _validated_cache[gi] = validate_gene(fam, f"x{gi}", d)
    return _validated_cache[gi]


@pytest.mark.parametrize("gi", range(4))
def test_extended_gene_validates(gi):
    r = _validated(gi)
    assert r["pass"], r
    # layout sanity (the regression gate is the mean-RMSE test below):
    # an extended gene must stay within the same order of magnitude as
    # the reference's own 83.23 bp on real HLA
    assert r["rmse_bp"] < 250, r


def test_extended_zoo_mean_rmse_gate():
    """Pinned layout-quality regression gate (VERDICT r4 #6): the CI
    extended genes' mean RMSE must beat the reference's own real-HLA
    number (83.23 bp, /root/reference/CLAUDE.md:56-60) — a layout
    regression trips a test, not an eyeball."""
    rmses = [_validated(gi)["rmse_bp"] for gi in range(4)]
    mean = sum(rmses) / len(rmses)
    assert mean <= 83.23, (mean, rmses)


def test_extended_profile_has_structural_variants():
    """The generator actually produces inversions and duplications (the
    spread the compact profile lacks)."""
    rng = np.random.default_rng(3)
    lens, n_haps = [], []
    for i in range(20):
        fam = synth_gene_extended(i, rng)
        lens.append(len(fam[0][1]))
        n_haps.append(len(fam))
        # duplications make some haplotypes LONGER than base + indel slack
    assert min(lens) < 3000 and max(lens) > 15000, lens
    assert min(n_haps) >= 4


def test_long_pair_routes_segmented_and_validates(tmp_path):
    """A 110 kb pair (55 kb + 55 kb > long_pair_threshold) must route
    through the segmented kernel (bounded per-segment memory) and still
    pass the golden gate end to end."""
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=55_000)]
    s = bytearray(base.tobytes())
    for pos in rng.integers(0, len(s), size=55):  # 0.1% SNPs
        s[pos] = bases[rng.integers(0, 4)]
    del s[30_000:30_020]
    seqs = make_sequence_set([("long0", base.tobytes()), ("long1", bytes(s))])
    out = str(tmp_path / "long.gfa")
    sr = SeqRushTPU(seqs, Args(output=out, no_sort=True))
    sr.align_and_unite()
    g = sr.write_gfa()  # hard-fails unless both paths reconstruct
    assert sr.stats["aligner"]["long_pairs"] >= 1, sr.stats["aligner"]
    assert g.comprehensive_verify() == []


def test_long_divergent_pair_routes_anchored(tmp_path):
    """A 40 kb pair at ~1% divergence with an inverted block has a wide
    certified band — the anchored route must take it (pair length no
    longer gates the route), spend DP only on divergence cores, and pass
    the golden gate.  The big inversion core runs on the host C++ DP at a
    raised cell budget (CI has no device monster program)."""
    from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
    from seqrush_tpu.scores import AlignmentScores

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    base = bases[rng.integers(0, 4, size=40_000)]
    s = bytearray(base.tobytes())
    for pos in rng.integers(0, len(s), size=400):  # ~1% SNPs
        s[pos] = bases[rng.integers(0, 4)]
    s[20_000:21_500] = bytes(s[20_000:21_500]).translate(comp)[::-1]
    seqs = make_sequence_set([("l0", base.tobytes()), ("l1", bytes(s))])
    al = WfaAligner(
        seqs,
        RunnerConfig(
            scores=AlignmentScores.parse("0,5,8,2,24,1"),
            wide_host_window_cells=1 << 23,
        ),
    )
    res = al.align_pairs(np.array([[0, 1]]))
    assert al.stats["anchored_pairs"] == 1, al.stats
    assert len(res) == 1
    r = res[0]
    q = al.codes[0]
    t = al.codes[1]
    assert sum(n for n, op in r.cigar if op in "=XI") == q.size
    assert sum(n for n, op in r.cigar if op in "=XD") == t.size
    # the inverted block shows as a large I/D pair
    assert max((n for n, op in r.cigar if op in "ID"), default=0) > 1_000

    # end to end: golden gate + verifier battery
    out = str(tmp_path / "long_inv.gfa")
    sr = SeqRushTPU(seqs, Args(output=out, no_sort=True))
    sr.align_and_unite()
    g = sr.write_gfa()
    assert g.comprehensive_verify() == []
