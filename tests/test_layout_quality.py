"""Layout-quality regression gate (VERDICT round-1 item 6).

The reference tracks layout RMSE externally (83.23 bp on real HLA-zoo vs
ODGI's 24.86, /root/reference/CLAUDE.md:56-62) but nothing gates it; here a
fixed-seed synthetic zoo asserts structural validity AND an RMSE ceiling in
CI so Ygs quality cannot regress silently.  The ceiling (12 bp) is ~3.5x
the currently measured 2.9-3.5 bp on these genes — loose enough for seed-
stable jitter, far below the reference's own number on comparable-scale
inputs.
"""

import numpy as np
import pytest

from seqrush_tpu.tools.validate_zoo import validate_gene

RMSE_CEILING_BP = 12.0


def _gene(seed, length, n_hap, div=0.02):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=length)]
    out = [("g*00", base.tobytes())]
    for k in range(1, n_hap):
        s = bytearray(base.tobytes())
        for pos in rng.integers(0, len(s), size=int(div * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        for _ in range(2):
            pos = int(rng.integers(0, len(s) - 40))
            ln = int(rng.integers(1, 20))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        out.append((f"g*{k:02d}", bytes(s)))
    return out


@pytest.mark.parametrize(
    "seed,length,n_hap", [(1, 800, 5), (2, 1200, 6), (3, 600, 8)]
)
def test_layout_rmse_gate(seed, length, n_hap, tmp_path):
    r = validate_gene(_gene(seed, length, n_hap), f"gate{seed}", str(tmp_path))
    assert r["pass"], f"structural validation failed: {r.get('error')}"
    assert r["rmse_bp"] <= RMSE_CEILING_BP, (
        f"layout RMSE regressed: {r['rmse_bp']} bp > {RMSE_CEILING_BP} bp "
        f"(reference tracks 83.23 bp on real HLA; we must not drift)"
    )


# Zoo-scale gate (VERDICT r2 #4): the small-gene regime above MISSED the
# round-2 batch-overshoot NaN divergence, which only manifests once
# u_per_sub approaches the node count (1-4 kb, 8+ haplotypes).  This gene
# sits in that regime; the canonical 6-gene zoo measures mean 22.1 bp under
# the 'best' final ordering (below ODGI's 24.86 bp target and the
# reference's 83.23 bp), and this single gate gene measures 5.2 bp — the
# ceiling leaves ample seed-jitter headroom while still failing on any
# catastrophic-tail regression (which costs hundreds of bp).
ZOO_RMSE_CEILING_BP = 70.0


def test_ygs_best_ordering_deterministic(tmp_path):
    """The best-of-four final ordering + polish loop is fully deterministic:
    two pipelines over the same input produce byte-identical GFA (the
    candidate scoring, refinement, and tie-breaks contain no hidden
    nondeterminism)."""
    fam = _gene(9, 900, 6)
    outs = []
    for k in range(2):
        r = validate_gene(fam, f"det{k}", str(tmp_path))
        assert r["pass"]
        outs.append(open(f"{tmp_path}/det{k}.gfa").read())
    assert outs[0] == outs[1]


def test_layout_rmse_gate_zoo_scale(tmp_path):
    rng = np.random.default_rng(77)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    length, n_hap = 1800, 9
    base = bases[rng.integers(0, 4, size=length)]
    fam = [("z*00", base.tobytes())]
    for k in range(1, n_hap):
        s = bytearray(base.tobytes())
        for pos in rng.integers(0, len(s), size=int(0.02 * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        for _ in range(3):
            pos = int(rng.integers(0, len(s) - 60))
            ln = int(rng.integers(1, 40))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        fam.append((f"z*{k:02d}", bytes(s)))
    r = validate_gene(fam, "zoo_gate", str(tmp_path))
    assert r["pass"], f"structural validation failed: {r.get('error')}"
    assert r["rmse_bp"] <= ZOO_RMSE_CEILING_BP, (
        f"zoo-scale layout RMSE regressed: {r['rmse_bp']} bp > "
        f"{ZOO_RMSE_CEILING_BP} bp"
    )
