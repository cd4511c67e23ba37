"""Canonical 6-gene zoo layout-quality regression gate (VERDICT r4 #6).

The reference's quality ledger (/root/reference/CLAUDE.md:56-62,
BASELINE.md): its own full-Ygs layout RMSE on real HLA is 83.23 bp, 3.2x
worse than ODGI's 24.86 bp target.  This build's canonical synthetic
6-gene zoo (seed 1234, the documented validate_zoo run) must hold the
ODGI-level bar: mean RMSE <= 24.86 bp.  Per-gene structural validity
(golden invariant + sequential ids) is asserted as well, so a layout OR
correctness regression trips CI rather than an eyeball.
"""

import numpy as np

from seqrush_tpu.tools.validate_zoo import RMSE_GATES, synth_gene, validate_gene


def test_hla_zoo_mean_rmse_gate(tmp_path):
    rng = np.random.default_rng(1234)
    rmses = []
    for i in range(6):
        named = synth_gene(i, rng)
        r = validate_gene(named, f"g{i}", str(tmp_path))
        assert r["pass"], r
        rmses.append(r["rmse_bp"])
    mean = float(np.mean(rmses))
    # measured r5 baseline: mean 18.78, max 42.18 (CPU, seed 1234)
    assert mean <= RMSE_GATES["hla"], (mean, rmses)
