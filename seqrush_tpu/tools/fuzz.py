"""Randomized full-pipeline fuzzer.

Generates random sequence families (SNPs, indels, tandem duplications,
inversions), runs the complete pipeline under random mode combinations
(--no-compact / --no-sort / --inversion-aware / --seqwish-style / -k), and
checks the golden invariant plus structural consistency on every trial.

  python -m seqrush_tpu.tools.fuzz --seconds 120
  python -m seqrush_tpu.tools.fuzz --trials 50 --seed-base 1

(Last full run: 354 trials, 0 failures — post SGD-fix/band-shard round.)
Clears jit caches periodically —
random shapes otherwise accumulate compiled programs without bound.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# NOTE: pipeline imports happen inside one_trial()/main(), AFTER the device
# pin — importing them here executes module-level jnp constants, which
# initializes the JAX backend and makes any later jax_platforms update a
# silent no-op (the environment may pre-import jax with a TPU platform).

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = bytes.maketrans(b"ACGT", b"TGCA")


def mutate(rng: np.random.Generator, s: bytes) -> bytes:
    s = bytearray(s)
    for _ in range(int(rng.integers(0, 8))):
        if len(s) < 30:
            break
        op = rng.integers(0, 5)
        pos = int(rng.integers(0, len(s) - 20))
        if op == 0:
            s[pos] = BASES[rng.integers(0, 4)]
        elif op == 1:
            del s[pos : pos + int(rng.integers(1, 15))]
        elif op == 2:
            s[pos:pos] = BASES[rng.integers(0, 4, size=int(rng.integers(1, 15)))].tobytes()
        elif op == 3:  # tandem duplication
            ln = int(rng.integers(3, 20))
            s[pos:pos] = bytes(s[pos : pos + ln])
        else:  # inversion
            ln = min(int(rng.integers(10, 60)), len(s) - pos)
            s[pos : pos + ln] = bytes(s[pos : pos + ln]).translate(COMP)[::-1]
    return bytes(s)


def one_trial(trial: int, workdir: str) -> list[str]:
    rng = np.random.default_rng(trial * 7919)
    n = int(rng.integers(2, 7))
    L = int(rng.integers(40, 500))
    wide_trial = rng.random() < 0.15
    if wide_trial:
        # long, heavily diverged family: drives the anchored wide route
        # (chain + host window DP + stitch + fallbacks), which small
        # trials never reach (wide_min_len gate)
        n = int(rng.integers(2, 4))
        L = int(rng.integers(2100, 4200))
    base = BASES[rng.integers(0, 4, size=L)].tobytes()
    fam = [(f"s{k}", mutate(rng, base) if k else base) for k in range(n)]
    if wide_trial:
        # every non-base haplotype gets a large inverted block (10-40%)
        fam2 = [fam[0]]
        for name, s in fam[1:]:
            b = bytearray(s)
            frac = rng.uniform(0.1, 0.4)
            a = int(rng.uniform(0.05, 0.9 - frac) * len(b))
            e = a + int(frac * len(b))
            b[a:e] = bytes(b[a:e]).translate(COMP)[::-1]
            fam2.append((name, bytes(b)))
        fam = fam2
    opts = dict(output=f"{workdir}/fuzz.gfa", seed=trial)
    if wide_trial and rng.random() < 0.5:
        opts["wide_verify"] = True  # runtime certification of every stitch
    r = rng.integers(0, 4)
    if r == 1:
        opts["no_compact"] = True
    if r == 2:
        opts["no_sort"] = True
    if r == 3:
        opts["inversion_aware"] = True
    if rng.random() < 0.3:
        opts["min_match_length"] = int(rng.integers(0, 20))
    if rng.random() < 0.2:
        opts["seqwish_style"] = True
    from ..config import Args
    from ..pipeline import SeqRushTPU
    from ..sequences import make_sequence_set

    seqs = make_sequence_set(fam)
    sr = SeqRushTPU(seqs, Args(**opts))
    sr.align_and_unite()
    g = sr.write_gfa()
    return sr.validate_paths_match_sequences(g) + g.validate_consistency()


def main(argv=None) -> int:
    import jax

    p = argparse.ArgumentParser(prog="fuzz")
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--trials", type=int, default=0, help="0 = run until --seconds")
    p.add_argument("--seed-base", type=int, default=1)
    p.add_argument("--workdir", default="/tmp")
    p.add_argument(
        "--device",
        default="cpu",
        choices=["cpu", "default"],
        help="cpu (default): fuzzing compiles a new kernel shape per trial, "
        "which a shared/tunneled TPU must never pay; 'default' keeps the "
        "session backend",
    )
    ns = p.parse_args(argv)
    if ns.device == "cpu":
        # must precede any jax operation (backends initialize lazily; the
        # environment may pre-import jax with a TPU platform).  Pipeline
        # modules are imported lazily in one_trial() for the same reason.
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", (
            "CPU pin did not take (a non-CPU backend was initialized before "
            "main() — check for module-level jax operations)"
        )

    fails = 0
    t0 = time.time()
    trial = ns.seed_base - 1
    done = 0
    while True:
        trial += 1
        done += 1
        if ns.trials and done > ns.trials:
            break
        if not ns.trials and time.time() - t0 > ns.seconds:
            break
        if done % 12 == 0:
            jax.clear_caches()
        try:
            errs = one_trial(trial, ns.workdir)
            if errs:
                print(f"TRIAL {trial} INVARIANT FAIL: {errs[:2]}")
                fails += 1
        except Exception as e:  # noqa: BLE001
            print(f"TRIAL {trial} EXCEPTION: {type(e).__name__}: {str(e)[:200]}")
            fails += 1
        if fails >= 5:
            break
    print(f"fuzz: {done - 1} trials, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
