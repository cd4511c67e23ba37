"""Real 2-process multi-host execution (jax.distributed on localhost).

The reference parallelizes with shared-memory rayon threads
(seqrush.rs:1841-1843); the TPU framework's multi-host story is: stripe the
pair list per host, allgather the tiny match-run edge lists, apply the
identical deterministic unite everywhere (SURVEY.md §5 distributed items
(1)-(6)).  This test launches TWO actual processes under
jax.distributed.initialize and asserts the output GFA is byte-identical
across hosts AND to a single-process run — host-count invariance at the
process level (extending tests/test_multidevice.py's in-process meshes).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_fasta(path: str) -> None:
    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = bases[rng.integers(0, 4, size=220)]
    with open(path, "w") as fh:
        fh.write(">s0\n" + base.tobytes().decode() + "\n")
        for k in range(1, 5):
            v = bytearray(base.tobytes())
            for pos in rng.integers(0, len(v), size=5):
                v[pos] = bases[rng.integers(0, 4)]
            if k == 3:
                del v[60:67]
            fh.write(f">s{k}\n" + bytes(v).decode() + "\n")


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # one plain CPU device per process; JAX_PLATFORMS=cpu is applied by the
    # worker via jax.config before any backend use (sitecustomize pre-import)
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.mark.slow
def test_two_process_gfa_identical(tmp_path):
    fasta = str(tmp_path / "in.fa")
    _write_fasta(fasta)

    # single-process reference output (same worker, nproc=1)
    single_out = str(tmp_path / "single.gfa")
    port = _free_port()
    r = subprocess.run(
        [sys.executable, WORKER, f"127.0.0.1:{port}", "1", "0", fasta, single_out],
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"single-process worker failed:\n{r.stdout}\n{r.stderr}"

    # two real processes
    multi_out = str(tmp_path / "multi.gfa")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", "2", str(pid), fasta, multi_out],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"multi-host worker failed:\n{out}\n{err}"

    gfa_single = open(single_out).read()
    gfa_h0 = open(multi_out).read()
    gfa_h1 = open(multi_out + ".host1").read()
    assert gfa_h0 == gfa_h1, "hosts disagree on the output graph"
    assert gfa_h0 == gfa_single, "2-host output differs from single-process"
    assert gfa_h0.startswith("H\tVN:Z:1.0")
