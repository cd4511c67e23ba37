"""Worker process for the 2-process multi-host test (and a manual demo).

Usage: python tests/multihost_worker.py COORD NPROC PID FASTA OUT
Runs the full pipeline under jax.distributed with the CPU backend; host 0
writes OUT, host k writes OUT.hostk (pipeline.write_gfa multi-host rule).
"""

import sys


def main() -> None:
    coord, nproc, pid, fasta, out = sys.argv[1:6]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc)

    from seqrush_tpu.config import Args
    from seqrush_tpu.pipeline import run_seqrush

    graph = run_seqrush(Args(sequences=fasta, output=out, verbose=True))
    print(
        f"[worker {pid}] done: {graph.node_count()} nodes, "
        f"{len(graph.edges)} edges"
    )


if __name__ == "__main__":
    main()
