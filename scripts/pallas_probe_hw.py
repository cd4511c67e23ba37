"""One-command Pallas hardware probe — run the day a DIRECT-ATTACHED TPU
is available (VERDICT r3 next #8).

    python scripts/pallas_probe_hw.py

Refuses to run through the axon tunnel (its remote-compile helper crashes
on ANY Pallas program — CLAUDE.md) or on CPU.  On a real TPU backend it
answers, in one run, the question the whole per-step-floor story hangs on:

  1. compile probe: does the Mosaic lowering of the production Gotoh
     sweep compile and return a correct tiny result? (the runner's
     kernel_impl='auto' gate, align/runner.py _probe_pallas)
  2. parity: scores + end CIGARs vs the XLA production path on a
     mixed SNP/indel/inversion batch (the interpret-mode matrix of
     tests/test_nw_pallas.py, now against real hardware)
  3. per-step floor: wall-clock of the Pallas sweep vs the XLA scan at
     the bench mega-chunk shape (B=576, W=512, tmax=6656) and the wide
     shape (B=64, W=1536) — interleaved ABAB x3, per-step microseconds
     printed for both.  Round-3 measured the XLA floor at ~11.7 us/step;
     if Pallas lands well under that, flip RunnerConfig.kernel_impl to
     'auto' in production and re-run bench.py.
"""

import sys
import time

import numpy as np


def main() -> int:
    import jax

    backend = jax.default_backend()
    from seqrush_tpu.ops.unionfind import on_axon_tunnel

    # NOTE: the axon plugin now registers as platform "tpu" (measured r5),
    # so the backend name alone no longer excludes the tunnel — check the
    # env-level platform list too.
    if backend != "tpu" or on_axon_tunnel():
        print(
            f"ABORT: backend is '{backend}' (axon tunnel: {on_axon_tunnel()}), "
            "need a DIRECT-ATTACHED TPU.  Never run this through the axon "
            "tunnel — Pallas programs crash its remote-compile helper "
            "(CLAUDE.md).",
            file=sys.stderr,
        )
        return 2

    from seqrush_tpu.ops import nw, nw_pallas

    kw_tiny = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=15, tmax=32)
    Q = np.zeros((8, 32), np.uint8)
    T = np.zeros((8, 32), np.uint8)
    lens = np.full(8, 16, np.int32)
    t0 = time.time()
    scores, _ = nw_pallas.nw_align_pallas(Q, T, lens, lens, **kw_tiny)
    ok = int(np.asarray(scores)[0]) == 0
    print(f"[1] compile probe: {'OK' if ok else 'FAIL'} ({time.time()-t0:.1f}s)")
    if not ok:
        return 1

    # [2] parity on a mixed-variant batch
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    qs, ts = [], []
    L = 1024
    for k in range(16):
        base = bases[rng.integers(0, 4, size=L)].tobytes()
        alt = bytearray(base)
        for pos in rng.integers(0, L, size=20):
            alt[pos] = bases[rng.integers(0, 4)]
        if k % 4 == 1:
            del alt[300:340]
        if k % 4 == 3:
            alt[500:700] = bytes(alt[500:700]).translate(comp)[::-1]
        qs.append(np.frombuffer(base, np.uint8))
        ts.append(np.frombuffer(bytes(alt), np.uint8))
    from seqrush_tpu.pos import encode_bases

    qs = [encode_bases(q.tobytes()) for q in qs]
    ts = [encode_bases(t.tobytes()) for t in ts]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.full((16, lq), nw.QPAD, np.uint8)
    T = np.full((16, lt), nw.TPAD, np.uint8)
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    for b in range(16):
        Q[b, : qs[b].size] = qs[b]
        T[b, : ts[b].size] = ts[b]
    band = 511
    tmax = int((qlens + tlens).max()) + 1
    kw = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=band, tmax=tmax)
    s_x, tok, cnt = nw.nw_align_with_runs(Q, T, qlens, tlens, **kw)
    items_x = nw.decode_runs_batch(np.asarray(tok), np.asarray(cnt), qs, ts)
    s_p, tb = nw_pallas.nw_align_pallas(Q, T, qlens, tlens, **kw)
    opc = nw.traceback_scan_device(tb, qlens, tlens, band=band, tmax=tmax)
    ops = nw.unpack_opcodes(np.asarray(opc), np.asarray(opc).shape[1] * 4)
    items_p = nw.decode_batch(ops[:16], qs, ts)
    score_ok = (np.asarray(s_x)[:16] == np.asarray(s_p)[:16]).all()
    cigar_ok = all(a == b for a, b in zip(items_x, items_p))
    print(f"[2] parity: scores {'OK' if score_ok else 'FAIL'}, CIGARs "
          f"{'OK' if cigar_ok else 'FAIL'}")
    if not (score_ok and cigar_ok):
        return 1

    # [3] per-step floor, interleaved ABAB x3 at the bench shapes:
    # XLA fused (sweep+walk via runs emission) vs Pallas sweep + Pallas walk
    for label, B, W, tmax_s in (("mega", 576, 512, 6656), ("wide", 64, 1536, 6656)):
        Lb = tmax_s // 2
        Qb = np.random.default_rng(1).integers(0, 4, size=(B, Lb)).astype(np.uint8)
        Tb = Qb.copy()
        lb = np.full(B, Lb, np.int32)
        kwb = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1, band=W - 1, tmax=tmax_s)

        def run_xla():
            s, tok, cnt = nw.nw_align_with_runs(Qb, Tb, lb, lb, **kwb)
            s.block_until_ready()

        def run_pallas():
            s, tb = nw_pallas.nw_align_pallas(Qb, Tb, lb, lb, **kwb)
            ops = nw_pallas.nw_walk_pallas(tb, lb, lb, band=W - 1, tmax=tmax_s)
            ops.block_until_ready()

        run_xla()  # warm
        run_pallas()
        for rep in range(3):
            t0 = time.time()
            run_xla()
            dt_x = time.time() - t0
            t0 = time.time()
            run_pallas()
            dt_p = time.time() - t0
            print(
                f"[3] {label} rep{rep} (sweep+walk): "
                f"XLA {dt_x*1e6/(2*tmax_s):.1f} us/step ({dt_x:.3f}s)  "
                f"Pallas {dt_p*1e6/(2*tmax_s):.1f} us/step ({dt_p:.3f}s)  "
                f"speedup {dt_x/dt_p:.2f}x"
            )
    print("probe complete — if Pallas wins, set kernel_impl='auto' and re-bench")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
