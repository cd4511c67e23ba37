"""Native C++ runtime tests: FASTA parser parity, host union-find
determinism, and backtrace parity with the pure-Python specification."""

import numpy as np
import pytest

from seqrush_tpu import native
from seqrush_tpu.ops import wfa
from seqrush_tpu.ops.wfa import Penalties
from seqrush_tpu.pos import encode_bases

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def test_fasta_parse(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">seq1 some description\nACGT\nTTAA\n>seq2\nGG\n\n>seq3\nC\n")
    out = native.parse_fasta_native(str(p))
    assert out == [("seq1", b"ACGTTTAA"), ("seq2", b"GG"), ("seq3", b"C")]


def test_fasta_matches_python(tmp_path):
    from seqrush_tpu.sequences import load_fasta

    p = tmp_path / "t.fa"
    p.write_text(">a x\nACGTAC\nGT\n>b\nTTTT\n")
    seqs = load_fasta(str(p))
    assert [s.id for s in seqs.sequences] == ["a", "b"]
    assert seqs[0].bytes == b"ACGTACGT"
    assert seqs[1].bytes == b"TTTT"


def test_uf_native_matches_device():
    from seqrush_tpu.ops import unionfind as uf

    rng = np.random.default_rng(3)
    n = 300
    edges = rng.integers(0, n, size=(150, 2)).astype(np.int32)
    dev = np.asarray(uf.unite_edges(uf.create(n), edges[:, 0], edges[:, 1]))
    host = np.arange(n, dtype=np.int32)
    native.uf_unite_bulk_native(host, edges[:, 0], edges[:, 1])
    # representative arrays identical (both min-root, fully compressed)
    # note: uf_unite_bulk_native mutates in place but returns compressed copy path
    lib_parent = host  # compressed in place by the wrapper
    assert (dev == lib_parent).all()


def test_backtrace_native_matches_python():
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    PEN = Penalties(5, 8, 2, 24, 1)
    base = bases[rng.integers(0, 4, size=80)].tobytes()
    alt = bytearray(base)
    alt[20] = bases[(alt[20] + 1) % 4]
    del alt[50:55]
    pairs = [(base, bytes(alt)), (bytes(alt), base)]
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    Q, T, qlens, tlens = wfa.pack_batch(qs, ts)
    scores, hists = wfa.wfa_align_device(
        Q, T, qlens, tlens, np.full(2, 500, np.int32),
        mismatch=5, o1=8, e1=2, o2=24, e2=1, smax=500, band=32, keep_history=True,
    )
    scores = np.asarray(scores)
    hists = {k: np.asarray(v) for k, v in hists.items()}
    for b in range(2):
        h = {k: v[b] for k, v in hists.items()}
        nat = native.backtrace_native(h, int(scores[b]), int(qlens[b]), int(tlens[b]), 32, 5, 8, 2, 24, 1)
        # force the python path by calling the module-level spec directly
        import seqrush_tpu.native as nmod

        saved = nmod.backtrace_native
        try:
            nmod.backtrace_native = lambda *a, **k: None
            py = wfa.backtrace_pair(h, int(scores[b]), int(qlens[b]), int(tlens[b]), 32, PEN)
        finally:
            nmod.backtrace_native = saved
        assert nat == py


def test_chain_anchors_native_matches_python():
    """The C++ chaining DP is bit-identical to the python spec (same
    arithmetic, same first-max tie-breaking) across random anchor sets,
    including repeat-like multi-diagonal anchors."""
    import numpy as np

    from seqrush_tpu.native import chain_anchors_native, get_lib
    from seqrush_tpu.ops import anchors as am

    if get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(4)
    for trial in range(8):
        n = int(rng.integers(1, 300))
        # mix diagonal-ish anchors with random repeat noise
        qs = np.sort(rng.integers(0, 3000, size=n))
        ts = qs + rng.integers(-50, 50, size=n)
        noise = rng.integers(0, 3000, size=(max(n // 4, 1), 2))
        a = np.concatenate([np.stack([qs, np.abs(ts)], axis=1), noise])
        a = a[np.lexsort((a[:, 1], a[:, 0]))].astype(np.int64)
        idx = chain_anchors_native(a, 15, 5000, 2000)
        assert idx is not None
        # python spec on the same sorted array
        n2 = a.shape[0]
        f = np.full(n2, 15.0)
        pred = np.full(n2, -1, dtype=np.int64)
        for i in range(n2):
            qi, ti = a[i]
            j0 = max(0, i - 64)
            js = np.arange(j0, i)
            if js.size == 0:
                continue
            qj = a[js, 0]
            tj = a[js, 1]
            ok = (qj < qi) & (tj < ti) & (qi - qj <= 5000) & (ti - tj <= 5000)
            skew = np.abs((qi - qj) - (ti - tj))
            ok &= skew <= 2000
            if not ok.any():
                continue
            gain = f[js] + 15 - 0.05 * skew - 0.01 * np.maximum(qi - qj, ti - tj)
            gain = np.where(ok, gain, -np.inf)
            best = int(np.argmax(gain))
            if gain[best] > f[i]:
                f[i] = gain[best]
                pred[i] = js[best]
        end = int(np.argmax(f))
        chain = []
        while end >= 0:
            chain.append(end)
            end = int(pred[end])
        chain.reverse()
        assert list(idx) == chain, f"trial {trial}"


@pytest.mark.parametrize("two_piece", [True, False])
def test_window_dp_native_exact_vs_device_kernel(two_piece):
    """Host C++ window DP (the anchored route's / sweepga gap fill's
    small-window engine): optimal scores must equal the device kernel's
    full-band scores; CIGARs must be valid ('='/'X' correct, consumption
    exact, run-cost == reported score)."""
    from seqrush_tpu.ops import nw

    pen = Penalties(5, 8, 2, 24, 1) if two_piece else Penalties(5, 8, 2, None, None)
    rng = np.random.default_rng(42 + two_piece)
    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    qs, ts = [], []
    for _ in range(60):
        L = int(rng.integers(1, 90))
        q = rng.integers(0, 4, size=L).astype(np.uint8)
        t = bytearray(q.tobytes())
        for pos in rng.integers(0, L, size=max(1, L // 8)):
            t[pos] = rng.integers(0, 4)
        t = np.frombuffer(bytes(t), np.uint8).copy()
        k = int(rng.integers(0, 4))
        if k == 1 and L > 10:
            t = np.delete(t, slice(2, 2 + int(rng.integers(1, 6))))
        if k == 2:
            t = np.insert(t, int(rng.integers(0, L)),
                          rng.integers(0, 4, size=int(rng.integers(1, 6))).astype(np.uint8))
        if k == 3 and L > 20:
            a, b = L // 4, 3 * L // 4
            t[a:b] = np.array([comp[int(x)] for x in t[a:b]][::-1], np.uint8)
        qs.append(q)
        ts.append(t)
    qs += [np.zeros(0, np.uint8), np.array([1], np.uint8)]
    ts += [np.array([2, 3], np.uint8), np.zeros(0, np.uint8)]
    out = native.window_dp_native(qs, ts, pen, threads=4)
    if out is None:
        pytest.skip("native toolchain unavailable")
    scores, items_all = out
    for w, (q, t) in enumerate(zip(qs, ts)):
        items = items_all[w]
        assert sum(n for n, op in items if op in "=XI") == q.size
        assert sum(n for n, op in items if op in "=XD") == t.size
        qi = ti = cost = 0
        for n, op in items:
            if op in "=X":
                eq = q[qi : qi + n] == t[ti : ti + n]
                assert eq.all() if op == "=" else not eq.any()
                cost += 0 if op == "=" else n * pen.mismatch
                qi += n
                ti += n
            else:
                g1 = pen.gap1_open + n * pen.gap1_extend
                cost += (
                    min(g1, pen.gap2_open + n * pen.gap2_extend)
                    if pen.two_piece
                    else g1
                )
                qi, ti = (qi + n, ti) if op == "I" else (qi, ti + n)
        assert cost == scores[w]
    # optimality: device kernel at full band
    B = len(qs)
    Bp = 1 << max(3, (B - 1).bit_length())
    lq = max(max(q.size for q in qs), 1)
    lt = max(max(t.size for t in ts), 1)
    Q = np.full((Bp, lq), nw.QPAD, np.uint8)
    T = np.full((Bp, lt), nw.TPAD, np.uint8)
    qlens = np.zeros(Bp, np.int32)
    tlens = np.zeros(Bp, np.int32)
    for b, (q, t) in enumerate(zip(qs, ts)):
        Q[b, : q.size] = q
        T[b, : t.size] = t
        qlens[b], tlens[b] = q.size, t.size
    ref, _ = nw.nw_align_device(
        Q, T, qlens, tlens, mismatch=5, o1=8, e1=2,
        o2=24 if two_piece else -1, e2=1 if two_piece else -1,
        band=max(lq, lt) + 1, tmax=((lq + lt + 2) + 255) // 256 * 256,
        with_traceback=False,
    )
    assert (np.asarray(ref)[:B] == np.asarray(scores)).all()
