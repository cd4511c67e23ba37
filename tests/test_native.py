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
