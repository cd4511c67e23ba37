"""Run-length traceback emission (nw_align_with_runs / decode_runs_batch):
bit-parity with the per-step opcode path, overflow retry, length-split
re-merge, and runner integration."""

import numpy as np
import pytest

from seqrush_tpu.align.runner import RunnerConfig, WfaAligner
from seqrush_tpu.ops import nw
from seqrush_tpu.pos import encode_bases
from seqrush_tpu.scores import AlignmentScores
from seqrush_tpu.sequences import make_sequence_set

KW = dict(mismatch=5, o1=8, e1=2, o2=24, e2=1)


def _pack(pairs):
    qs = [encode_bases(q) for q, _ in pairs]
    ts = [encode_bases(t) for _, t in pairs]
    lq = max(q.size for q in qs)
    lt = max(t.size for t in ts)
    Q = np.stack(
        [np.concatenate([q, np.full(lq - q.size, nw.QPAD, np.uint8)]) for q in qs]
    )
    T = np.stack(
        [np.concatenate([t, np.full(lt - t.size, nw.TPAD, np.uint8)]) for t in ts]
    )
    qlens = np.array([q.size for q in qs], np.int32)
    tlens = np.array([t.size for t in ts], np.int32)
    return Q, T, qlens, tlens, qs, ts


def _mutate(rng, s, n_snp, n_indel):
    bases = b"ACGT"
    s = bytearray(s)
    for pos in rng.integers(0, len(s), size=n_snp):
        s[pos] = bases[rng.integers(0, 4)]
    for _ in range(n_indel):
        pos = int(rng.integers(0, max(1, len(s) - 20)))
        ln = int(rng.integers(1, 9))
        if rng.random() < 0.5:
            del s[pos : pos + ln]
        else:
            s[pos:pos] = bytes(bases[rng.integers(0, 4)] for _ in range(ln))
    return bytes(s)


def test_runs_parity_with_opcodes():
    """Same walk, different emission: scores and CIGARs must be identical."""
    rng = np.random.default_rng(11)
    base = bytes(b"ACGT"[k] for k in rng.integers(0, 4, size=400))
    pairs = [(base, base)]
    for k in range(7):
        pairs.append((base, _mutate(rng, base, 8 + k, 2 + k % 3)))
    pairs.append((base[:350], base))  # length-different pair
    pairs.append((base, base[:310]))
    Q, T, qlens, tlens, qs, ts = _pack(pairs)
    band = 127
    tmax = int((qlens + tlens).max())

    s_ops, packed = nw.nw_align_with_opcodes(
        Q, T, qlens, tlens, band=band, tmax=tmax, **KW
    )
    ops = nw.unpack_opcodes(np.asarray(packed), np.asarray(packed).shape[1] * 4)
    items_ops = nw.decode_batch(ops, qs, ts)

    s_runs, tokens, counts = nw.nw_align_with_runs(
        Q, T, qlens, tlens, band=band, tmax=tmax, **KW
    )
    counts = np.asarray(counts)
    assert (counts <= nw.RUN_MAX).all()
    items_runs = nw.decode_runs_batch(np.asarray(tokens), counts, qs, ts)

    np.testing.assert_array_equal(np.asarray(s_ops), np.asarray(s_runs))
    for b in range(len(pairs)):
        assert items_runs[b] == items_ops[b], f"pair {b}"


def test_runs_counts_and_identical_pair():
    base = b"ACGTACGTAC" * 20
    Q, T, qlens, tlens, qs, ts = _pack([(base, base)])
    _, tokens, counts = nw.nw_align_with_runs(
        Q, T, qlens, tlens, band=63, tmax=2 * len(base), **KW
    )
    assert int(np.asarray(counts)[0]) == 1
    items = nw.decode_runs_batch(np.asarray(tokens), np.asarray(counts), qs, ts)
    assert items[0] == [(len(base), "=")]


def test_runs_overflow_signal():
    """counts > run_max marks truncation (callers must retry via opcodes)."""
    rng = np.random.default_rng(5)
    base = bytes(b"ACGT"[k] for k in rng.integers(0, 4, size=300))
    mut = _mutate(rng, base, 0, 12)  # ~12 indels -> ~25 M/I/D runs
    Q, T, qlens, tlens, qs, ts = _pack([(base, mut)])
    tmax = int((qlens + tlens).max())
    _, _, counts = nw.nw_align_with_runs(
        Q, T, qlens, tlens, band=127, tmax=tmax, run_max=4, **KW
    )
    assert int(np.asarray(counts)[0]) > 4


def test_run_length_split_remerges(monkeypatch):
    """Tokens cap run lengths at 14 bits; the host decoder re-merges split
    runs (exercised here by shrinking the cap)."""
    monkeypatch.setattr(nw, "_RUN_LEN_MAX", 7)
    # _RUN_LEN_MAX is baked in at trace time: drop any cached compilation of
    # this shape so the patched cap actually takes effect (ADVICE r2).
    import jax

    jax.clear_caches()
    base = b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACA"  # 39 bases, unique shape
    Q, T, qlens, tlens, qs, ts = _pack([(base, base)])
    _, tokens, counts = nw.nw_align_with_runs(
        Q, T, qlens, tlens, band=31, tmax=2 * len(base), **KW
    )
    assert int(np.asarray(counts)[0]) == -(-len(base) // 7)
    items = nw.decode_runs_batch(np.asarray(tokens), np.asarray(counts), qs, ts)
    assert items[0] == [(len(base), "=")]


def test_blocked_walk_parity(monkeypatch):
    """WALK_BLOCK (blocked-stripe walk: S traceback rows per scan step,
    stripe extraction by one int8 dot) is a pure schedule change — scores,
    run tokens, counts, and opcodes must be bit-identical to the per-row
    walk on a workload covering SNPs, multi-indels, two-piece gaps, and
    length-different pairs."""
    import jax

    rng = np.random.default_rng(21)
    base = bytes(b"ACGT"[k] for k in rng.integers(0, 4, size=420))
    pairs = [(base, base)]
    for k in range(5):
        pairs.append((base, _mutate(rng, base, 6 + k, 1 + k % 4)))
    # large indel (two-piece gap regime) and length-different pairs
    big = bytearray(base)
    del big[100:190]
    pairs.append((base, bytes(big)))
    pairs.append((base[:352], base))
    Q, T, qlens, tlens, qs, ts = _pack(pairs)
    band = 127
    tmax = 896  # multiple of 16: the blocked walk engages at S=16

    ref = {}
    for emit in ("runs", "ops"):
        if emit == "runs":
            s, tok, cnt = nw.nw_align_with_runs(
                Q, T, qlens, tlens, band=band, tmax=tmax, **KW
            )
            ref[emit] = (np.asarray(s), np.asarray(tok), np.asarray(cnt))
        else:
            s, packed = nw.nw_align_with_opcodes(
                Q, T, qlens, tlens, band=band, tmax=tmax, **KW
            )
            ref[emit] = (np.asarray(s), np.asarray(packed))

    monkeypatch.setattr(nw, "WALK_BLOCK", 16)
    # trace-time flag: drop cached compilations so it takes effect
    jax.clear_caches()
    try:
        s, tok, cnt = nw.nw_align_with_runs(
            Q, T, qlens, tlens, band=band, tmax=tmax, **KW
        )
        np.testing.assert_array_equal(ref["runs"][0], np.asarray(s))
        np.testing.assert_array_equal(ref["runs"][1], np.asarray(tok))
        np.testing.assert_array_equal(ref["runs"][2], np.asarray(cnt))
        s, packed = nw.nw_align_with_opcodes(
            Q, T, qlens, tlens, band=band, tmax=tmax, **KW
        )
        np.testing.assert_array_equal(ref["ops"][0], np.asarray(s))
        np.testing.assert_array_equal(ref["ops"][1], np.asarray(packed))
    finally:
        jax.clear_caches()  # don't leak blocked-walk compilations


def test_runner_emit_modes_agree():
    """End-to-end runner parity between emissions on a mixed workload."""
    rng = np.random.default_rng(3)
    base = bytes(b"ACGT"[k] for k in rng.integers(0, 4, size=600))
    recs = [("s0", base)]
    for k in range(1, 5):
        recs.append((f"s{k}", _mutate(rng, base, 12, 3)))
    seqs = make_sequence_set(recs)
    pairs = np.array([(i, j) for i in range(5) for j in range(5) if i != j])
    out = {}
    for emit in ("runs", "ops"):
        cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), emit=emit)
        res = WfaAligner(seqs, cfg).align_pairs(pairs)
        out[emit] = {(r.query_idx, r.target_idx): (r.score, r.cigar) for r in res}
    assert out["runs"] == out["ops"]


def test_runner_run_overflow_retries(monkeypatch):
    """A pair whose walk overflows RUN_MAX retries via opcodes and still
    returns a correct alignment."""
    monkeypatch.setattr(nw, "RUN_MAX", 4)
    rng = np.random.default_rng(9)
    base = bytes(b"ACGT"[k] for k in rng.integers(0, 4, size=300))
    mut = _mutate(rng, base, 4, 8)
    seqs = make_sequence_set([("a", base), ("b", mut)])
    cfg = RunnerConfig(scores=AlignmentScores.parse("0,5,8,2,24,1"), emit="auto")
    al = WfaAligner(seqs, cfg)
    res = al.align_pairs(np.array([[0, 1]]))
    assert len(res) == 1
    assert al.stats["run_overflows"] >= 1
    # CIGAR consumes both sequences fully
    qc = sum(n for n, op in res[0].cigar if op in "=XI")
    tc = sum(n for n, op in res[0].cigar if op in "=XD")
    assert (qc, tc) == (len(base), len(mut))
