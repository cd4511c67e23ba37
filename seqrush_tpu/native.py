"""ctypes loader for the native runtime library (csrc/seqrush_native.cpp).

Compiles on demand with g++ into build/ (cached by source hash) and degrades
gracefully: every consumer has a pure-Python fallback, so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "seqrush_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "build")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _compile() -> str | None:
    try:
        with open(_SRC, "rb") as fh:
            digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    except OSError:
        return None
    so_path = os.path.join(_BUILD_DIR, f"libseqrush_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so_path + ".tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
    except Exception:
        return None
    return so_path


def get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        so = _compile()
        if so is None:
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _load_failed = True
            return None
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.fasta_stat.argtypes = [ctypes.c_char_p, c_i64p, c_i64p, c_i64p]
        lib.fasta_stat.restype = ctypes.c_int64
        lib.fasta_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            c_i64p,
            ctypes.POINTER(ctypes.c_uint8),
            c_i64p,
        ]
        lib.fasta_parse.restype = ctypes.c_int64
        lib.uf_unite_bulk.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.uf_compress.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.wfa_backtrace.argtypes = [
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.wfa_backtrace.restype = ctypes.c_int64
        lib.nw_traceback.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.nw_traceback.restype = ctypes.c_int64
        lib.chain_anchors.argtypes = [
            c_i64p,
            c_i64p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            c_i64p,
        ]
        lib.chain_anchors.restype = ctypes.c_int64
        lib.chain_pairs.argtypes = [
            c_i64p, c_i64p, c_i64p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            c_i64p, c_i64p, c_i64p, c_i64p, c_i64p,
        ]
        lib.chain_pairs.restype = ctypes.c_int64
        lib.window_dp.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), c_i64p,
            ctypes.POINTER(ctypes.c_uint8), c_i64p,
            ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), c_i64p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            c_i64p,
        ]
        lib.window_dp.restype = ctypes.c_int64
        lib.stitch_records.argtypes = [
            c_i64p, c_i64p, c_i64p, c_i64p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            c_i64p, c_i64p,
            ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            c_i64p, c_i64p,
        ]
        lib.stitch_records.restype = ctypes.c_int64
        _lib = lib
        return _lib


def _i16p(a: np.ndarray | None):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_int16))
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


def parse_fasta_native(path: str) -> list[tuple[str, bytes]]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = ctypes.c_int64()
    total = ctypes.c_int64()
    nlen = ctypes.c_int64()
    if lib.fasta_stat(path.encode(), ctypes.byref(n), ctypes.byref(total), ctypes.byref(nlen)) != 0:
        raise OSError(f"cannot read {path}")
    n_seqs = n.value
    names = ctypes.create_string_buffer(max(nlen.value, 1))
    name_offs = np.zeros(max(n_seqs, 1), dtype=np.int64)
    data = np.zeros(max(total.value, 1), dtype=np.uint8)
    seq_offs = np.zeros(max(n_seqs, 1), dtype=np.int64)
    got = lib.fasta_parse(
        path.encode(),
        names,
        name_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seq_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if got != n_seqs:
        raise RuntimeError("fasta parse inconsistency")
    out = []
    nprev = dprev = 0
    raw_names = names.raw
    for k in range(n_seqs):
        name = raw_names[nprev : name_offs[k]].decode()
        seq = data[dprev : seq_offs[k]].tobytes()
        out.append((name, seq))
        nprev, dprev = int(name_offs[k]), int(seq_offs[k])
    return out


def uf_unite_bulk_native(parent: np.ndarray, u: np.ndarray, v: np.ndarray) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    parent = np.ascontiguousarray(parent, dtype=np.int32)
    u = np.ascontiguousarray(u, dtype=np.int32)
    v = np.ascontiguousarray(v, dtype=np.int32)
    lib.uf_unite_bulk(
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        parent.size,
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        u.size,
    )
    lib.uf_compress(parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), parent.size)


def backtrace_native(
    hist: dict[str, np.ndarray],
    score: int,
    qlen: int,
    tlen: int,
    band: int,
    mismatch: int,
    o1: int,
    e1: int,
    o2: int,
    e2: int,
) -> list[tuple[int, str]] | None:
    """C++ backtrace; returns run-length CIGAR items or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    HM = np.ascontiguousarray(hist["M"], dtype=np.int16)
    HI1 = np.ascontiguousarray(hist["I1"], dtype=np.int16)
    HD1 = np.ascontiguousarray(hist["D1"], dtype=np.int16)
    HI2 = np.ascontiguousarray(hist["I2"], dtype=np.int16) if "I2" in hist else None
    HD2 = np.ascontiguousarray(hist["D2"], dtype=np.int16) if "D2" in hist else None
    srows, ndiag = HM.shape
    out = np.zeros(qlen + tlen + 2, dtype=np.uint8)
    n = lib.wfa_backtrace(
        _i16p(HM),
        _i16p(HI1),
        _i16p(HD1),
        _i16p(HI2),
        _i16p(HD2),
        srows,
        ndiag,
        score,
        qlen,
        tlen,
        band,
        mismatch,
        o1,
        e1,
        o2 if HI2 is not None else -1,
        e2 if HI2 is not None else -1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n < 0:
        return None
    ops = out[:n].tobytes().decode()
    items: list[tuple[int, str]] = []
    for op in ops:
        if items and items[-1][1] == op:
            items[-1] = (items[-1][0] + 1, op)
        else:
            items.append((1, op))
    return items


def nw_traceback_native(
    tb: np.ndarray, qlen: int, tlen: int, band: int
) -> list[tuple[int, str]] | None:
    """C++ banded-Gotoh traceback; returns run-length items with 'M' runs
    (resolved to '='/'X' by the caller) or None on failure/unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tb = np.ascontiguousarray(tb, dtype=np.uint8)
    rows, W = tb.shape
    out = np.zeros(qlen + tlen + 2, dtype=np.uint8)
    n = lib.nw_traceback(
        tb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows,
        W,
        qlen,
        tlen,
        band,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n < 0:
        return None
    ops = out[:n].tobytes().decode()
    items: list[tuple[int, str]] = []
    for op in ops:
        if items and items[-1][1] == op:
            items[-1] = (items[-1][0] + 1, op)
        else:
            items.append((1, op))
    return items


def chain_anchors_native(
    a_sorted: np.ndarray, k: int, max_gap: int, max_skew: int
) -> np.ndarray | None:
    """C++ colinear-chaining DP over (q, t)-sorted anchors [n, 2]; returns
    the best chain's row indices (ascending) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = a_sorted.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    qs = np.ascontiguousarray(a_sorted[:, 0], dtype=np.int64)
    ts = np.ascontiguousarray(a_sorted[:, 1], dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    m = lib.chain_anchors(
        qs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        k,
        max_gap,
        max_skew,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if m < 0:
        return None
    return out[:m]


def chain_pairs_native(
    qs: np.ndarray,
    ts: np.ndarray,
    offs: np.ndarray,
    k: int,
    max_gap: int,
    max_skew: int,
    max_chains: int,
    min_matched: int,
):
    """Batched multi-chain extraction + run merging for all pairs in one
    C++ call (bit-identical to ops/anchors.py chain_anchors_multi +
    chain_to_runs per pair).  qs/ts are all pairs' anchors concatenated,
    each pair's block sorted by (q, t); offs [P+1] delimits pairs.
    Returns (chain_pair [C], chain_off [C+1], runs_q, runs_t, runs_len)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = int(qs.size)
    n_pairs = int(offs.size) - 1
    qs = np.ascontiguousarray(qs, dtype=np.int64)
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    runs_q = np.zeros(max(n, 1), dtype=np.int64)
    runs_t = np.zeros(max(n, 1), dtype=np.int64)
    runs_len = np.zeros(max(n, 1), dtype=np.int64)
    cap_chains = max(n_pairs * max_chains, 1)
    chain_pair = np.zeros(cap_chains, dtype=np.int64)
    chain_off = np.zeros(cap_chains + 1, dtype=np.int64)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    c = lib.chain_pairs(
        p(qs), p(ts), p(offs), n_pairs, k, max_gap, max_skew,
        max_chains, min_matched,
        p(runs_q), p(runs_t), p(runs_len), p(chain_pair), p(chain_off),
    )
    nr = int(chain_off[c])
    return chain_pair[:c], chain_off[: c + 1], runs_q[:nr], runs_t[:nr], runs_len[:nr]


_OP_CHARS = ("=", "X", "I", "D")


def window_dp_native(
    qs: list[np.ndarray],
    ts: list[np.ndarray],
    pen,
    threads: int = 8,
    flat: bool = False,
):
    """Batched exact two-piece-affine window DP on the host (C++, threaded).

    The anchored wide route's and the sweepga gap fill's divergence-core
    windows are tiny irregular workloads — a dispatch round trip + compile
    shape each on a (tunneled) TPU, microseconds in native code.  Scores
    are the exact global optima (fuzz-pinned against the device kernel in
    tests/test_native.py); CIGARs use the kernels' walk-order tie
    preference (diag, D1, I1, D2, I2) but may differ from the device walk
    in equal-score tie cases (pipeline-permitted, same policy as the
    row-major/fold kernels).

    Returns (scores [n] int64, items list of run-length lists) or None
    when the native library is unavailable.  With ``flat=True`` the items
    stay as flat arrays — (scores, ops [uint8], lens [int32], counts [n],
    item_offs [n+1]) — for consumers that feed them straight back into
    native code (stitch_records_native) without materializing Python
    tuples.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(qs)
    if n == 0:
        if flat:
            return (
                np.zeros(0, np.int64),
                np.zeros(0, np.uint8),
                np.zeros(0, np.int32),
                np.zeros(0, np.int64),
                np.zeros(1, np.int64),
            )
        return np.zeros(0, np.int64), []
    # vectorized buffer assembly (a per-window python loop cost ~10 s at
    # 450k windows): sizes via fromiter, one concatenate each
    qoffs = np.zeros(n + 1, np.int64)
    toffs = np.zeros(n + 1, np.int64)
    np.cumsum(np.fromiter((q.size for q in qs), np.int64, n), out=qoffs[1:])
    np.cumsum(np.fromiter((t.size for t in ts), np.int64, n), out=toffs[1:])
    qbuf = (
        np.concatenate(qs) if qoffs[-1] else np.zeros(1, np.uint8)
    ).astype(np.uint8, copy=False)
    tbuf = (
        np.concatenate(ts) if toffs[-1] else np.zeros(1, np.uint8)
    ).astype(np.uint8, copy=False)
    qbuf = np.ascontiguousarray(qbuf)
    tbuf = np.ascontiguousarray(tbuf)
    caps = (qoffs[1:] - qoffs[:-1]) + (toffs[1:] - toffs[:-1]) + 1
    item_offs = np.zeros(n + 1, np.int64)
    item_offs[1:] = np.cumsum(caps)
    scores = np.zeros(n, np.int32)
    ops = np.zeros(max(int(item_offs[-1]), 1), np.uint8)
    lens = np.zeros(max(int(item_offs[-1]), 1), np.int32)
    counts = np.zeros(n, np.int64)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.window_dp(
        u8p(qbuf), i64p(qoffs), u8p(tbuf), i64p(toffs), n,
        pen.mismatch, pen.gap1_open, pen.gap1_extend,
        pen.gap2_open if pen.two_piece else -1,
        pen.gap2_extend if pen.two_piece else -1,
        threads,
        i32p(scores), i64p(item_offs), u8p(ops), i32p(lens), i64p(counts),
    )
    if flat:
        return scores.astype(np.int64), ops, lens, counts, item_offs
    # vectorized item extraction: gather the used (op, len) entries flat,
    # decode ops to chars in one take, then slice per window — the naive
    # per-window comprehension was ~10x slower at tens of thousands of
    # tiny windows
    total = int(counts.sum())
    if total:
        starts = item_offs[:-1]
        flat = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(starts, counts)
        )
        pairs_flat = list(
            zip(
                lens[flat].tolist(),
                np.take(np.array(_OP_CHARS), ops[flat]).tolist(),
            )
        )
    else:
        pairs_flat = []
    bounds = np.cumsum(counts).tolist()
    items = [pairs_flat[a:b] for a, b in zip([0] + bounds[:-1], bounds)]
    return scores.astype(np.int64), items


def stitch_records_native(
    runs_q: np.ndarray,
    runs_t: np.ndarray,
    runs_len: np.ndarray,
    rec_off: np.ndarray,
    gap_ops: np.ndarray,
    gap_lens: np.ndarray,
    gap_off: np.ndarray,
    gap_ids: np.ndarray,
    pen,
):
    """Assemble per-record run-length CIGARs from chain runs + gap fills in
    one C++ call (align/sweep.py stage 3; bit-identical to the Python
    stitch — fuzz-pinned in tests/test_sweep.py).  gap_ids must be sorted
    ascending global run indices (the gap after flat run i has id i).

    Returns (ops [uint8], lens [int32], out_off [R+1], scores [R] int64)
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    R = int(rec_off.size) - 1
    nr = int(rec_off[-1])
    G = int(gap_ids.size)
    cap = 3 * max(nr, 1) + int(gap_off[-1]) + 8
    runs_q = np.ascontiguousarray(runs_q, dtype=np.int64)
    runs_t = np.ascontiguousarray(runs_t, dtype=np.int64)
    runs_len = np.ascontiguousarray(runs_len, dtype=np.int64)
    rec_off = np.ascontiguousarray(rec_off, dtype=np.int64)
    gap_ops = np.ascontiguousarray(gap_ops, dtype=np.uint8)
    gap_lens = np.ascontiguousarray(gap_lens, dtype=np.int32)
    gap_off = np.ascontiguousarray(gap_off, dtype=np.int64)
    gap_ids = np.ascontiguousarray(gap_ids, dtype=np.int64)
    out_ops = np.zeros(cap, np.uint8)
    out_lens = np.zeros(cap, np.int32)
    out_off = np.zeros(R + 1, np.int64)
    out_scores = np.zeros(max(R, 1), np.int64)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    total = lib.stitch_records(
        i64p(runs_q), i64p(runs_t), i64p(runs_len), i64p(rec_off), R,
        u8p(gap_ops), i32p(gap_lens), i64p(gap_off), i64p(gap_ids), G,
        pen.mismatch, pen.gap1_open, pen.gap1_extend,
        pen.gap2_open if pen.two_piece else -1,
        pen.gap2_extend if pen.two_piece else -1,
        u8p(out_ops), i32p(out_lens), i64p(out_off), i64p(out_scores),
    )
    total = int(total)
    return out_ops[:total], out_lens[:total], out_off, out_scores[:R]
