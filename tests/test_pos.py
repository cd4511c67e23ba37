"""Pos/Handle encoding tests — ported behavior from reference pos.rs tests
(/root/reference/src/pos.rs:89-160) plus array semantics."""

import numpy as np

from seqrush_tpu.pos import (
    decr_pos,
    encode_bases,
    flip_orientation,
    handle_flip,
    handle_is_rev,
    handle_node,
    incr_pos,
    is_rev,
    make_handle,
    make_pos,
    pos_offset,
    reverse_complement,
)


def test_position_encoding():
    p = make_pos(100, False)
    assert pos_offset(p) == 100 and not is_rev(p)
    p = make_pos(100, True)
    assert pos_offset(p) == 100 and is_rev(p)


def test_position_increment():
    assert pos_offset(incr_pos(make_pos(10, False))) == 11
    assert not is_rev(incr_pos(make_pos(10, False)))
    nxt = incr_pos(make_pos(10, True))
    assert pos_offset(nxt) == 9 and is_rev(nxt)


def test_position_decrement():
    assert pos_offset(decr_pos(make_pos(10, False))) == 9
    prev = decr_pos(make_pos(10, True))
    assert pos_offset(prev) == 11 and is_rev(prev)


def test_flip_orientation():
    p = make_pos(50, False)
    r = flip_orientation(p)
    assert pos_offset(r) == 50 and is_rev(r)
    assert flip_orientation(r) == p


def test_boundary_conditions():
    assert pos_offset(decr_pos(make_pos(0, False))) == 0
    assert pos_offset(incr_pos(make_pos(0, True))) == 0


def test_vectorized_pos():
    offs = np.arange(10, dtype=np.int64)
    ps = make_pos(offs, np.zeros(10, dtype=bool))
    assert (pos_offset(ps) == offs).all()
    nxt = incr_pos(ps)
    assert (pos_offset(nxt) == offs + 1).all()


def test_handles():
    h = make_handle(42, False)
    assert handle_node(h) == 42 and not handle_is_rev(h)
    assert handle_is_rev(handle_flip(h))
    assert handle_flip(handle_flip(h)) == h


def test_reverse_complement():
    assert reverse_complement(b"ATCG").tobytes() == b"CGAT"
    assert reverse_complement(b"AAAA").tobytes() == b"TTTT"
    assert reverse_complement(b"GCTA").tobytes() == b"TAGC"
    assert reverse_complement(b"N").tobytes() == b"N"


def test_encode():
    codes = encode_bases(b"ACGTN")
    assert list(codes) == [0, 1, 2, 3, 4]
    # case-sensitive: lowercase keeps raw byte values (reference compares
    # raw bytes, so 'a' never matches 'A')
    lower = encode_bases(b"acgtn")
    assert list(lower) == [ord(c) for c in "acgtn"]


def test_rc_codes_roundtrip():
    from seqrush_tpu.pos import reverse_complement_codes

    codes = encode_bases(b"ACGTNacgtn")
    rc2 = reverse_complement_codes(reverse_complement_codes(codes))
    assert (rc2 == codes).all()
    # code-space RC agrees with byte-space RC
    byte_rc = encode_bases(reverse_complement(b"ACGTNacgtn"))
    assert (reverse_complement_codes(codes) == byte_rc).all()
