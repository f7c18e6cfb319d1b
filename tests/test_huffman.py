"""Decode-table construction tests (reference: huffman-tree.lisp semantics)."""

import numpy as np
import pytest

from tbz import constants as C
from tbz import errors as E
from tbz import huffman


def decode_with_table(table, kind, bits, nbits_avail=32):
    """Scalar table walk used to validate construction."""
    root = huffman.root_bits(kind)
    e = int(table[bits & ((1 << root) - 1)])
    op = (e >> C.ENTRY_OP_SHIFT) & 7
    if op == C.OP_LINK:
        sub_w = (e >> C.ENTRY_EXTRA_SHIFT) & 0x1F
        base = e >> C.ENTRY_VAL_SHIFT
        e = int(table[base + ((bits >> root) & ((1 << sub_w) - 1))])
        op = (e >> C.ENTRY_OP_SHIFT) & 7
    return op, e & 0xF, (e >> C.ENTRY_EXTRA_SHIFT) & 0x1F, e >> C.ENTRY_VAL_SHIFT


def test_canonical_codes_rfc_example():
    # RFC 1951 §3.2.2 worked example: lengths (3,3,3,3,3,2,4,4) for A..H.
    lens = np.array([3, 3, 3, 3, 3, 2, 4, 4])
    syms, ls, codes = huffman.canonical_codes(lens)
    got = {int(s): (int(l), int(c)) for s, l, c in zip(syms, ls, codes)}
    assert got == {5: (2, 0), 0: (3, 2), 1: (3, 3), 2: (3, 4), 3: (3, 5),
                   4: (3, 6), 6: (4, 14), 7: (4, 15)}


def test_fixed_litlen_decode():
    lit, dist = huffman.fixed_tables()
    # Symbol 0 has 8-bit code 0x30 (00110000 MSB-first) -> stream bits reversed.
    bits = C.bit_reverse(0x30, 8)
    op, nb, extra, val = decode_with_table(lit, huffman.KIND_LITLEN, bits)
    assert (op, nb, val) == (C.OP_LITERAL, 8, 0)
    # End-of-block: 7-bit code 0.
    op, nb, _, _ = decode_with_table(lit, huffman.KIND_LITLEN, 0)
    assert (op, nb) == (C.OP_END, 7)
    # Symbol 280: 8-bit code 0xC0.
    bits = C.bit_reverse(0xC0, 8)
    op, nb, extra, val = decode_with_table(lit, huffman.KIND_LITLEN, bits)
    assert (op, nb) == (C.OP_MATCH, 8)
    assert val == int(C.LENGTH_BASE[280 - 257])
    # Reserved symbol 286 (code 0xC6) must decode as invalid.
    bits = C.bit_reverse(0xC6, 8)
    op, nb, _, _ = decode_with_table(lit, huffman.KIND_LITLEN, bits)
    assert op == C.OP_INVALID and nb == 8
    # Distance code 4 -> base 5, 1 extra bit.
    bits = C.bit_reverse(4, 5)
    op, nb, extra, val = decode_with_table(dist, huffman.KIND_DIST, bits)
    assert (op, nb, extra, val) == (C.OP_MATCH, 5, 1, 5)


def test_exhaustive_roundtrip_fixed():
    """Every fixed litlen code decodes back to its own symbol."""
    lit, _ = huffman.fixed_tables()
    syms, lens, codes = huffman.canonical_codes(C.FIXED_LITLEN_LENGTHS)
    for s, l, c in zip(syms, lens, codes):
        s, l, c = int(s), int(l), int(c)
        stream = C.bit_reverse(c, l)
        # Pad high bits with garbage to check replication.
        for pad in (0, 0x5555 << l & 0x7FFF):
            op, nb, extra, val = decode_with_table(
                lit, huffman.KIND_LITLEN, stream | pad)
            assert nb == l
            if s < 256:
                assert (op, val) == (C.OP_LITERAL, s)
            elif s == 256:
                assert op == C.OP_END
            elif s <= 285:
                assert op == C.OP_MATCH
                assert val == int(C.LENGTH_BASE[s - 257])
            else:
                assert op == C.OP_INVALID


def test_long_codes_two_level():
    """Codes longer than the root require a link walk."""
    # 15-deep comb: lengths 1,2,3,...,14,15,15 over 16 symbols (complete).
    lens = np.array(list(range(1, 15)) + [15, 15])
    table, err = huffman.build_decode_table(lens, huffman.KIND_LITLEN)
    assert err == E.OK
    syms, ls, codes = huffman.canonical_codes(lens)
    for s, l, c in zip(syms, ls, codes):
        s, l, c = int(s), int(l), int(c)
        stream = C.bit_reverse(c, l)
        op, nb, extra, val = decode_with_table(table, huffman.KIND_LITLEN, stream)
        assert nb == l and (op, val) == (C.OP_LITERAL, s)


def test_oversubscribed_rejected():
    lens = np.zeros(288, dtype=np.int64)
    lens[:3] = 1  # three 1-bit codes
    _, err = huffman.build_decode_table(lens, huffman.KIND_LITLEN)
    assert err == E.ERR_BAD_HUFFMAN


def test_incomplete_rejected_unless_single_1bit():
    lens = np.zeros(288, dtype=np.int64)
    lens[0] = 2  # single 2-bit code: incomplete, not allowed
    _, err = huffman.build_decode_table(lens, huffman.KIND_LITLEN)
    assert err == E.ERR_BAD_HUFFMAN
    lens[0] = 1  # single 1-bit code: allowed (zlib semantics)
    table, err = huffman.build_decode_table(lens, huffman.KIND_LITLEN)
    assert err == E.OK
    op, nb, _, val = decode_with_table(table, huffman.KIND_LITLEN, 0)
    assert (op, val) == (C.OP_LITERAL, 0)
    op, _, _, _ = decode_with_table(table, huffman.KIND_LITLEN, 1)
    assert op == C.OP_INVALID
    # ... but never for the code-length alphabet.
    cl = np.zeros(19, dtype=np.int64)
    cl[0] = 1
    _, err = huffman.build_decode_table(cl, huffman.KIND_CODELEN)
    assert err == E.ERR_BAD_HUFFMAN


def test_empty_table_all_invalid():
    lens = np.zeros(30, dtype=np.int64)
    table, err = huffman.build_decode_table(lens, huffman.KIND_DIST)
    assert err == E.OK
    op, _, _, _ = decode_with_table(table, huffman.KIND_DIST, 0)
    assert op == C.OP_INVALID


def test_random_complete_codes_roundtrip():
    """Random valid length sets: every code decodes to its symbol."""
    rng = np.random.default_rng(42)
    for _ in range(50):
        # Build a random complete code by splitting Kraft mass.
        lens = []
        budget = 1 << 15
        n = int(rng.integers(2, 286))
        for i in range(n - 1):
            if budget <= 1:
                break
            max_l = 15
            # pick a length that leaves room for remaining symbols
            l = int(rng.integers(max(1, 15 - int(np.log2(budget))), 16))
            take = 1 << (15 - l)
            if take >= budget:
                l = 15 - int(np.log2(budget)) + 1
                take = 1 << (15 - l)
            budget -= take
            lens.append(l)
        # last symbol absorbs remaining mass exactly if it's a power of two
        while budget:
            l = 15 - int(np.floor(np.log2(budget)))
            lens.append(l)
            budget -= 1 << (15 - l)
        lens = np.array(lens + [0] * 5)
        table, err = huffman.build_decode_table(lens, huffman.KIND_LITLEN)
        assert err == E.OK, lens
        syms, ls, codes = huffman.canonical_codes(lens)
        for s, l, c in zip(syms, ls, codes):
            s, l, c = int(s), int(l), int(c)
            op, nb, extra, val = decode_with_table(
                table, huffman.KIND_LITLEN, C.bit_reverse(c, l))
            assert nb == l
            if s < 256:
                assert (op, val) == (C.OP_LITERAL, s)
