"""Canonical Huffman decode-table construction.

Parity with the reference's table builder (huffman-tree.lisp:99-287):
histogram, over-/under-subscription validation, canonical code assignment,
and bit-reversed two-level table fill with link entries for codes longer
than the root width. The output is a flat packed-uint32 array (layout in
constants.py) sized by libz's ENOUGH bounds — the same 852/592 bounds the
reference cites (constants.lisp:3-7) — so device kernels decode a symbol
with at most two gathers.

Incompleteness rules mirror zlib's inflate_table (the differential oracle):
an incomplete code is an error unless the alphabet has exactly one used
symbol with a 1-bit code, and never for the code-length alphabet.
"""

from __future__ import annotations

import numpy as np

from . import constants as C
from . import errors as E

KIND_CODELEN = 0
KIND_LITLEN = 1
KIND_DIST = 2

_TABLE_SIZES = {
    KIND_CODELEN: C.ENOUGH_CODELEN,
    KIND_LITLEN: C.ENOUGH_LITLEN,
    KIND_DIST: C.ENOUGH_DIST,
}
_ROOT_BITS = {
    KIND_CODELEN: C.CODELEN_ROOT_BITS,
    KIND_LITLEN: C.LITLEN_ROOT_BITS,
    KIND_DIST: C.DIST_ROOT_BITS,
}


def root_bits(kind: int) -> int:
    return _ROOT_BITS[kind]


def table_size(kind: int) -> int:
    return _TABLE_SIZES[kind]


def _symbol_entry(kind: int, sym: int, nbits: int) -> int:
    """Packed entry for decoding `sym` with an `nbits`-bit code."""
    if kind == KIND_CODELEN:
        return C.pack_entry(C.OP_LITERAL, nbits, 0, sym)
    if kind == KIND_LITLEN:
        if sym < 256:
            return C.pack_entry(C.OP_LITERAL, nbits, 0, sym)
        if sym == C.END_OF_BLOCK:
            return C.pack_entry(C.OP_END, nbits, 0, 0)
        if sym <= 285:
            i = sym - 257
            return C.pack_entry(C.OP_MATCH, nbits,
                                int(C.LENGTH_EXTRA[i]), int(C.LENGTH_BASE[i]))
        # 286/287: reserved — present in the fixed tree but invalid to use.
        return C.pack_entry(C.OP_INVALID, nbits, 0, 0)
    # KIND_DIST
    if sym <= 29:
        return C.pack_entry(C.OP_MATCH, nbits,
                            int(C.DIST_EXTRA[sym]), int(C.DIST_BASE[sym]))
    return C.pack_entry(C.OP_INVALID, nbits, 0, 0)


def canonical_codes(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Canonical code assignment (RFC 1951 §3.2.2).

    Returns (symbols, lens, codes) for used symbols in canonical order.
    Assumes lengths are not over-subscribed.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    counts = np.bincount(lengths, minlength=C.MAX_CODE_LENGTH + 1)
    next_code = np.zeros(C.MAX_CODE_LENGTH + 2, dtype=np.int64)
    code = 0
    for l in range(1, C.MAX_CODE_LENGTH + 1):
        code = (code + int(counts[l - 1] if l > 1 else 0)) << 1
        next_code[l] = code
    order = np.argsort(lengths, kind="stable")
    order = order[lengths[order] > 0]
    lens = lengths[order]
    codes = np.zeros(len(order), dtype=np.int64)
    assign = next_code.copy()
    for i, l in enumerate(lens):
        codes[i] = assign[l]
        assign[l] += 1
    return order, lens, codes


def build_decode_table(lengths: np.ndarray, kind: int) -> tuple[np.ndarray, int]:
    """Build a two-level decode table from per-symbol code lengths.

    Returns (table, err). `table` is a uint32 array of the fixed ENOUGH
    size for `kind`; unused slots hold OP_INVALID entries. `err` is an
    errors.* code (OK on success). The table is only meaningful if err==OK.

    Decode protocol (two gathers max):
      e = table[bits & ((1<<root)-1)]
      if op(e) == OP_LINK: e = table[val(e) + ((bits >> root) & ((1<<extra(e))-1))]
      consume nbits(e); then read extra(e) raw bits if OP_MATCH.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    size = _TABLE_SIZES[kind]
    root = _ROOT_BITS[kind]
    table = np.full(size, C.INVALID_ENTRY, dtype=np.uint32)

    counts = np.bincount(lengths, minlength=C.MAX_CODE_LENGTH + 1)
    used = int(counts[1:].sum())
    if used == 0:
        # No symbols at all: every decode attempt hits an invalid entry.
        return table, E.OK
    max_len = int(np.max(np.nonzero(counts[1:])[0])) + 1

    # Kraft validation (reference: huffman-tree.lisp:107-124).
    left = 1
    for l in range(1, C.MAX_CODE_LENGTH + 1):
        left = (left << 1) - int(counts[l])
        if left < 0:
            return table, E.ERR_BAD_HUFFMAN  # over-subscribed
    if left > 0:
        # Incomplete: allowed only for a single 1-bit code outside the
        # code-length alphabet (zlib inflate_table semantics).
        if kind == KIND_CODELEN or max_len != 1:
            return table, E.ERR_BAD_HUFFMAN

    syms, lens, codes = canonical_codes(lengths)
    revs = np.array([C.bit_reverse(int(c), int(l)) for c, l in zip(codes, lens)],
                    dtype=np.int64)

    # Short codes: replicate across the root region.
    for sym, l, rev in zip(syms, lens, revs):
        l = int(l)
        if l > root:
            continue
        entry = np.uint32(_symbol_entry(kind, int(sym), l))
        table[np.arange(rev, 1 << root, 1 << l)] = entry

    # Long codes: subtables keyed by the low `root` stream bits.
    long_mask = lens > root
    if np.any(long_mask):
        prefixes = revs[long_mask] & ((1 << root) - 1)
        widths: dict[int, int] = {}
        for p, l in zip(prefixes, lens[long_mask]):
            widths[int(p)] = max(widths.get(int(p), 0), int(l) - root)
        sub_base: dict[int, int] = {}
        off = 1 << root
        for p in sorted(widths):
            w = widths[p]
            if off + (1 << w) > size:
                return table, E.ERR_BAD_HUFFMAN  # unreachable per ENOUGH
            sub_base[p] = off
            table[p] = np.uint32(C.pack_entry(C.OP_LINK, root, w, off))
            off += 1 << w
        for sym, l, rev in zip(syms[long_mask], lens[long_mask], revs[long_mask]):
            l, rev = int(l), int(rev)
            p = rev & ((1 << root) - 1)
            base, w = sub_base[p], widths[p]
            entry = np.uint32(_symbol_entry(kind, int(sym), l))
            sub_idx = rev >> root
            table[base + np.arange(sub_idx, 1 << w, 1 << (l - root))] = entry

    return table, E.OK


def build_decode_table_checked(lengths: np.ndarray, kind: int) -> np.ndarray:
    table, err = build_decode_table(lengths, kind)
    E.raise_for_code(err)
    return table


_fixed_cache: tuple[np.ndarray, np.ndarray] | None = None


def fixed_tables() -> tuple[np.ndarray, np.ndarray]:
    """The RFC fixed litlen/dist decode tables, built once
    (reference: ht-constants.lisp:9-32)."""
    global _fixed_cache
    if _fixed_cache is None:
        lit = build_decode_table_checked(C.FIXED_LITLEN_LENGTHS, KIND_LITLEN)
        dist = build_decode_table_checked(C.FIXED_DIST_LENGTHS, KIND_DIST)
        _fixed_cache = (lit, dist)
    return _fixed_cache
