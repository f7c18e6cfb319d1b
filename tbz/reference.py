"""Pure-Python bit-exact DEFLATE frontend + scalar resolver.

This is (a) the in-repo oracle every faster path is judged against, and
(b) the fallback tokenizer when the native frontend is unavailable. It
implements the full behavioral contract of the reference's engine
(deflate.lisp:92-730): stored / static-Huffman / dynamic-Huffman blocks,
all header validation, and exact error semantics — but emits the
two-phase token tape (tape.py) instead of materializing bytes inline.
"""

from __future__ import annotations

import numpy as np

from . import constants as C
from . import errors as E
from . import huffman
from .bitreader import BitReader
from .errors import DeflateError, TruncatedError
from .tape import STORED_FLAG, BlockInfo, FrontendResult, TokenTape

_OP_MASK = 0x7
_EXTRA_MASK = 0x1F


def _decode_symbol(br: BitReader, table: np.ndarray, kind: int):
    """Decode one symbol: returns (op, extra_bits, val).

    Two-level walk per the table protocol in huffman.py. Truncation is
    detected before invalid-code so a short stream reports underrun, not
    corruption (parity with deflate.lisp:361-461's push-back discipline).
    """
    root = huffman.root_bits(kind)
    e = int(table[br.peek(root)])
    op = (e >> C.ENTRY_OP_SHIFT) & _OP_MASK
    if op == C.OP_LINK:
        sub_w = (e >> C.ENTRY_EXTRA_SHIFT) & _EXTRA_MASK
        base = e >> C.ENTRY_VAL_SHIFT
        full = br.peek(root + sub_w)
        e = int(table[base + (full >> root)])
        op = (e >> C.ENTRY_OP_SHIFT) & _OP_MASK
    nbits = e & 0xF
    if br.bits_available() < nbits:
        raise TruncatedError("input underrun mid-code")
    if op == C.OP_INVALID:
        raise DeflateError("invalid Huffman code in stream", E.ERR_INVALID_CODE)
    br.drop(nbits)
    return op, (e >> C.ENTRY_EXTRA_SHIFT) & _EXTRA_MASK, e >> C.ENTRY_VAL_SHIFT


def _read_dynamic_lens(br: BitReader):
    """Parse a dynamic-block header into (lens, hlit, hdist) code-length
    arrays — the table-free form the speculative lane kernel consumes."""
    hlit = br.bits(5) + 257
    hdist = br.bits(5) + 1
    hclen = br.bits(4) + 4
    if hlit > 286 or hdist > 30:
        raise DeflateError("too many length or distance symbols",
                           E.ERR_TOO_MANY_SYMBOLS)
    cl_lens = np.zeros(19, dtype=np.int64)
    for i in range(hclen):
        cl_lens[C.CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl_table, err = huffman.build_decode_table(cl_lens, huffman.KIND_CODELEN)
    if err:
        raise DeflateError("invalid code lengths set", err)

    total = hlit + hdist
    lens = np.zeros(total, dtype=np.int64)
    i = 0
    while i < total:
        _, _, sym = _decode_symbol(br, cl_table, huffman.KIND_CODELEN)
        if sym < 16:
            lens[i] = sym
            i += 1
        elif sym == C.CL_COPY_PREV:
            if i == 0:
                raise DeflateError("repeat with no previous length",
                                   E.ERR_BAD_CL_REPEAT)
            rep = 3 + br.bits(2)
            if i + rep > total:
                raise DeflateError("invalid bit length repeat",
                                   E.ERR_BAD_CL_REPEAT)
            lens[i:i + rep] = lens[i - 1]
            i += rep
        else:
            rep = (3 + br.bits(3)) if sym == C.CL_ZERO_SHORT else (11 + br.bits(7))
            if i + rep > total:
                raise DeflateError("invalid bit length repeat",
                                   E.ERR_BAD_CL_REPEAT)
            i += rep  # lens already zero
    if lens[256] == 0:
        raise DeflateError("missing end-of-block code", E.ERR_BAD_HUFFMAN)
    return lens, hlit, hdist


def _read_dynamic_tables(br: BitReader):
    """Parse a dynamic-block header into litlen/dist decode tables
    (semantics of deflate.lisp:577-668 + huffman-tree.lisp:99-287)."""
    lens, hlit, hdist = _read_dynamic_lens(br)
    lit_table, err = huffman.build_decode_table(lens[:hlit], huffman.KIND_LITLEN)
    if err:
        raise DeflateError("invalid literal/lengths set", err)
    dist_table, err = huffman.build_decode_table(lens[hlit:], huffman.KIND_DIST)
    if err:
        raise DeflateError("invalid distances set", err)
    return lit_table, dist_table


def tokenize_host(data, bit_pos: int = 0, window_len: int = 0,
                  max_out: int | None = None) -> FrontendResult:
    """Tokenize a raw-deflate stream starting at `bit_pos`.

    `window_len` is the number of history bytes available before this
    stream's output (for streaming resume); distances are validated
    against produced + window_len. Raises DeflateError subclasses on
    malformed input.
    """
    br = BitReader(data, bit_pos)
    out_len: list[int] = []
    dist: list[int] = []
    root_val: list[int] = []
    blocks: list[BlockInfo] = []
    produced = 0
    finished = False

    while not finished:
        block_start = br.bit_position()
        tok_start = len(out_len)
        out_start = produced
        bfinal = br.bits(1)
        btype = br.bits(2)
        if btype == C.BTYPE_RESERVED:
            raise DeflateError("invalid block type 3", E.ERR_BAD_BLOCK_TYPE)
        if btype == C.BTYPE_STORED:
            br.align_to_byte()
            ln = br.bits(16)
            nlen = br.bits(16)
            if ln != (~nlen & 0xFFFF):
                raise DeflateError("stored block LEN/NLEN mismatch",
                                   E.ERR_STORED_LEN_MISMATCH)
            if ln:
                off = br.bit_position() >> 3
                br.read_bytes_aligned(ln)  # validates availability
                out_len.append(ln)
                dist.append(0)
                root_val.append(STORED_FLAG | off)
                produced += ln
        else:
            if btype == C.BTYPE_STATIC:
                lit_table, dist_table = huffman.fixed_tables()
            else:
                lit_table, dist_table = _read_dynamic_tables(br)
            while True:
                op, extra, val = _decode_symbol(br, lit_table, huffman.KIND_LITLEN)
                if op == C.OP_LITERAL:
                    out_len.append(1)
                    dist.append(0)
                    root_val.append(val)
                    produced += 1
                elif op == C.OP_END:
                    break
                else:  # OP_MATCH: length, then distance
                    length = val + (br.bits(extra) if extra else 0)
                    dop, dextra, dval = _decode_symbol(br, dist_table,
                                                       huffman.KIND_DIST)
                    assert dop == C.OP_MATCH
                    d = dval + (br.bits(dextra) if dextra else 0)
                    if d > produced + window_len:
                        raise DeflateError("distance too far back",
                                           E.ERR_BAD_DISTANCE)
                    out_len.append(length)
                    dist.append(d)
                    root_val.append(0)
                    produced += length
        blocks.append(BlockInfo(btype=btype, bfinal=bool(bfinal),
                                start_bit=block_start,
                                end_bit=br.bit_position(),
                                token_start=tok_start,
                                token_end=len(out_len),
                                out_start=out_start, out_end=produced))
        if bfinal:
            finished = True
        if max_out is not None and produced >= max_out:
            break

    tape = TokenTape.from_lists(out_len, dist, root_val)
    return FrontendResult(tape=tape, blocks=blocks,
                          end_bit=br.bit_position(), finished=finished)


def resolve_host(tape: TokenTape, data, window: bytes = b"") -> bytes:
    """Scalar token-tape resolver (the oracle for ops/resolve.py).

    Applies the LZ77 copy semantics of deflate.lisp:244-359 including
    overlapping copies and window-crossing back-references.
    """
    data = bytes(data)
    out = bytearray(window)  # history prefix; sliced off at return
    wlen = len(window)
    for ln, d, rv in zip(tape.out_len.tolist(), tape.dist.tolist(),
                         tape.root_val.tolist()):
        if d:
            src = len(out) - d
            if src < 0:
                raise DeflateError("distance too far back", E.ERR_BAD_DISTANCE)
            n = ln
            while n > 0:
                take = min(n, len(out) - src)
                out += out[src:src + take]
                src += take
                n -= take
        elif rv & STORED_FLAG:
            off = rv & (STORED_FLAG - 1)
            out += data[off:off + ln]
        else:
            out.append(rv)
    return bytes(out[wlen:])


def inflate_raw(data, bit_pos: int = 0) -> tuple[bytes, int, bool]:
    """One-shot raw-deflate decode. Returns (bytes, end_bit, finished)."""
    res = tokenize_host(data, bit_pos)
    return resolve_host(res.tape, data), res.end_bit, res.finished
