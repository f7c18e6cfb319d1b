"""Speculative multi-lane decode prototype: results must be EXACT
regardless of lane synchronization (fallback guarantees), and sync rates
must be materially nonzero (the self-synchronization premise)."""

import zlib

import numpy as np
import pytest

from tbz import constants as C
from tbz import reference
from tbz.ops.speculative import tokenize_block_speculative

from util import BitWriter, corpus, write_dynamic_header


def check_static(payload):
    res = reference.tokenize_host(payload)
    b0 = res.blocks[0]
    assert b0.btype == C.BTYPE_STATIC
    tape, end_bit, stats = tokenize_block_speculative(
        payload, b0.start_bit + 3, C.FIXED_LITLEN_LENGTHS,
        C.FIXED_DIST_LENGTHS, chunk_bits=2048)
    t = res.tape
    assert np.array_equal(tape.out_len, t.out_len[b0.token_start:b0.token_end])
    assert np.array_equal(tape.dist, t.dist[b0.token_start:b0.token_end])
    assert np.array_equal(tape.root_val,
                          t.root_val[b0.token_start:b0.token_end])
    assert end_bit == b0.end_bit
    return stats


def _static_stream(data):
    co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    return co.compress(data) + co.flush()


def test_static_exact_and_synced():
    stats = check_static(_static_stream(corpus(9, 60000)))
    assert stats["lanes"] > 4
    assert stats["sync_rate"] > 0.3  # premise: lanes do resynchronize


def test_static_text_heavy():
    words = b"the quick brown fox jumps over the lazy dog "
    data = (words * 3000)[:80000]
    stats = check_static(_static_stream(data))
    assert stats["sync_rate"] > 0.3


def test_static_binary_mix():
    # structured binary + runs (high symbol-length variance); exactness
    # is the requirement, sync rate may vary with content.
    rng = np.random.default_rng(3)
    data = (rng.integers(0, 2 ** 16, 12000, dtype=np.uint32)
            .astype("<u4").tobytes())
    check_static(_static_stream(data))


def test_small_block_single_lane():
    stats = check_static(_static_stream(b"tiny"))
    assert stats["lanes"] == 1


def test_dynamic_block_crafted():
    # Crafted single dynamic block with known code lengths.
    lit_lens = [0] * 288
    for i, ch in enumerate(b"abcdefgh"):
        lit_lens[ch] = 4
    lit_lens[256] = 4
    lit_lens[257] = 4  # len-3 matches
    # need a complete code: 10 syms at len 4 -> kraft 10/16; add filler
    lit_lens[ord("z")] = 2
    lit_lens[ord("y")] = 2
    lit_lens[ord("x")] = 3  # 4/16+... compute: 2*1/4 + 1/8 + 10/16 = 1.25 >1
    # simpler: use equal 4-bit lengths for 16 symbols
    lit_lens = [0] * 288
    syms = list(b"abcdefghijklmn") + [256, 257]
    for s in syms:
        lit_lens[s] = 4
    dist_lens = [0] * 30
    dist_lens[0] = 1  # dist 1 only
    w = BitWriter().bits(1, 1).bits(2, 2)
    books = write_dynamic_header(w, lit_lens[:257] + [lit_lens[257]],
                                 dist_lens[:1])
    rng = np.random.default_rng(5)
    expect_tokens = []
    for _ in range(9000):
        if rng.random() < 0.15:
            c, l = books["lit"][257]
            w.huff(c, l)
            c, l = books["dist"][0]
            w.huff(c, l)
            expect_tokens.append((3, 1, 0))
        else:
            s = int(rng.choice(syms[:14]))
            c, l = books["lit"][s]
            w.huff(c, l)
            expect_tokens.append((1, 0, s))
    c, l = books["lit"][256]
    w.huff(c, l)
    payload = w.bytes()
    res = reference.tokenize_host(payload)
    b0 = res.blocks[0]
    assert b0.btype == C.BTYPE_DYNAMIC
    # symbol stream starts where the oracle says the first token begins:
    # recompute via the header length — use the crafted lens directly.
    tape, end_bit, stats = tokenize_block_speculative(
        payload, _dynamic_symbol_start(payload), np.array(lit_lens[:258]),
        np.array(dist_lens[:1]), chunk_bits=1024)
    t = res.tape
    assert np.array_equal(tape.out_len, t.out_len)
    assert np.array_equal(tape.dist, t.dist)
    assert np.array_equal(tape.root_val, t.root_val)
    assert end_bit == b0.end_bit
    # uniform short codes self-synchronize more slowly; exactness is the
    # hard requirement, sync is opportunistic
    assert stats["sync_rate"] > 0.05


def _dynamic_symbol_start(payload):
    """Bit offset where a dynamic block's symbol stream begins (after
    the 3 header bits + the DHT header)."""
    from tbz.bitreader import BitReader
    br = BitReader(payload, 0)
    br.bits(3)
    reference._read_dynamic_tables(br)
    return br.bit_position()


def test_whole_stream_speculative_multiblock():
    """Production path (ROADMAP §2b): whole multi-block stream decodes
    speculatively, bit-identical to the oracle (VERDICT round-1 #3)."""
    from tbz.ops.speculative import tokenize_stream_speculative
    data = (corpus(91, 1 << 18) + b"\x00" * 50000 + corpus(92, 1 << 18))
    payload = zlib.compress(data, 9)[2:-4]
    rs, stats = tokenize_stream_speculative(payload, collect_stats=True)
    rp = reference.tokenize_host(payload, 0)
    assert rs.end_bit == rp.end_bit and rs.finished
    assert (rs.tape.out_len == rp.tape.out_len).all()
    assert (rs.tape.dist == rp.tape.dist).all()
    assert (rs.tape.root_val == rp.tape.root_val).all()
    assert stats["blocks"] >= 2 and stats["synced"] > 0


def test_whole_stream_speculative_stored_mix():
    from tbz.ops.speculative import tokenize_stream_speculative
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    p1 = co.compress(corpus(93, 100000)) + co.flush(zlib.Z_FULL_FLUSH)
    co0 = zlib.compressobj(0, zlib.DEFLATED, -15)
    p2 = co0.compress(b"STORED" * 5000) + co0.flush()
    payload = p1 + p2
    rs = tokenize_stream_speculative(payload)
    rp = reference.tokenize_host(payload, 0)
    assert rs.end_bit == rp.end_bit
    assert (rs.tape.out_len == rp.tape.out_len).all()
    assert (rs.tape.root_val == rp.tape.root_val).all()


def test_whole_stream_speculative_errors():
    import pytest
    from tbz.errors import DeflateError, TruncatedError
    from tbz.ops.speculative import tokenize_stream_speculative
    payload = bytearray(zlib.compress(corpus(94, 100000), 9)[2:-4])
    with pytest.raises(TruncatedError):
        tokenize_stream_speculative(bytes(payload[:-40]))
    with pytest.raises(DeflateError):
        tokenize_stream_speculative(b"\x07\x00")  # block type 3


def test_tokenize_auto_routes_by_size():
    from tbz import frontend
    from tbz.ops import tokenize_device as td
    small = zlib.compress(corpus(95, 1000), 9)[2:-4]
    big = zlib.compress(corpus(96, 1 << 21), 9)[2:-4]
    assert len(big) >= td.SPECULATIVE_MIN_BYTES
    for payload in (small, big):
        r = frontend.tokenize(payload, frontend="device")
        p = reference.tokenize_host(payload, 0)
        assert r.end_bit == p.end_bit
        assert (r.tape.out_len == p.tape.out_len).all()
