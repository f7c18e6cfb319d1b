"""tbz.zlib_compat — stdlib-zlib drop-in surface (one-import
migration; differential-tested against the real zlib module)."""

import zlib as stdzlib

import pytest

import tbz.zlib_compat as tz

from util import corpus


def test_compress_decompress_wbits_matrix():
    data = corpus(50, 200000)
    for wbits in (15, -15, 31):
        blob = tz.compress(data, 6, wbits)
        # stdlib can read ours...
        assert stdzlib.decompress(blob, wbits) == data
        # ...and we can read stdlib's
        std = stdzlib.compress(data, 6) if wbits == 15 else (
            stdzlib.compressobj(6, 8, wbits).compress(data))
        if wbits != 15:
            co = stdzlib.compressobj(6, 8, wbits)
            std = co.compress(data) + co.flush()
        assert tz.decompress(std, wbits) == data
        assert tz.decompress(blob, wbits) == data


def test_decompress_auto_detect_47():
    data = corpus(51, 50000)
    assert tz.decompress(stdzlib.compress(data, 9), 47) == data
    import gzip
    assert tz.decompress(gzip.compress(data), 47) == data


def test_error_class_is_zlib_error():
    with pytest.raises(tz.error):
        tz.decompress(b"\x07\x12garbage", -15)
    with pytest.raises(tz.error):
        tz.decompress(b"", 15)


def test_compressobj_decompressobj_streaming():
    data = corpus(52, 300000)
    co = tz.compressobj(7)
    out = b""
    for i in range(0, len(data), 7777):
        out += co.compress(data[i:i + 7777])
    out += co.flush()
    assert stdzlib.decompress(out) == data
    d = tz.decompressobj()
    got = b""
    for i in range(0, len(out), 999):
        got += d.decompress(out[i:i + 999])
    got += d.flush()
    assert got == data
    assert d.eof


def test_decompressobj_max_length_and_tail():
    data = corpus(53, 100000)
    payload = stdzlib.compress(data, 6) + b"TRAILING"
    d = tz.decompressobj()
    got = d.decompress(payload, max_length=1000)
    assert len(got) <= 1000
    while not d.eof:
        got += d.decompress(d.unconsumed_tail, max_length=4096)
    got += d.flush()
    assert got == data
    assert d.unused_data == b"TRAILING"


def test_decompressobj_zdict():
    hist = b"the quick brown fox jumps over the lazy dog" * 10
    data = hist[-300:] + corpus(54, 5000)
    co = stdzlib.compressobj(9, 8, 15, 8, 0, hist)
    payload = co.compress(data) + co.flush()
    d = tz.decompressobj(15, hist)
    assert d.decompress(payload) + d.flush() == data


def test_checksums_and_combines():
    a, b = corpus(55, 30000), corpus(56, 40000)
    assert tz.crc32(a) == stdzlib.crc32(a)
    assert tz.adler32(a) == stdzlib.adler32(a)
    assert tz.crc32_combine(tz.crc32(a), tz.crc32(b), len(b)) == \
        stdzlib.crc32(a + b)
    assert tz.adler32_combine(tz.adler32(a), tz.adler32(b), len(b)) == \
        stdzlib.adler32(a + b)


def test_compressobj_zdict_roundtrip():
    """Encode-side preset dictionary: stdlib must decode our FDICT
    stream with the same dict, and the dictionary must actually help."""
    hist = (b"a preset dictionary full of common phrases and words "
            b"that the payload reuses heavily ") * 40
    data = hist[:2000] + corpus(57, 3000) + hist[1000:3000]
    co = tz.compressobj(9, 8, 15, 8, 0, hist)
    blob = co.compress(data) + co.flush()
    d = stdzlib.decompressobj(15, hist)
    assert d.decompress(blob) + d.flush() == data
    co2 = tz.compressobj(9)
    plain = co2.compress(data) + co2.flush()
    assert len(blob) < len(plain)  # the dict paid
    # raw wbits too
    co3 = tz.compressobj(9, 8, -15, 8, 0, hist)
    raw = co3.compress(data) + co3.flush()
    d3 = stdzlib.decompressobj(-15, hist)
    assert d3.decompress(raw) + d3.flush() == data


def test_api_compress_zdict():
    import tbz
    hist = b"0123456789abcdef" * 600
    data = hist[-4000:] + b"tail that is new content " * 20
    blob = tbz.compress(data, "zlib", 6, zdict=hist)
    # our own reader (FDICT header path) and stdlib agree
    assert tbz.decompress(blob, "zlib", zdict=hist) == data
    d = stdzlib.decompressobj(15, hist)
    assert d.decompress(blob) + d.flush() == data
    with pytest.raises(ValueError):
        tbz.compress(data, "gzip", zdict=hist)


def test_copy_forks_streams():
    data = corpus(58, 120000)
    payload = stdzlib.compress(data, 6)
    d = tz.decompressobj()
    got = d.decompress(payload[:30000])
    d2 = d.copy()
    a = got + d.decompress(payload[30000:]) + d.flush()
    b = got + d2.decompress(payload[30000:]) + d2.flush()
    assert a == data and b == data
    co = tz.compressobj(6)
    h = co.compress(data[:50000])
    co2 = co.copy()
    s1 = h + co.compress(data[50000:]) + co.flush()
    s2 = h + co2.compress(data[50000:]) + co2.flush()
    assert stdzlib.decompress(s1) == data
    assert stdzlib.decompress(s2) == data


def test_zdict_encode_fuzz_vs_stdlib():
    """Random dictionaries x levels: our FDICT streams must decode via
    stdlib with the same dict, at every boundary-straddle shape."""
    import numpy as np
    import tbz
    rng = np.random.default_rng(99)
    for trial in range(12):
        dl = int(rng.integers(10, 40000))
        hist = bytes(rng.integers(97, 123, dl, dtype=np.uint8))
        # payload starts inside dict content to force boundary matches
        k = int(rng.integers(0, dl))
        data = hist[k:] + corpus(60 + trial, int(rng.integers(100, 20000)))
        lvl = int(rng.integers(1, 10))
        blob = tbz.compress(data, "zlib", lvl, zdict=hist)
        d = stdzlib.decompressobj(15, hist)
        assert d.decompress(blob) + d.flush() == data, (trial, lvl, dl)
        assert tbz.decompress(blob, "zlib", zdict=hist) == data


def test_reduced_window_wbits_header_and_decode():
    """wbits 9..14 (advisor r3, medium): CMF must advertise the real
    CINFO and distances must fit the window, so stdlib decompressobj
    allocating only 1<<wbits accepts the stream."""
    data = corpus(70, 150000)
    for wbits in (9, 11, 14):
        co = tz.compressobj(6, 8, wbits)
        blob = co.compress(data) + co.flush()
        assert (blob[0] >> 4) == wbits - 8  # CINFO
        d = stdzlib.decompressobj(wbits)
        assert d.decompress(blob) + d.flush() == data
        # one-shot surface too
        blob2 = tz.compress(data, 6, wbits)
        assert (blob2[0] >> 4) == wbits - 8
        d2 = stdzlib.decompressobj(wbits)
        assert d2.decompress(blob2) + d2.flush() == data
    # raw reduced window: decoder with a small raw window accepts
    co = tz.compressobj(6, 8, -9)
    raw = co.compress(data) + co.flush()
    d = stdzlib.decompressobj(-9)
    assert d.decompress(raw) + d.flush() == data


def test_wbits_zero_uses_header_window():
    data = corpus(71, 20000)
    blob = stdzlib.compress(data, 6)
    assert tz.decompress(blob, 0) == data
    d = tz.decompressobj(0)
    assert d.decompress(blob) + d.flush() == data


def test_flush_sync_modes_differential():
    """flush(Z_SYNC/Z_FULL/Z_PARTIAL) must leave the stream open
    (advisor r3): compress after flush continues; stdlib decodes the
    interleaved whole; each sync flush byte-aligns with 00 00 FF FF."""
    data = corpus(72, 90000)
    for mode in (tz.Z_SYNC_FLUSH, tz.Z_FULL_FLUSH, tz.Z_PARTIAL_FLUSH):
        co = tz.compressobj(6)
        out = co.compress(data[:40000])
        piece = co.flush(mode)
        assert piece.endswith(b"\x00\x00\xff\xff")
        out += piece
        out += co.compress(data[40000:])  # must NOT raise
        out += co.flush()
        assert stdzlib.decompress(out) == data
    # Z_NO_FLUSH is a no-op
    co = tz.compressobj(6)
    a = co.compress(data)
    assert co.flush(tz.Z_NO_FLUSH) == b""
    assert stdzlib.decompress(a + co.flush()) == data
    # sync-flush-only stream is readable incrementally at the sync point
    co = tz.compressobj(6)
    head = co.compress(data[:1000]) + co.flush(tz.Z_SYNC_FLUSH)
    d = stdzlib.decompressobj()
    assert d.decompress(head) == data[:1000]  # fully available pre-finish


def test_flush_misuse_raises_zlib_error():
    co = tz.compressobj(6)
    co.compress(b"abc")
    co.flush()  # Z_FINISH
    with pytest.raises(tz.error):
        co.compress(b"more")
    with pytest.raises(tz.error):
        co.flush(tz.Z_SYNC_FLUSH)
    assert co.flush() == b""  # repeated Z_FINISH: empty, like stdlib
    with pytest.raises(tz.error):
        tz.compressobj(6).flush(99)


def test_flush_interleave_fuzz_vs_stdlib():
    import numpy as np
    rng = np.random.default_rng(7)
    data = corpus(73, 60000)
    for trial in range(6):
        co = tz.compressobj(int(rng.integers(1, 10)))
        out = b""
        pos = 0
        while pos < len(data):
            take = int(rng.integers(1, 9000))
            out += co.compress(data[pos:pos + take])
            pos += take
            if rng.random() < 0.4:
                out += co.flush(tz.Z_SYNC_FLUSH)
        out += co.flush()
        assert stdzlib.decompress(out) == data[:pos] or \
            stdzlib.decompress(out) == data  # pos may overshoot len


def test_decompressobj_bounded_loop_progress():
    """stdlib's unconsumed_tail contract: input reported there has not
    been seen by the machinery, so the docs' bounded consumer loop
    (re-feed tail, bounded output per call, flush at end) must make
    progress round by round with the tail visibly draining."""
    import random
    random.seed(4)
    data = bytes(random.randrange(256) for _ in range(8000)) + b"ab" * 9000
    comp = stdzlib.compress(data)
    d = tz.decompressobj()
    out = d.decompress(comp, 96)
    assert len(out) == 96 and len(d.unconsumed_tail) > 0
    rounds = 0
    while d.unconsumed_tail and not d.eof:
        prev_tail = len(d.unconsumed_tail)
        prev_out = len(out)
        out += d.decompress(d.unconsumed_tail, 96)
        # progress each round: input consumed or output produced
        assert (len(d.unconsumed_tail) < prev_tail
                or len(out) > prev_out or d.eof)
        rounds += 1
        assert rounds < 10000
    out += d.flush()
    assert out == data and d.eof
    # copy() carries the tail
    d2 = tz.decompressobj()
    o2 = d2.decompress(comp, 64)
    fork = d2.copy()
    assert fork.unconsumed_tail == d2.unconsumed_tail
    a = o2 + d2.decompress(d2.unconsumed_tail) + d2.flush()
    b = o2 + fork.decompress(fork.unconsumed_tail) + fork.flush()
    assert a == data and b == data


def test_decompressobj_tiny_input_tail_loop_no_flush():
    """A highly compressible payload whose whole compressed form fits
    one internal bite: the re-feed loop (never calling flush) must
    still recover EVERYTHING — the wrapper reports a virtual tail while
    the core withholds output (stdlib parity for the documented loop)."""
    comp = stdzlib.compress(b"A" * 100000)
    d = tz.decompressobj()
    out = d.decompress(comp, 10)
    rounds = 0
    while d.unconsumed_tail and not d.eof:
        out += d.decompress(d.unconsumed_tail, 10)
        rounds += 1
        assert rounds < 100000
    assert out == b"A" * 100000 and d.eof


def test_wbits_validation_parity():
    """wbits=0 is decompress-only in stdlib; negative max_length raises
    ValueError."""
    with pytest.raises(tz.error):
        tz.compress(b"x", 6, 0)
    with pytest.raises(tz.error):
        tz.compressobj(6, tz.DEFLATED, 0)
    assert tz.decompress(stdzlib.compress(b"xyz"), 0) == b"xyz"
    with pytest.raises(ValueError):
        tz.decompressobj().decompress(b"x", -1)
