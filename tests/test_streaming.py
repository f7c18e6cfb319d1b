"""Chunked-streaming fuzz — the port of the reference's randomized
chunk-split harness (test-chunked-input.lisp:27-89: fixed 3-byte pieces,
then thousands of random splits, asserting clean resume at every point)
plus framing/multi-member streaming cases."""

import gzip as _gzip
import random
import zlib

import pytest

from tbz.errors import ChecksumError, TruncatedError
from tbz.streaming import Decompressor, IncrementalInflater

from util import corpus, raw_deflate


def stream_decode(payload, fmt, sizes, **kw):
    d = Decompressor(fmt, **kw)
    out = []
    pos = 0
    for s in sizes:
        out.append(d.decompress(payload[pos:pos + s]))
        pos += s
    out.append(d.decompress(payload[pos:]))
    out.append(d.flush())
    return b"".join(out), d


DATA = corpus(77, 1 << 17)


def test_fixed_3_byte_chunks():
    """The reference's fixed-3-byte harness (test-chunked-input.lisp:46-52)."""
    payload = raw_deflate(DATA, 9)
    sizes = [3] * (len(payload) // 3)
    out, d = stream_decode(payload, "raw", sizes)
    assert out == DATA and d.eof


def test_single_byte_chunks():
    payload = zlib.compress(DATA[:20000], 9)
    out, d = stream_decode(payload, "zlib", [1] * (len(payload) - 1))
    assert out == DATA[:20000] and d.eof


@pytest.mark.parametrize("fmt,mk", [
    ("raw", lambda d: raw_deflate(d, 9)),
    ("zlib", lambda d: zlib.compress(d, 9)),
    ("gzip", lambda d: _gzip.compress(d, 9)),
])
def test_random_chunk_fuzz(fmt, mk):
    """Random split sizes 1..1234 (test-chunked-input.lisp:54-75 port;
    iterations scaled for CI time, covering all three framings)."""
    payload = mk(DATA)
    rng = random.Random(99)
    for _ in range(40):
        sizes = []
        left = len(payload)
        while left > 0:
            s = rng.randint(1, 1234)
            sizes.append(min(s, left))
            left -= s
        out, d = stream_decode(payload, fmt, sizes[:-1])
        assert out == DATA and d.eof


def test_chunked_64k_with_history_carry():
    """BASELINE config 4: 64KB pieces, matches reaching across pieces
    through the 32KB window."""
    data = corpus(5, 1 << 20)
    payload = zlib.compress(data, 9)
    sizes = [65536] * (len(payload) // 65536)
    out, d = stream_decode(payload, "zlib", sizes)
    assert out == data


def test_stored_block_chunking():
    """Level-0 (stored) streams split mid-block
    (test-chunked-input.lisp:78-89 parity)."""
    data = corpus(8, 200000)
    payload = zlib.compress(data, 0)
    rng = random.Random(3)
    for _ in range(10):
        sizes = []
        left = len(payload)
        while left > 0:
            s = rng.randint(1, 5000)
            sizes.append(min(s, left))
            left -= s
        out, d = stream_decode(payload, "zlib", sizes[:-1])
        assert out == data


def test_multi_member_gzip_streaming():
    members = [corpus(i, 10000 + i * 7) for i in range(4)]
    payload = b"".join(_gzip.compress(m) for m in members)
    rng = random.Random(17)
    for _ in range(10):
        sizes = []
        left = len(payload)
        while left > 0:
            s = rng.randint(1, 4000)
            sizes.append(min(s, left))
            left -= s
        out, d = stream_decode(payload, "gzip", sizes[:-1])
        assert out == b"".join(members)
        assert len(d.members) == 4


def test_trailing_garbage_after_gzip():
    payload = _gzip.compress(b"hello") + b"NOTGZIP"
    out, d = stream_decode(payload, "gzip", [5, 9])
    assert out == b"hello"
    assert d.unused_data == b"NOTGZIP"


def test_streaming_checksum_mismatch():
    payload = bytearray(zlib.compress(DATA[:50000]))
    payload[-1] ^= 1
    d = Decompressor("zlib")
    with pytest.raises(ChecksumError):
        d.decompress(bytes(payload))
        d.flush()


def test_incomplete_stream_flush_raises():
    payload = zlib.compress(DATA[:10000])
    d = Decompressor("zlib")
    d.decompress(payload[:50])
    with pytest.raises(TruncatedError):
        d.flush()


def test_empty_flush_ok():
    assert Decompressor("zlib").flush() == b""


def test_auto_format_streaming():
    for payload, want in [(zlib.compress(DATA[:5000]), DATA[:5000]),
                          (_gzip.compress(DATA[:5000]), DATA[:5000])]:
        out, d = stream_decode(payload, "auto", [1, 1, 1, 10])
        assert out == want


def test_zdict_streaming():
    zdict = DATA[:30000]
    co = zlib.compressobj(9, zlib.DEFLATED, 15, zdict=zdict)
    payload = co.compress(DATA[30000:60000]) + co.flush()
    out, d = stream_decode(payload, "zlib", [7] * 40, zdict=zdict)
    assert out == DATA[30000:60000]


def test_state_checkpoint_resume():
    """Decode state round-trips through get_state/set_state mid-stream
    (the reference's save-state/checkpointability, SURVEY §5.4)."""
    payload = raw_deflate(DATA, 9)
    inf1 = IncrementalInflater()
    tape1, src1 = inf1.feed(payload[:4000])
    from tbz import reference
    out1 = reference.resolve_host(tape1, src1)
    inf1.trim()
    st = inf1.get_state()

    inf2 = IncrementalInflater()
    inf2.set_state(st)
    tape2, src2 = inf2.feed(payload[4000:])
    out2 = reference.resolve_host(tape2, src2, window=out1[-32768:])
    assert out1 + out2 == DATA


def test_python_inflater_fuzz():
    """The pure-Python token-granular inflater stays correct (it is the
    fallback when the native build is unavailable)."""
    from tbz import reference
    payload = zlib.compress(DATA[:100000], 9)[2:-4]
    rng = random.Random(55)
    for _ in range(5):
        inf = IncrementalInflater()
        out = b""
        window = b""
        pos = 0
        while pos < len(payload):
            n = rng.randint(1, 3000)
            tape, src = inf.feed(payload[pos:pos + n])
            pos += n
            piece = reference.resolve_host(tape, src, window)
            inf.trim()
            out += piece
            window = (window + piece)[-32768:]
        assert inf.finished and out == DATA[:100000]


def test_max_length_output_overflow_protocol():
    """Fixed-size output harvesting — the reference's output-overflow
    loop (test-chunked-output.lisp port at the API level): harvest in
    small buffers of many sizes, byte-exact reassembly."""
    payload = zlib.compress(DATA, 9)
    rng = random.Random(42)
    for _ in range(5):
        d = Decompressor("zlib")
        out = []
        pos = 0
        while not d.eof or d.pending_output:
            chunk = payload[pos:pos + 997]
            pos += 997
            piece = d.decompress(chunk, max_length=rng.randint(1, 12345))
            out.append(piece)
            if pos >= len(payload) and not piece and not d.pending_output:
                break
        out.append(d.flush())
        assert b"".join(out) == DATA


def test_max_length_tiny_buffers():
    """3-byte output buffers (test-chunked-output.lisp:55-66 analog)."""
    data = DATA[:5000]
    payload = zlib.compress(data, 9)
    d = Decompressor("zlib")
    out = [d.decompress(payload, max_length=3)]
    while d.pending_output:
        out.append(d.decompress(b"", max_length=3))
        assert len(out[-1]) <= 3
    out.append(d.flush())
    assert b"".join(out) == data


def test_thousands_of_gzip_members_one_call():
    """BGZF-style files concatenate thousands of tiny members; the
    member hand-off must be iterative, not recursive."""
    payload = b"".join(_gzip.compress(b"x%d," % i) for i in range(3000))
    d = Decompressor("gzip")
    out = d.decompress(payload) + d.flush()
    assert out == b"".join(b"x%d," % i for i in range(3000))
    assert len(d.members) == 3000


def test_zlib_zdict_ignored_without_fdict():
    """A zlib stream whose header lacks FDICT must NOT get the preset
    dictionary preloaded: too-far distances stay errors (zlib parity)."""
    zdict = DATA[:4096]
    # Build a raw stream that references the dictionary, then wrap it in
    # a plain (no-FDICT) zlib header: stdlib zlib rejects it.
    co = zlib.compressobj(9, zlib.DEFLATED, -15, zdict=zdict)
    body = co.compress(DATA[:3000]) + co.flush()
    cmf, flg = 0x78, 0
    flg = (31 - ((cmf << 8) % 31)) % 31
    fake = bytes([cmf, flg]) + body + b"\x00\x00\x00\x01"
    ref = zlib.decompressobj(zdict=zdict)
    with pytest.raises(zlib.error):
        ref.decompress(fake)
    d = Decompressor("zlib", zdict=zdict, verify=False)
    from tbz.errors import DeflateError
    with pytest.raises(DeflateError):
        d.decompress(fake)


def test_raw_zdict_streaming_and_oneshot_agree():
    from tbz import api
    zdict = DATA[:4096]
    co = zlib.compressobj(9, zlib.DEFLATED, -15, zdict=zdict)
    body = co.compress(DATA[:3000]) + co.flush()
    ref = zlib.decompressobj(-15, zdict=zdict)
    want = ref.decompress(body)
    d = Decompressor("raw", zdict=zdict)
    assert d.decompress(body) + d.flush() == want
    assert api.decompress(body, "raw", zdict=zdict) == want


def _output_bomb(n_out=100 << 20):
    """~100MB-output stream from ~100KB of input (max-expansion runs)."""
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    return co.compress(b"\x00" * n_out) + co.flush(), n_out


def test_max_length_bounds_work_and_memory():
    """The reference's cost model (deflate.lisp:121-137, README.md:80-93):
    decoding into a bounded buffer keeps memory O(buffer + 32KB window)
    no matter how much input is fed at once. A 100MB-output bomb fed
    WHOLE with max_length=4096 must not materialize the 100MB."""
    import tracemalloc
    payload, n_out = _output_bomb()
    d = Decompressor("raw")
    tracemalloc.start()
    first = d.decompress(payload, max_length=4096)
    base, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert len(first) == 4096 and first == b"\x00" * 4096
    # generous bound: max_length + input SLICE + window + tape slack
    assert peak < 8 << 20, f"peak {peak} bytes — output not bounded"
    assert d.pending_output <= 300
    # drain a few more bounded calls, then the rest unbounded
    got = len(first)
    for _ in range(16):
        piece = d.decompress(b"", max_length=1 << 20)
        assert len(piece) <= 1 << 20
        assert piece == b"\x00" * len(piece)
        got += len(piece)
    rest = d.decompress(b"") + d.flush()
    assert rest == b"\x00" * len(rest)
    assert got + len(rest) == n_out and d.eof


def test_max_length_chunked_output_fuzz_bounded():
    """Random harvest-buffer sizes over a zlib stream fed whole —
    byte-exact reassembly with per-call caps honored (the
    test-chunked-output.lisp strategy under the bounded protocol)."""
    data = corpus(123, 1 << 20)
    payload = zlib.compress(data, 6)
    rng = random.Random(7)
    d = Decompressor("zlib")
    out = []
    cap = rng.randint(1, 50000)
    piece = d.decompress(payload, max_length=cap)
    assert len(piece) <= cap
    out.append(piece)
    stall = 0
    while not d.eof and stall < 3:
        cap = rng.randint(1, 50000)
        piece = d.decompress(b"", max_length=cap)
        assert len(piece) <= cap
        out.append(piece)
        stall = stall + 1 if not piece else 0
    out.append(d.flush())
    assert b"".join(out) == data and d.eof


def test_max_length_multi_member_gzip_bounded():
    members = [corpus(i, 40000) for i in range(5)]
    payload = b"".join(_gzip.compress(m, 6) for m in members)
    want = b"".join(members)
    d = Decompressor("gzip")
    out = [d.decompress(payload, max_length=1000)]
    stall = 0
    while not d.eof and stall < 3:
        piece = d.decompress(b"", max_length=7777)
        out.append(piece)
        stall = stall + 1 if not piece else 0
    out.append(d.flush())
    assert b"".join(out) == want and len(d.members) == 5


def test_checkpoint_resume_across_pickle():
    """SURVEY §5.4: all decode state lives in one serializable blob; a
    checkpoint taken at ANY chunk boundary resumes byte-exact — here in
    a fresh Decompressor, through a subprocess-safe pickle round trip."""
    data = corpus(321, 1 << 18)
    for fmt, payload in [("zlib", zlib.compress(data, 9)),
                         ("gzip", _gzip.compress(data, 6))]:
        rng = random.Random(fmt)
        d = Decompressor(fmt)
        out = []
        pos = 0
        while pos < len(payload):
            n = rng.randint(1, 7777)
            out.append(d.decompress(payload[pos:pos + n]))
            pos += n
            if rng.random() < 0.3:
                d = Decompressor.restore(d.checkpoint())
        out.append(d.flush())
        assert b"".join(out) == data and d.eof


def test_checkpoint_resume_bounded_mode():
    data = corpus(322, 200000)
    payload = zlib.compress(data, 6)
    d = Decompressor("zlib")
    out = [d.decompress(payload, max_length=30000)]
    blob = d.checkpoint()
    d2 = Decompressor.restore(blob)
    stall = 0
    while not d2.eof and stall < 4:
        piece = d2.decompress(b"", max_length=17000)
        out.append(piece)
        stall = stall + 1 if not piece else 0
    out.append(d2.flush())
    assert b"".join(out) == data


def test_flush_incomplete_does_not_lose_output():
    """Round-2 review finding: flush() on an incomplete stream must not
    discard decoded/withheld output — a caller that catches the
    TruncatedError and keeps feeding input recovers a gapless stream."""
    data = corpus(77, 400000)
    payload = zlib.compress(data, 6)
    d = Decompressor("zlib")
    first = d.decompress(payload[:len(payload) // 2], max_length=100)
    with pytest.raises(TruncatedError):
        d.flush()
    rest = d.decompress(payload[len(payload) // 2:]) + d.flush()
    assert first + rest == data


def test_checkpoint_blob_is_not_pickle():
    """Checkpoint blobs are versioned tagged data, not pickle: restoring
    never executes blob content, bad magic fails loudly, and a native
    TokState from a different build is rejected by size (ADVICE r2)."""
    import tbz
    d = tbz.Decompressor("zlib")
    d.decompress(zlib.compress(b"hello world " * 100)[:40])
    blob = d.checkpoint()
    assert blob[:4] == b"TBZC"
    with pytest.raises(ValueError):
        tbz.Decompressor.restore(b"\x80\x04" + blob[2:])  # pickle magic
    # tampered native-state length must NOT be memmoved
    from tbz.streaming import _ckpt_loads, _ckpt_dumps, _NativeInflater
    s = _ckpt_loads(blob)
    if s["inflater"] and s["inflater"][0] == "_NativeInflater":
        s["inflater"][1]["native_state"] = b"\x01" * 8
        with pytest.raises(ValueError):
            tbz.Decompressor.restore(_ckpt_dumps(s))


def test_checkpoint_truncated_int_raises():
    """advisor r3: a blob cut inside an int payload must raise, not
    silently decode a shorter integer."""
    import pytest
    from tbz import streaming as st
    blob = st._ckpt_dumps({"total": 0x1234567890})
    # find the int tag and cut inside its payload
    for cut in range(len(blob) - 1, 0, -1):
        try:
            st._ckpt_de(blob[:cut], len(st._CKPT_MAGIC))
        except (ValueError, IndexError, KeyError):
            continue
        # any prefix that decodes without error must decode EQUAL
        v, _ = st._ckpt_de(blob, len(st._CKPT_MAGIC))
        v2, _ = st._ckpt_de(blob[:cut], len(st._CKPT_MAGIC))
        assert v2 == v, f"cut at {cut} silently decoded {v2!r}"
