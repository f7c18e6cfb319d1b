"""Encoder tests: round-trips through three independent decoders, size
targets vs libz (BASELINE.md: encoder output <= libz), edge cases."""

import gzip as _gzip
import zlib

import pytest

from tbz import api, deflate_encode as de
from tbz.native import loader

from util import corpus


DATASETS = [
    b"",
    b"a",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    bytes(range(256)),
    corpus(1, 1 << 12),
    corpus(2, 1 << 16),
    bytes(1000),  # all zeros
]


@pytest.mark.parametrize("i", range(len(DATASETS)))
@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_roundtrip_stdlib_and_ours(i, level):
    data = DATASETS[i]
    raw = de.deflate_raw(data, level)
    assert zlib.decompressobj(-15).decompress(raw) == data
    assert api.decompress(raw, "raw") == data


@pytest.mark.parametrize("fmt", ["raw", "zlib", "gzip"])
def test_framed_roundtrip(fmt):
    data = corpus(3, 100000)
    payload = de.compress(data, fmt, 6)
    assert api.decompress(payload, fmt) == data
    if fmt == "zlib":
        assert zlib.decompress(payload) == data
    elif fmt == "gzip":
        assert _gzip.decompress(payload) == data


def test_gzip_metadata():
    payload = de.compress(b"hello", "gzip", 6, mtime=1234, name="x.txt")
    out, info = api.decompress(payload, "gzip", with_info=True)
    assert out == b"hello"
    assert info.members[0].header.name == "x.txt"
    assert info.members[0].header.mtime == 1234


@pytest.mark.skipif(not loader.available(), reason="needs native matcher")
@pytest.mark.parametrize("level", [1, 6, 9])
def test_size_beats_libz(level):
    """BASELINE north star: compressed size <= libz at the same level."""
    data = corpus(4, 1 << 20)
    ours = len(de.deflate_raw(data, level))
    libz = len(zlib.compress(data, level)) - 6  # strip zlib framing
    assert ours <= libz * 1.001, (ours, libz)


def test_incompressible_stays_stored():
    import os
    data = os.urandom(100000)
    raw = de.deflate_raw(data, 9)
    assert len(raw) < len(data) + len(data) // 1000 + 100
    assert zlib.decompressobj(-15).decompress(raw) == data


def test_streaming_decode_of_our_output():
    from tbz.streaming import Decompressor
    data = corpus(5, 1 << 18)
    payload = de.compress(data, "gzip", 9)
    d = Decompressor("gzip")
    out = b"".join(d.decompress(payload[i:i + 999])
                   for i in range(0, len(payload), 999)) + d.flush()
    assert out == data
