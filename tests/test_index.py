"""Seek index (tbz/index.py): random access via checkpoint points,
exactness against direct slicing across formats and member shapes."""

import gzip as stdgzip
import zlib

import numpy as np
import pytest

from tbz.index import SeekIndex
from tbz.errors import DeflateError

from util import corpus


def _mix(n):
    rng = np.random.default_rng(31)
    parts = []
    while sum(map(len, parts)) < n:
        k = int(rng.integers(0, 3))
        if k == 0:
            parts.append(rng.integers(97, 123, 40000).astype(np.uint8)
                         .tobytes())
        elif k == 1:
            parts.append(bytes(int(rng.integers(5000, 60000))))
        else:
            parts.append(rng.integers(0, 256, 20000).astype(np.uint8)
                         .tobytes())
    return b"".join(parts)[:n]


@pytest.mark.parametrize("fmt", ["raw", "zlib", "gzip"])
def test_random_windows_exact(fmt):
    data = _mix(6 << 20)
    if fmt == "raw":
        payload = zlib.compress(data, 6)[2:-4]
    elif fmt == "zlib":
        payload = zlib.compress(data, 6)
    else:
        payload = stdgzip.compress(data, 6)
    idx = SeekIndex.build(payload, fmt, every=1 << 19)
    assert idx.total_out == len(data)
    rng = np.random.default_rng(7)
    for _ in range(25):
        start = int(rng.integers(0, len(data)))
        size = int(rng.integers(1, 200000))
        assert idx.read(payload, start, size) == data[start:start + size]
    assert idx.read(payload, 0, 16) == data[:16]
    assert idx.read(payload, len(data) - 3, 50) == data[-3:]
    assert idx.read(payload, len(data) + 1, 5) == b""


def test_multi_member_gzip_and_serialize():
    a, b, c = _mix(1 << 20), _mix(1 << 20), _mix(1 << 20)
    data = a + b + c
    payload = (stdgzip.compress(a, 6) + stdgzip.compress(b, 9)
               + stdgzip.compress(c, 1))
    idx = SeekIndex.load(
        SeekIndex.build(payload, "gzip", every=1 << 18).serialize())
    assert idx.total_out == len(data)
    rng = np.random.default_rng(13)
    for _ in range(15):
        start = int(rng.integers(0, len(data)))
        size = int(rng.integers(1, 150000))
        assert idx.read(payload, start, size) == data[start:start + size]
    # windows straddling member boundaries
    for edge in (len(a), len(a) + len(b)):
        assert (idx.read(payload, edge - 100, 200)
                == data[edge - 100:edge + 100])
    with pytest.raises(DeflateError):
        SeekIndex.load(b"not an index")


def test_corrupt_stream_raises_at_build():
    data = corpus(140, 200000)
    payload = bytearray(zlib.compress(data, 6))
    payload[len(payload) // 2] ^= 0xFF
    with pytest.raises(Exception):
        SeekIndex.build(bytes(payload), "zlib", every=1 << 16)
