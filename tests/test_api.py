"""One-shot API tests: framing, checksums, multi-member, fast path
(covering the reference's zlib-test/gzip-test + api.lisp contracts)."""

import gzip as _gzip
import io
import struct
import zlib

import pytest

from tbz import api
from tbz.errors import ChecksumError, DeflateError, TruncatedError

from util import corpus

DATA = corpus(31, 1 << 17)


@pytest.mark.parametrize("backend", ["host", "device"])
def test_zlib_roundtrip(backend):
    payload = zlib.compress(DATA, 9)
    assert api.decompress(payload, "zlib", backend=backend) == DATA


@pytest.mark.parametrize("backend", ["host", "device"])
def test_gzip_roundtrip(backend):
    payload = _gzip.compress(DATA, 9)
    assert api.decompress(payload, "gzip", backend=backend) == DATA


def test_raw_roundtrip():
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = co.compress(DATA) + co.flush()
    assert api.decompress(payload, "raw") == DATA


def test_autodetect():
    assert api.decompress(zlib.compress(DATA)) == DATA
    assert api.decompress(_gzip.compress(DATA)) == DATA
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    assert api.decompress(co.compress(DATA) + co.flush()) == DATA


@pytest.mark.parametrize("backend", ["host", "device"])
def test_adler_mismatch_detected(backend):
    payload = bytearray(zlib.compress(DATA))
    payload[-1] ^= 0xFF
    with pytest.raises(ChecksumError):
        api.decompress(bytes(payload), "zlib", backend=backend)


@pytest.mark.parametrize("backend", ["host", "device"])
def test_crc_mismatch_detected(backend):
    payload = bytearray(_gzip.compress(DATA))
    payload[-5] ^= 0xFF  # CRC byte (last 8 = CRC32+ISIZE)
    with pytest.raises(ChecksumError):
        api.decompress(bytes(payload), "gzip", backend=backend)


def test_isize_mismatch_detected():
    payload = bytearray(_gzip.compress(DATA))
    payload[-1] ^= 0x01  # ISIZE high byte
    with pytest.raises(ChecksumError):
        api.decompress(bytes(payload), "gzip")


def test_multi_member_gzip():
    a, b, c = corpus(1, 5000), corpus(2, 100), corpus(3, 60000)
    payload = _gzip.compress(a) + _gzip.compress(b) + _gzip.compress(c)
    out, info = api.decompress(payload, "gzip", with_info=True)
    assert out == a + b + c
    assert len(info.members) == 3
    assert [m.output_size for m in info.members] == [5000, 100, 60000]
    # stdlib agrees
    assert _gzip.decompress(payload) == a + b + c


def test_gzip_header_metadata():
    buf = io.BytesIO()
    with _gzip.GzipFile(filename="hello.txt", mode="wb", fileobj=buf,
                        mtime=1234567890) as f:
        f.write(DATA[:1000])
    out, info = api.decompress(buf.getvalue(), "gzip", with_info=True)
    assert out == DATA[:1000]
    h = info.members[0].header
    assert h.name == "hello.txt"
    assert h.mtime == 1234567890
    assert h.os_name in ("unix", "unknown")


def test_gzip_fhcrc():
    # Build a header with FHCRC by hand.
    hdr = bytearray(b"\x1f\x8b\x08\x02" + b"\x00" * 6)
    crc16 = zlib.crc32(bytes(hdr)) & 0xFFFF
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(b"data") + co.flush()
    trailer = struct.pack("<II", zlib.crc32(b"data"), 4)
    payload = bytes(hdr) + struct.pack("<H", crc16) + body + trailer
    assert api.decompress(payload, "gzip") == b"data"
    # Corrupt the FHCRC
    bad = bytes(hdr) + struct.pack("<H", crc16 ^ 1) + body + trailer
    with pytest.raises(ChecksumError):
        api.decompress(bad, "gzip")


def test_gzip_reserved_flag_bits():
    payload = bytearray(_gzip.compress(b"x"))
    payload[3] |= 0x80
    with pytest.raises(DeflateError):
        api.decompress(bytes(payload), "gzip")


def test_zlib_preset_dictionary():
    """Beyond the reference: FDICT streams decode with a caller dict
    (zlib.lisp:33-36 errors instead)."""
    zdict = DATA[:30000]
    co = zlib.compressobj(9, zlib.DEFLATED, 15, zdict=zdict)
    payload = co.compress(DATA[30000:60000]) + co.flush()
    out = api.decompress(payload, "zlib", zdict=zdict)
    assert out == DATA[30000:60000]
    with pytest.raises(DeflateError):
        api.decompress(payload, "zlib")  # dict required
    with pytest.raises(DeflateError):
        api.decompress(payload, "zlib", zdict=b"wrong dict")


def test_known_output_size_fast_path():
    payload = zlib.compress(DATA)
    assert api.decompress(payload, output_size=len(DATA)) == DATA
    with pytest.raises(DeflateError):
        api.decompress(payload, output_size=len(DATA) - 1)


def test_truncated_stream():
    payload = zlib.compress(DATA)
    with pytest.raises(TruncatedError):
        api.decompress(payload[:-6], "zlib")


def test_trailing_garbage_reported():
    payload = zlib.compress(b"hello")
    out, info = api.decompress(payload + b"JUNK", "zlib", with_info=True)
    assert out == b"hello"
    assert info.unused_data == b"JUNK"


def test_empty_payloads():
    assert api.decompress(zlib.compress(b""), "zlib") == b""
    assert api.decompress(_gzip.compress(b""), "gzip") == b""


def test_decompress_into_buffer():
    """Known-size zero-copy path (api.lisp:36-48): decode straight into
    a caller buffer; too-small buffers error; multi-member gzip fills
    successive slices."""
    import numpy as np
    data = corpus(55, 200000)
    for fmt, payload in [
        ("raw", zlib.compress(data, 9)[2:-4]),
        ("zlib", zlib.compress(data, 9)),
        ("gzip", _gzip.compress(data, 9)),
    ]:
        buf = bytearray(len(data))
        n = api.decompress_into(payload, buf, fmt)
        assert n == len(data) and bytes(buf) == data
        small = np.zeros(len(data) // 2, np.uint8)
        with pytest.raises(DeflateError):
            api.decompress_into(payload, small, fmt)
    # multi-member gzip
    parts = [corpus(60 + i, 30000) for i in range(3)]
    payload = b"".join(_gzip.compress(p, 6) for p in parts)
    buf = bytearray(90000)
    n = api.decompress_into(payload, buf, "gzip")
    assert n == 90000 and bytes(buf) == b"".join(parts)
    # corrupt trailer detected
    bad = bytearray(_gzip.compress(data, 9))
    bad[-5] ^= 0xFF
    with pytest.raises(ChecksumError):
        api.decompress_into(bytes(bad), bytearray(len(data)), "gzip")
    # raw + preset dictionary
    zd = data[:4000]
    co = zlib.compressobj(9, zlib.DEFLATED, -15, zdict=zd)
    body = co.compress(data[:10000]) + co.flush()
    buf = bytearray(10000)
    assert api.decompress_into(body, buf, "raw", zdict=zd) == 10000
    assert bytes(buf) == data[:10000]


def test_decompress_device_resident():
    """device_resident=True returns a device-resident uint8 array with
    no output D2H — the api.lisp:36-48 known-size contract for on-mesh
    consumers (only checksum scalars cross when verify=True)."""
    import jax
    import numpy as np
    data = corpus(70, 120000)
    for fmt, payload in (("zlib", zlib.compress(data, 9)),
                         ("gzip", _gzip.compress(data, 9)),
                         ("raw", zlib.compress(data, 9)[2:-4])):
        dev = api.decompress(payload, format=fmt, device_resident=True)
        assert hasattr(dev, "device")  # a jax array, still on device
        assert bytes(np.asarray(dev)) == data
    # multi-member gzip concatenates on device
    mm = _gzip.compress(data[:50000], 6) + _gzip.compress(data[50000:], 6)
    dev = api.decompress(mm, format="gzip", device_resident=True)
    assert bytes(np.asarray(dev)) == data
    # zero device->host transfers with verification off (with it on,
    # exactly the checksum scalars cross — still no output fetch)
    with jax.transfer_guard_device_to_host("disallow"):
        api.decompress(zlib.compress(data, 6), format="zlib",
                       device_resident=True, verify=False)
    # host backend is refused
    with pytest.raises(ValueError):
        api.decompress(zlib.compress(data, 6), backend="host",
                       device_resident=True)
