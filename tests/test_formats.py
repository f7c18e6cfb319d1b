"""Framing-layer unit tests (zlib.lisp:14-37 / gzip.lisp:110-286 parity
checks at the header/trailer level)."""

import zlib

import pytest

from tbz.errors import ChecksumError, DeflateError, TruncatedError
from tbz.formats import gzip_fmt, zlib_fmt

from util import corpus


def test_zlib_header_valid():
    h = zlib_fmt.parse_header(zlib.compress(b"x", 9))
    assert h.cm == 8 and h.cinfo <= 7 and not h.fdict
    assert h.data_offset == 2


def test_zlib_header_cm_rejected():
    # CM=7; fix the check bits so only CM fails
    for cmf in (0x77, 0x79):
        flg = (31 - ((cmf << 8) % 31)) % 31
        with pytest.raises(DeflateError):
            zlib_fmt.parse_header(bytes([cmf, flg]))


def test_zlib_header_cinfo_rejected():
    cmf = 0x88  # CINFO=8 > 7
    flg = (31 - ((cmf << 8) % 31)) % 31
    with pytest.raises(DeflateError):
        zlib_fmt.parse_header(bytes([cmf, flg]))


def test_zlib_header_check_bits():
    with pytest.raises(DeflateError):
        zlib_fmt.parse_header(b"\x78\x00")  # 0x7800 % 31 != 0


def test_zlib_header_truncated():
    with pytest.raises(TruncatedError):
        zlib_fmt.parse_header(b"\x78")


def test_zlib_fdict_requires_dict():
    zdict = b"hello dictionary"
    co = zlib.compressobj(9, zlib.DEFLATED, 15, zdict=zdict)
    payload = co.compress(b"data") + co.flush()
    with pytest.raises(DeflateError):
        zlib_fmt.parse_header(payload)
    h = zlib_fmt.parse_header(payload, zdict)
    assert h.fdict and h.dictid == zlib.adler32(zdict)
    assert h.data_offset == 6


def test_gzip_header_minimal():
    import gzip as g
    h = gzip_fmt.parse_header(g.compress(b"x"))
    assert h.data_offset == 10
    assert h.os in gzip_fmt.OS_NAMES or h.os_name == "unknown"


def test_gzip_bad_magic():
    with pytest.raises(DeflateError):
        gzip_fmt.parse_header(b"\x1f\x8c" + b"\x00" * 10)


def test_gzip_bad_cm():
    with pytest.raises(DeflateError):
        gzip_fmt.parse_header(b"\x1f\x8b\x07" + b"\x00" * 8)


def test_gzip_all_optional_fields():
    hdr = bytearray(b"\x1f\x8b\x08\x1e")       # FHCRC|FEXTRA|FNAME|FCOMMENT
    hdr += (1234).to_bytes(4, "little")        # MTIME
    hdr += b"\x02\x03"                         # XFL, OS
    hdr += (4).to_bytes(2, "little") + b"EXTR"  # FEXTRA
    hdr += "nämé.txt".encode("utf-8") + b"\x00"
    hdr += b"a comment\x00"
    crc16 = zlib.crc32(bytes(hdr)) & 0xFFFF
    hdr += crc16.to_bytes(2, "little")
    h = gzip_fmt.parse_header(bytes(hdr))
    assert h.extra == b"EXTR"
    assert h.name == "nämé.txt"
    assert h.comment == "a comment"
    assert h.header_crc_ok is True
    assert h.mtime == 1234
    assert h.data_offset == len(hdr)


def test_gzip_latin1_fallback_name():
    hdr = bytearray(b"\x1f\x8b\x08\x08" + b"\x00" * 6)
    hdr += bytes([0xE9]) + b".txt\x00"  # latin-1 e-acute, invalid UTF-8
    h = gzip_fmt.parse_header(bytes(hdr))
    assert h.name == "é.txt"


def test_gzip_unterminated_name():
    hdr = b"\x1f\x8b\x08\x08" + b"\x00" * 6 + b"noterm"
    with pytest.raises(TruncatedError):
        gzip_fmt.parse_header(hdr)


def test_trailer_checks():
    with pytest.raises(ChecksumError):
        gzip_fmt.check_trailer(1, 2, 0, 0)
    with pytest.raises(ChecksumError):
        gzip_fmt.check_trailer(1, 1, 5, 6)
    gzip_fmt.check_trailer(1, 1, 5, 5)
    gzip_fmt.check_trailer(1, 1, (1 << 32) + 5 & 0xFFFFFFFF, (1 << 32) + 5)
    with pytest.raises(ChecksumError):
        zlib_fmt.check_adler(1, 2)


def test_gzip_fextra_subfields():
    """RFC 1952 §2.3.1.1 subfield framing round trip + parse through
    the header machine."""
    from tbz.formats import gzip_fmt
    subs = [(b"AB", b"hello"), (b"Ra", b""), (b"XX", bytes(range(200)))]
    blob = gzip_fmt.build_extra_subfields(subs)
    assert gzip_fmt.parse_extra_subfields(blob) == subs
    # hand-build a gzip member with FEXTRA
    import zlib as _z
    body = _z.compress(b"payload", 9)[2:-4]
    hdr = (b"\x1f\x8b\x08\x04" + b"\x00" * 4 + b"\x00\x03"
           + len(blob).to_bytes(2, "little") + blob)
    member = (hdr + body + _z.crc32(b"payload").to_bytes(4, "little")
              + (7).to_bytes(4, "little"))
    h = gzip_fmt.parse_header(member, 0)
    assert h.extra == blob and h.subfields() == subs
    from tbz import api
    out, info = api.decompress(member, "gzip", with_info=True)
    assert out == b"payload"
    assert info.members[0].header.subfields() == subs
    # malformed subfield framing
    with pytest.raises(DeflateError):
        gzip_fmt.parse_extra_subfields(b"AB\xff\xff12")


def test_zip_reader_against_zipfile():
    import io
    import zipfile
    from tbz.formats.zip_fmt import ZipReader
    files = {
        "a.txt": corpus(71, 50000),
        "dir/b.bin": corpus(72, 120000),
        "empty": b"",
        "stored.dat": corpus(73, 1000),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in files.items():
            method = (zipfile.ZIP_STORED if name == "stored.dat"
                      else zipfile.ZIP_DEFLATED)
            z.writestr(zipfile.ZipInfo(name), content, compress_type=method)
    blob = buf.getvalue()
    zr = ZipReader(blob)
    assert set(zr.names()) == set(files)
    for name, content in files.items():
        assert zr.read(name) == content
    assert zr.read_all() == files
    # corrupt a member body -> checksum error on read
    import zlib as _z
    e = [x for x in zr.entries if x.name == "dir/b.bin"][0]
    bad = bytearray(blob)
    # flip a byte inside the member's compressed payload
    bad[e.local_offset + 40] ^= 0xFF
    zr2 = ZipReader(bytes(bad))
    with pytest.raises(DeflateError):
        zr2.read("dir/b.bin")


def test_gzip_fextra_write_side():
    import gzip as _g
    from tbz import api
    subs = [(b"AB", b"meta"), (b"XY", b"")]
    payload = api.compress(b"x" * 5000, "gzip", 6, extra=subs, name="n")
    assert _g.decompress(payload) == b"x" * 5000
    out, info = api.decompress(payload, "gzip", with_info=True)
    assert out == b"x" * 5000
    assert info.members[0].header.subfields() == subs


def test_zip_reader_unknown_name_keyerror():
    import io
    import zipfile
    from tbz.formats.zip_fmt import ZipReader
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("a.txt", b"alpha" * 100)
    zr = ZipReader(buf.getvalue())
    with pytest.raises(KeyError, match="no item named 'missing.bin'"):
        zr.read("missing.bin")


def test_zip_writer_roundtrip(tmp_path):
    """ZipWriter blobs round-trip through BOTH our ZipReader and
    stdlib zipfile (interop), deflate and stored methods."""
    import io
    import zipfile
    import tbz
    from util import corpus
    w = tbz.ZipWriter()
    files = {"a.txt": corpus(41, 50000), "dir/b.bin": corpus(42, 120000),
             "tiny": b"x"}
    for name, data in files.items():
        w.write(name, data, level=9)
    blob = w.getvalue()
    r = tbz.ZipReader(blob)
    for name, data in files.items():
        assert r.read(name) == data
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None
    for name, data in files.items():
        assert zf.read(name) == data


def test_zip_writer_stored_fallback():
    """Incompressible data falls back to stored (method 0)."""
    import io
    import os
    import zipfile
    import tbz
    data = os.urandom(10000)
    w = tbz.ZipWriter()
    w.write("r.bin", data)
    blob = w.getvalue()
    assert tbz.ZipReader(blob).read("r.bin") == data
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.getinfo("r.bin").compress_type == zipfile.ZIP_STORED


def test_zip_read_all_paired_matches_read():
    """read_all pairs deflate entries through the native paired inflate;
    results must match entry-by-entry read() exactly across mixed
    stored/deflate archives with odd deflate counts, and a corrupt
    entry must raise the same ChecksumError class."""
    import numpy as np
    from tbz.formats.zip_fmt import ZipReader, ZipWriter
    from tbz.errors import ChecksumError
    rng = np.random.default_rng(8)
    zw = ZipWriter()
    ref = {}
    for i in range(9):
        if i % 4 == 0:
            data = rng.integers(0, 256, 2000).astype(np.uint8).tobytes()
        else:
            data = (b"entry %d " % i) * int(rng.integers(100, 4000))
        zw.write(f"e{i}", data)
        ref[f"e{i}"] = data
    blob = zw.getvalue()
    zr = ZipReader(blob)
    assert zr.read_all() == ref
    assert {n: zr.read(n) for n in ref} == ref
    # corrupt one deflate member's payload: read_all raises ChecksumError
    e = [x for x in zr.entries if x.method == 8][2]
    bad = bytearray(blob)
    bad[e.local_offset + 40] ^= 0x5A
    zr2 = ZipReader(bytes(bad))
    with pytest.raises((ChecksumError, DeflateError)):
        zr2.read_all()


def test_zip64_read_write_interop():
    """ZIP64: read stdlib's forced-zip64 entries and >65535-entry
    archives; our writer's zip64 records must be stdlib-readable."""
    import io
    import zipfile
    from tbz.formats.zip_fmt import ZipReader, ZipWriter
    # stdlib-forced per-entry zip64 -> our reader
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        with z.open("a.bin", "w", force_zip64=True) as f:
            f.write(b"data! " * 5000)
        z.writestr("b.txt", "bee")
    zr = ZipReader(bio.getvalue())
    assert zr.read("a.bin") == b"data! " * 5000
    assert zr.read("b.txt") == b"bee"
    # our forced zip64 -> stdlib
    w = ZipWriter()
    w.write("x", b"payload " * 2000, force_zip64=True)
    w.write("y", b"tiny", method=0)
    blob = w.getvalue()
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.read("x") == b"payload " * 2000 and zf.read("y") == b"tiny"
    assert ZipReader(blob).read("x") == b"payload " * 2000
    # >65535 entries both directions (zip64 EOCD)
    w = ZipWriter()
    for i in range(65600):
        w.write(f"f{i}", b"x", method=0)
    blob = w.getvalue()
    assert len(zipfile.ZipFile(io.BytesIO(blob)).namelist()) == 65600
    zr = ZipReader(blob)
    assert len(zr.entries) == 65600 and zr.read("f65599") == b"x"
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_STORED) as z:
        for i in range(65600):
            z.writestr(f"g{i}", b"y")
    zr = ZipReader(bio.getvalue())
    assert len(zr.entries) == 65600 and zr.read("g65599") == b"y"
