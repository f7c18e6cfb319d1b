"""tbz.gzip_compat — stdlib-gzip drop-in surface (differential-tested
against the real gzip module)."""

import gzip as stdgzip
import io
import os

import pytest

import tbz.gzip_compat as tg

from util import corpus


def test_compress_decompress_parity():
    data = corpus(120, 150000)
    blob = tg.compress(data, 6, mtime=4242)
    assert stdgzip.decompress(blob) == data
    assert tg.decompress(blob) == data
    assert tg.decompress(stdgzip.compress(data, 9)) == data
    f = stdgzip.GzipFile(fileobj=io.BytesIO(blob))
    f.read(1)
    assert f.mtime == 4242


def test_multi_member_both_ways():
    a, b = corpus(121, 40000), corpus(122, 30000)
    mm = stdgzip.compress(a) + tg.compress(b, 6) + stdgzip.compress(a)
    assert tg.decompress(mm) == a + b + a == stdgzip.decompress(mm)


def test_gzipfile_read_surface():
    data = corpus(123, 90000)
    sb = io.BytesIO()
    g = stdgzip.GzipFile(fileobj=sb, mode="wb", filename="n.txt",
                         mtime=999)
    g.write(data)
    g.close()
    f = tg.GzipFile(fileobj=io.BytesIO(sb.getvalue()), mode="rb")
    assert f.mode == tg.READ
    got = b""
    while True:
        c = f.read(7777)
        if not c:
            break
        got += c
    assert got == data and f.mtime == 999 and f.tell() == len(data)
    f.rewind()
    assert f.peek(16)[:16] == data[:16]
    assert f.read(100) == data[:100]
    f.seek(5000)
    assert f.read(10) == data[5000:5010]
    f.seek(100)  # backward: rewind + forward decode
    assert f.read(10) == data[100:110]
    f2 = tg.open(io.BytesIO(sb.getvalue()), "rb")
    assert b"".join(f2.readlines()) == data


def test_gzipfile_write_append_text(tmp_path):
    data = corpus(124, 60000)
    p = os.fspath(tmp_path / "t.gz")
    with tg.open(p, "wb", 6) as f:
        assert f.mode == tg.WRITE
        f.write(data[:4000])
        f.flush()  # sync-flush mid-stream must keep stdlib-decodable
        f.write(data[4000:])
    with stdgzip.open(p, "rb") as f:
        assert f.read() == data
    with tg.open(p, "ab", 6) as f:
        f.write(b"MORE")
    with stdgzip.open(p, "rb") as f:
        assert f.read() == data + b"MORE"
    with tg.open(os.fspath(tmp_path / "x.gz"), "wt",
                 encoding="utf-8") as f:
        f.write("hello\nworld\n")
    with stdgzip.open(os.fspath(tmp_path / "x.gz"), "rt") as f:
        assert f.read() == "hello\nworld\n"
    # FNAME: stdlib exposes the member name via the header
    raw = open(p, "rb").read()
    assert b"t\x00" in raw[:16]


def test_error_classes_match_stdlib():
    data = corpus(125, 30000)
    full = tg.compress(data, 6)
    for mod in (stdgzip, tg):
        with pytest.raises(EOFError):
            mod.decompress(full[:-5])
        bad = bytearray(full)
        bad[-5] ^= 0xFF
        with pytest.raises(mod.BadGzipFile):
            mod.decompress(bytes(bad))
        with pytest.raises(mod.BadGzipFile):
            mod.decompress(b"\x00\x01notgzip")
        f = mod.GzipFile(fileobj=io.BytesIO(full[:-5]), mode="rb")
        with pytest.raises(EOFError):
            f.read()


def test_sizes_at_or_below_stdlib():
    data = corpus(126, 200000)
    for lvl in (1, 6, 9):
        ours = len(tg.compress(data, lvl, mtime=0))
        theirs = len(stdgzip.compress(data, lvl, mtime=0))
        assert ours <= theirs, (lvl, ours, theirs)
