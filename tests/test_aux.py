"""Aux subsystems: debug dumper, config, metrics, streaming Compressor."""

import gzip as _gzip
import zlib

import pytest

from tbz import api, debug
from tbz.streaming import Compressor, Decompressor
from tbz.utils.config import Config
from tbz.utils.profiling import Metrics

from util import corpus, raw_deflate


def test_dump_structure():
    payload = raw_deflate(corpus(1, 5000), 9)
    text = debug.dump(payload, out=False)
    assert "block 0:" in text and "FINAL" in text
    assert "finished=True" in text


def test_dump_tokens():
    payload = raw_deflate(b"abcabcabc", 9)
    text = debug.dump(payload, tokens=True, out=False)
    assert "literal" in text
    assert "match" in text


def test_dump_tree(capsys):
    from tbz import huffman
    lit, dist = huffman.fixed_tables()
    debug.dump_tree(dist, huffman.KIND_DIST)
    out = capsys.readouterr().out
    assert "match" in out


def test_config_env(monkeypatch):
    monkeypatch.setenv("TBZ_LEVEL", "9")
    monkeypatch.setenv("TBZ_BACKEND", "host")
    c = Config.from_env()
    assert c.level == 9 and c.backend == "host"


def test_metrics():
    m = Metrics()
    with m.stage("resolve", 1000):
        pass
    assert m.stages["resolve"].calls == 1
    assert "resolve" in m.report()


@pytest.mark.parametrize("fmt", ["raw", "zlib", "gzip"])
def test_compressor_streaming(fmt):
    data = corpus(9, 3 << 20)  # 3MB: exercises multi-segment path
    co = Compressor(fmt, level=6)
    out = b""
    for i in range(0, len(data), 123_457):
        out += co.compress(data[i:i + 123_457])
    out += co.flush()
    # decodes via stdlib and via our own streaming decoder
    if fmt == "zlib":
        assert zlib.decompress(out) == data
    elif fmt == "gzip":
        assert _gzip.decompress(out) == data
    else:
        assert zlib.decompressobj(-15).decompress(out) == data
    d = Decompressor(fmt)
    got = d.decompress(out) + d.flush()
    assert got == data


def test_compressor_empty():
    for fmt in ("raw", "zlib", "gzip"):
        co = Compressor(fmt)
        out = co.flush()
        assert api.decompress(out, fmt) == b""


def test_decompress_file_mmap(tmp_path):
    data = corpus(11, 200000)
    p = tmp_path / "x.gz"
    p.write_bytes(_gzip.compress(data, 9))
    assert api.decompress_file(str(p)) == data


def test_decompress_stream(tmp_path):
    import io
    data = corpus(12, 300000)
    payload = zlib.compress(data, 9)
    chunks = list(api.decompress_stream(io.BytesIO(payload),
                                        chunk_size=1000))
    assert b"".join(chunks) == data


def test_decompress_stream_resyncs_moved_position(tmp_path):
    """%resync-file-stream contract (io-common.lisp:60-63): a caller
    that moves the file position between pulls must not corrupt the
    decode — the iterator re-seeks to its own tracked offset."""
    import io
    data = corpus(13, 250000)
    payload = zlib.compress(data, 6)
    f = io.BytesIO(payload)
    gen = api.decompress_stream(f, chunk_size=1000)
    got = []
    for i, chunk in enumerate(gen):
        got.append(chunk)
        if i % 3 == 0:
            f.seek(0)  # caller wanders off between pulls
    assert b"".join(got) == data


def test_compressor_roundtrip_through_api():
    data = corpus(10, 100000)
    co = Compressor("gzip", 9, name="stream.bin")
    payload = co.compress(data) + co.flush()
    got, info = api.decompress(payload, "gzip", with_info=True)
    assert got == data
    assert info.members[0].header.name == "stream.bin"


def test_config_changes_pipeline_behavior():
    """Config is WIRED: set_config(backend='device') routes one-shot
    decode through the device resolver; profile=True populates stage
    metrics during real pipeline calls."""
    import zlib
    from tbz import api
    from tbz.utils import config as cfgmod, profiling

    data = b"wired config " * 3000
    payload = zlib.compress(data, 6)
    old = cfgmod.get_config()
    try:
        cfgmod.set_config(cfgmod.Config(backend="device", profile=True))
        profiling.metrics.reset()
        assert api.decompress(payload, "zlib") == data
        stages = profiling.metrics.stages
        assert "tokenize" in stages and "resolve.device" in stages, stages
        assert "verify.adler32" in stages
        assert stages["resolve.device"].bytes == len(data)
        # host routing records the host stage instead
        cfgmod.set_config(cfgmod.Config(backend="host", profile=True))
        profiling.metrics.reset()
        assert api.decompress(payload, "zlib") == data
        assert "inflate.host" in profiling.metrics.stages
        assert profiling.metrics.report()  # non-empty human report
    finally:
        cfgmod.set_config(old)
        profiling.metrics.reset()


def test_config_env_level(monkeypatch):
    """TBZ_* env reaches the pipeline (api.compress default level)."""
    from tbz.utils.config import Config
    monkeypatch.setenv("TBZ_LEVEL", "1")
    monkeypatch.setenv("TBZ_MESH_SP", "2")
    c = Config.from_env()
    assert c.level == 1 and c.mesh_sp == 2


def test_cli_roundtrip(tmp_path):
    """python -m tbz compress/decompress round trip (gzip framing)."""
    import subprocess
    import sys as _sys
    import os as _os
    data = corpus(21, 150000)
    src = tmp_path / "payload.bin"
    src.write_bytes(data)
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = dict(_os.environ)
    r = subprocess.run([_sys.executable, "-m", "tbz", "-c",
                        str(src)], capture_output=True, cwd=repo, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    import gzip as _g
    assert _g.decompress(r.stdout) == data
    gz = tmp_path / "payload.bin.gz"
    gz.write_bytes(r.stdout)
    r2 = subprocess.run([_sys.executable, "-m", "tbz", "-d", "-c",
                         str(gz)], capture_output=True, cwd=repo, env=env)
    assert r2.returncode == 0, r2.stderr[-500:]
    assert r2.stdout == data
