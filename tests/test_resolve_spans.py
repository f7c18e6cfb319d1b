"""Span resolver (ops/resolve_spans + native planner) — byte-exact
against stdlib zlib across content classes, window carry, preset
dictionaries, stored blocks, and randomized structure fuzz."""

import random
import zlib

import numpy as np
import pytest

from tbz import reference
from tbz.native import loader
from tbz.ops import resolve_spans as rs

from util import corpus

pytestmark = pytest.mark.skipif(not loader.available(),
                                reason="needs native planner")


def roundtrip(data, level=9, window=b""):
    if window:
        co = zlib.compressobj(level, zlib.DEFLATED, -15, zdict=window)
    else:
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    res = reference.tokenize_host(payload, 0, window_len=len(window))
    return rs.resolve_spans_bytes(res.tape, payload, window)


@pytest.mark.parametrize("name,data", [
    ("empty", b""),
    ("one", b"x"),
    ("run", b"a" * 200000),
    ("repeat", b"hello world " * 20000),
    ("text", corpus(11, 1 << 18)),
    ("cross-chunk", corpus(12, (1 << 17) + 12345)),
])
def test_roundtrip_classes(name, data):
    assert roundtrip(data) == data


def test_random_bytes():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 300000, dtype=np.uint8))
    assert roundtrip(data) == data


def test_stored_blocks():
    data = corpus(13, 150000)
    co = zlib.compressobj(0, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    res = reference.tokenize_host(payload, 0)
    assert rs.resolve_spans_bytes(res.tape, payload, b"") == data


def test_preset_dictionary_window():
    data = corpus(14, 50000)
    zdict = corpus(15, 4000)
    assert roundtrip(data, window=zdict) == data
    big_dict = corpus(16, 40000)  # > 32KB: only the tail applies
    assert roundtrip(data, window=big_dict[-32768:]) == data


def test_deep_overlap_chains():
    """Chained short-period copies exercise the doubling decomposition
    and the generation machinery (deflate.lisp:244-359 overlap cases)."""
    data = (b"\x00" * 1000 + b"ab" * 700 + b"xyz" * 500) * 40
    assert roundtrip(data) == data


def test_structure_fuzz():
    rng = random.Random(9)
    nprng = np.random.default_rng(9)
    for _ in range(8):
        parts = []
        for _ in range(rng.randrange(1, 6)):
            k = rng.randrange(5)
            if k == 0:
                parts.append(bytes([rng.randrange(256)])
                             * rng.randrange(1, 70000))
            elif k == 1:
                parts.append(bytes(nprng.integers(
                    0, 256, rng.randrange(1, 40000), dtype=np.uint8)))
            elif k == 2:
                parts.append((b"pat%d" % rng.randrange(10))
                             * rng.randrange(1, 6000))
            elif k == 3:
                parts.append(corpus(rng.randrange(100), 20000))
            else:
                parts.append(b"ab" * rng.randrange(1, 30000))
        data = b"".join(parts)
        level = rng.choice([0, 1, 6, 9])
        assert roundtrip(data, level) == data, (len(data), level)


def test_planner_invariants():
    """Every span is a plain copy (src + len <= dst), lengths <= 255,
    chunk-pure, and batches are generation-sorted."""
    data = corpus(17, 1 << 18)
    payload = zlib.compress(data, 6)[2:-4]
    res = reference.tokenize_host(payload, 0)
    plan = loader.plan_spans(res.tape, payload)
    B = plan.batch
    src = plan.srclen & 0x3FFFF
    ln = plan.srclen >> 18
    dst = plan.dst
    live = ln > 0
    assert (ln <= 255).all()
    # plain copies in local coords: every live span either sources the
    # already-resolved region fully before its dst (non-overlap) or the
    # static literal slice (local coords >= 96KB)
    lit_base = (rs.W_ROWS + rs.CHUNK_ROWS) * 128
    plain = src[live] + ln[live] <= dst[live]
    is_lit = src[live] >= lit_base
    assert (plain | is_lit).all()
    # dst stays inside the chunk region of the local space
    assert (dst[live] >= 32768).all() and (
        (dst[live] + ln[live]) <= 98304).all()
    assert plan.n_batches * B == len(plan.srclen)
    assert plan.max_gen >= 1


def test_api_device_backend_uses_span_resolver():
    from tbz import api
    data = corpus(18, 1 << 17)
    payload = zlib.compress(data, 9)
    assert api.decompress(payload, "zlib", backend="device") == data


def test_full_device_pipeline_speculative_plus_spans():
    """The whole-stream device decode path: config routes the frontend
    to the speculative lane tokenizer (stream >= 64KB) and the backend
    to the span resolver + device checksum verify — byte-exact through
    the public API."""
    from tbz import api
    from tbz.ops import tokenize_device as td
    from tbz.utils import config as cfgmod
    data = corpus(19, 1 << 21)
    payload = zlib.compress(data, 9)
    assert len(payload) - 6 >= td.SPECULATIVE_MIN_BYTES
    old = cfgmod.get_config()
    try:
        cfgmod.set_config(cfgmod.Config(backend="device",
                                        frontend="device",
                                        device_checksums=True))
        assert api.decompress(payload, "zlib") == data
    finally:
        cfgmod.set_config(old)
