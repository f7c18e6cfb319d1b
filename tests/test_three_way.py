"""Three-way frontend agreement fuzz: python oracle, C++ native, and
all-device tokenizer must produce identical tapes AND identical error
classifications on random valid, corrupted, and truncated streams —
the strongest form of the reference's monomorphized-readers contract."""

import random
import zlib

import numpy as np
import pytest

from tbz import reference
from tbz.errors import DeflateError, TruncatedError
from tbz.native import loader
from tbz.ops.tokenize_device import tokenize_device

from util import corpus, raw_deflate

FRONTENDS = {
    "python": reference.tokenize_host,
    "device": tokenize_device,
}
if loader.available():
    FRONTENDS["native"] = loader.tokenize


def run(fn, payload):
    try:
        r = fn(payload)
        return ("ok", tuple(r.tape.out_len.tolist()),
                tuple(r.tape.dist.tolist()),
                tuple(r.tape.root_val.tolist()), r.end_bit, r.finished)
    except TruncatedError:
        return ("trunc",)
    except DeflateError as e:
        return ("err", e.code)


def agree(payload, fns=None):
    results = {name: run(fn, payload)
               for name, fn in (fns or FRONTENDS).items()}
    vals = list(results.values())
    for v in vals[1:]:
        assert v == vals[0], (payload.hex()[:200], results.keys(),
                              vals[0][0], v[0])


def test_valid_streams():
    for seed in range(3):
        data = corpus(seed + 100, 1 << 12)
        for lvl in (0, 6, 9):
            agree(raw_deflate(data, lvl))


def test_corrupted_streams():
    rng = random.Random(123)
    payload = bytearray(raw_deflate(corpus(104, 1 << 11), 9))
    for _ in range(40):
        i = rng.randrange(len(payload))
        b = 1 << rng.randrange(8)
        payload[i] ^= b
        agree(bytes(payload))
        payload[i] ^= b


def test_truncated_streams():
    payload = raw_deflate(corpus(105, 1 << 10), 9)
    for cut in range(0, len(payload), 23):
        agree(payload[:cut])


def test_random_garbage():
    rng = random.Random(7)
    for _ in range(40):
        agree(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40))))


# --- production device tier (>= SPECULATIVE_MIN_BYTES) ----------------------
# frontend.tokenize(frontend='device') routes large streams through the
# speculative multi-lane decoder, NOT tokenize_device — so the fuzz must
# cover that tier too (deferred distance validation, lane stitching, and
# native gap decode all sit on corruption-sensitive paths).

def _speculative_frontends():
    from tbz.ops.tokenize_device import tokenize_auto, SPECULATIVE_MIN_BYTES
    fns = dict(FRONTENDS)
    fns["device"] = tokenize_auto
    # mixed compressible text + incompressible tail keeps the payload
    # above the tier floor without a huge decode (fuzz budget)
    rng = random.Random(900)
    data = corpus(900, 96 << 10) + bytes(rng.randrange(256)
                                         for _ in range(52 << 10))
    payload = raw_deflate(data, 9)
    assert len(payload) >= SPECULATIVE_MIN_BYTES
    return fns, payload


def test_speculative_tier_valid():
    fns, payload = _speculative_frontends()
    agree(payload, fns)
    # multi-block: stored + static + dynamic mix stays >= the tier floor
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    mixed = (co.compress(corpus(901, 40 << 10)) + co.flush(zlib.Z_FULL_FLUSH)
             + raw_deflate(b"\x00" * 70000, 0))
    # stitch the two raw streams: strip the first's final-block flag is
    # not needed — Z_FULL_FLUSH keeps bfinal=0; the stored tail carries it
    agree(bytes(mixed), fns)


def test_speculative_tier_bitflips():
    fns, payload = _speculative_frontends()
    payload = bytearray(payload)
    rng = random.Random(31337)
    for _ in range(25):
        i = rng.randrange(len(payload))
        b = 1 << rng.randrange(8)
        payload[i] ^= b
        agree(bytes(payload), fns)
        payload[i] ^= b


def test_speculative_tier_truncations():
    fns, payload = _speculative_frontends()
    for cut in (len(payload) - 1, len(payload) * 2 // 3, 64 << 10):
        agree(payload[:cut], fns)


def test_tier_boundary_seam():
    """The dispatch seam itself (tokenize_auto at SPECULATIVE_MIN_BYTES,
    tokenize_device.py): payloads of exactly floor-1 / floor / floor+1
    bytes, valid + one bit-flip pass each, must agree across frontends
    whichever tier the dispatcher picks."""
    from tbz.ops.tokenize_device import tokenize_auto, SPECULATIVE_MIN_BYTES
    fns = dict(FRONTENDS)
    fns["device"] = tokenize_auto
    rng = random.Random(424242)
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    prefix = co.compress(corpus(910, 48 << 10)) + co.flush(zlib.Z_FULL_FLUSH)
    assert len(prefix) < SPECULATIVE_MIN_BYTES - 10
    for target in (SPECULATIVE_MIN_BYTES - 1, SPECULATIVE_MIN_BYTES,
                   SPECULATIVE_MIN_BYTES + 1):
        # stored final block sized to land the payload EXACTLY on target
        m = target - len(prefix) - 5
        stored = bytes([1]) + m.to_bytes(2, "little") \
            + (~m & 0xFFFF).to_bytes(2, "little") \
            + bytes(rng.randrange(256) for _ in range(m))
        payload = bytearray(prefix + stored)
        assert len(payload) == target
        agree(bytes(payload), fns)
        for _ in range(8):
            i = rng.randrange(len(payload))
            b = 1 << rng.randrange(8)
            payload[i] ^= b
            agree(bytes(payload), fns)
            payload[i] ^= b
