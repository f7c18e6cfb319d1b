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


def agree(payload):
    results = {name: run(fn, payload) for name, fn in FRONTENDS.items()}
    vals = list(results.values())
    for v in vals[1:]:
        assert v == vals[0], (payload.hex(), results.keys(), vals[0][0],
                              v[0])


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
