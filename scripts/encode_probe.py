#!/usr/bin/env python
"""Encode-speed helper: segment-parallel L6 on the bench corpus in a
clean process (the fork-based process pool must not run inside the
jax-initialized bench process). Prints ONE JSON line {"mbps": X,
"ratio": R} on stdout."""
import json
import os
import sys
import time
import zlib

size = int(sys.argv[1]) if len(sys.argv) > 1 else 4 << 20
level = int(sys.argv[2]) if len(sys.argv) > 2 else 6
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_corpus  # noqa: E402
from tbz import deflate_encode as de  # noqa: E402


def main():
    data = make_corpus(size)
    n = os.cpu_count() or 4
    de.deflate_raw_parallel(data[: 1 << 20], level)  # warm imports/.so
    t0 = time.perf_counter()
    out = de.deflate_raw_parallel(data, level, threads=n,
                                  executor="process")
    t = time.perf_counter() - t0
    assert zlib.decompressobj(-15).decompress(out) == data
    libz = len(zlib.compress(data, level)) - 6
    print(json.dumps({"mbps": size / t / 1e6, "ratio": len(out) / libz}))


if __name__ == "__main__":
    main()
