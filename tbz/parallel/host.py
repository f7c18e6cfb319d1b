"""Host-parallel decode of independent streams.

The single-host throughput configuration (BASELINE config 5's
one-machine analog): N independent raw/zlib/gzip streams decoded
concurrently on a thread pool — the C++ frontend releases the GIL, so
threads scale to physical cores. With caller-provided output buffers
(the known-size decompress-into contract, api.lisp:36-48) this is the
bench.py headline path: 2.0-2.3 GB/s decompressed on this harness's 4
shared cores vs libz's 0.30 GB/s single-thread (per-call output
allocation + first-touch page faults alone cost ~20% — reuse arenas).

For device-mesh decode (sharded resolve + on-device checksums) use
parallel.shard.decode_streams_sharded; this module never touches jax.
"""

from __future__ import annotations

import concurrent.futures
import os

from .. import api as _api
from ..errors import DeflateError

__all__ = ["compress_many", "decompress_many"]


def decompress_many(payloads, format: str = "auto", *, threads: int = 0,
                    out=None, verify: bool = True,
                    return_errors: bool = False):
    """Decode independent streams concurrently on host threads.

    payloads: list of bytes-like compressed streams (raw/zlib/gzip,
    per-stream auto-detect with format="auto").
    threads: pool width; 0 = one per CPU.
    out: optional list of writable per-stream buffers (bytearray /
    writable memoryview / uint8 ndarray), each at least the stream's
    decompressed size — skips output allocation and returns
    (buffer, n_written) pairs instead of bytes.
    return_errors: a corrupt stream yields its exception object at its
    position instead of aborting the batch (the per-stream error-value
    contract parallel.shard also follows); otherwise the first error
    propagates after all healthy streams finish.

    Returns a list in stream order: bytes (no `out`) or
    (buffer, n_written) tuples (with `out`).
    """
    payloads = list(payloads)
    if out is not None:
        out = list(out)
        if len(out) != len(payloads):
            raise ValueError("out must have one buffer per payload")
    n_threads = threads or min(32, os.cpu_count() or 4)

    def one(i):
        if out is None:
            return _api.decompress(payloads[i], format, verify=verify)
        n = _api.decompress_into(payloads[i], out[i], format,
                                 verify=verify)
        return (out[i], n)

    def guarded(i):
        try:
            return one(i)
        except DeflateError as e:
            return e

    with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
        results = list(ex.map(guarded, range(len(payloads))))
    if not return_errors:
        for r in results:
            if isinstance(r, DeflateError):
                raise r
    return results


def compress_many(datas, format: str = "zlib", level: int | None = None,
                  *, threads: int = 0, return_errors: bool = False,
                  **kw):
    """Compress independent buffers concurrently on host threads (the
    matcher / block planner / emitter are C++ and release the GIL).
    For ONE large buffer use tbz.compress(data, threads=N) instead
    (segment-parallel single stream). kw forwards to api.compress
    (zdict=, wbits=, ...). Returns a list in input order."""
    datas = list(datas)
    n_threads = threads or min(32, os.cpu_count() or 4)

    def one(i):
        try:
            return _api.compress(datas[i], format=format, level=level,
                                 **kw)
        except (DeflateError, ValueError) as e:
            if return_errors:
                return e
            raise

    with concurrent.futures.ThreadPoolExecutor(n_threads) as ex:
        return list(ex.map(one, range(len(datas))))
