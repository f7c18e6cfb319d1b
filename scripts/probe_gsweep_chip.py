#!/usr/bin/env python
"""Latency-vs-throughput discriminator for the flat resolver: plan the
same 8MB payload at several (G, K) shapes and time the kernel on chip.
If wall time tracks BATCH COUNT, per-batch latency dominates (bigger
batches win); if it tracks SLOT COUNT, the kernel is throughput-bound
at its per-slot rate and only slot reduction helps."""
import functools
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import bench
bench._enable_compile_cache(jax)
from tbz import reference
from tbz.native import loader
from tbz.ops import resolve_spans as rs


@functools.partial(jax.jit, static_argnames=("n_rows_out", "seg_rows"))
def resolve_sum(*args, n_rows_out, seg_rows, salt):
    first = args[0] + (salt - salt)
    out = rs._resolve_flat_impl(first, *args[1:], n_rows_out, seg_rows)
    return jnp.sum(out, dtype=jnp.uint32)


def word_sum(data):
    pad = (-len(data)) % 4
    a = np.frombuffer(data + b"\x00" * pad, np.uint8)
    return int(a.view("<u4").astype(np.uint64).sum() % (1 << 32))


def main():
    data = bench.make_corpus(8 << 20)
    payload = zlib.compress(data, 6)[2:-4]
    res = reference.tokenize_host(payload, 0)
    want = word_sum(data)
    for G, K, seg_rows in ((4096, 4, 8192), (8192, 4, 8192),
                           (16384, 4, 8192), (8192, 2, 8192),
                           (16384, 2, 8192), (4096, 4, 16384),
                           (16384, 4, 16384)):
        plan = loader.plan_spans_flat(res.tape, payload, G=G, K=K,
                                      seg_rows=seg_rows)
        np_args, n_rows = rs.stage_flat_plan(plan)
        args = [jax.device_put(jnp.asarray(a)) for a in np_args]
        s = int(resolve_sum(*args, n_rows_out=n_rows,
                            seg_rows=plan.seg_rows, salt=jnp.uint32(0)))
        assert s == want, (G, K, "mismatch")
        ts = []
        for it in range(3):
            t0 = time.perf_counter()
            int(resolve_sum(*args, n_rows_out=n_rows,
                            seg_rows=plan.seg_rows,
                            salt=jnp.uint32(it + 1)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        slots = plan.n_batches * G * K
        print(f"G={G} K={K} seg_rows={seg_rows}: NB={plan.n_batches} "
              f"slots={slots/1e6:.2f}M spans={plan.n_spans/1e6:.2f}M "
              f"t={t * 1e3:.1f}ms  {slots / t / 1e6:.0f} Mslots/s "
              f"{8 / t / 1e3:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
