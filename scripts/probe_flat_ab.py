#!/usr/bin/env python
"""A/B the three flat-resolver kernel variants (nested fori, scan+slice
scatter, scan+global scatter) at the sweep's best plan configs, same
absolute method: full 8MB resolve, device-resident plan, checksum
fetch. Usage: probe_flat_ab.py [--cpu]."""
import functools
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

CPU = "--cpu" in sys.argv
import jax

if CPU:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import bench
if not CPU:
    bench._enable_compile_cache(jax)
from tbz import reference
from tbz.native import loader
from tbz.ops import resolve_spans as rs


def word_sum(data):
    pad = (-len(data)) % 4
    a = np.frombuffer(data + b"\x00" * pad, np.uint8)
    return int(a.view("<u4").astype(np.uint64).sum() % (1 << 32))


@functools.partial(jax.jit, static_argnames=("n_rows_out", "seg_rows"))
def run_nested(*args, n_rows_out, seg_rows, salt):
    first = args[0] + (salt - salt)
    out = rs._resolve_flat_impl(first, *args[1:], n_rows_out, seg_rows)
    return jnp.sum(out, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("n_rows_out", "seg_rows"))
def run_scan(*args, n_rows_out, seg_rows, salt):
    first = args[0] + (salt - salt)
    out = rs._resolve_flat_scan_impl(first, *args[1:], n_rows_out,
                                     seg_rows)
    return jnp.sum(out, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("n_rows_out",))
def run_gscat(*args, n_rows_out, salt):
    first = args[0] + (salt - salt)
    out = rs._resolve_flat_gscat_impl(first, *args[1:], n_rows_out)
    return jnp.sum(out, dtype=jnp.uint32)


def main():
    size = (1 << 20) if CPU else (8 << 20)
    data = bench.make_corpus(size)
    payload = zlib.compress(data, 6)[2:-4]
    res = reference.tokenize_host(payload, 0)
    want = word_sum(data)
    for G, K, seg_rows in ((4096, 4, 16384), (4096, 4, 8192)):
        plan = loader.plan_spans_flat(res.tape, payload, G=G, K=K,
                                      seg_rows=seg_rows)
        np_args, n_rows = rs.stage_flat_plan(plan)
        NB = max(plan.n_batches, 1)
        NB_pad = np_args[0].shape[0]
        b_segrow = np.full(NB_pad, rs.W_ROWS, np.int32)
        if plan.n_batches:
            b_segrow[:NB] = plan.b_segrow
        g_glob = (np_args[2] + b_segrow[:, None]).astype(np.int32)

        base = [jax.device_put(jnp.asarray(a)) for a in np_args]
        d_segrow = jax.device_put(jnp.asarray(b_segrow))
        d_gglob = jax.device_put(jnp.asarray(g_glob))
        variants = {
            "nested": lambda s: run_nested(
                *base, n_rows_out=n_rows, seg_rows=plan.seg_rows,
                salt=jnp.uint32(s)),
            "scan  ": lambda s: run_scan(
                base[0], base[1], base[2], d_segrow, base[6], base[7],
                n_rows_out=n_rows, seg_rows=plan.seg_rows,
                salt=jnp.uint32(s)),
            "gscat ": lambda s: run_gscat(
                base[0], base[1], d_gglob, base[6], base[7],
                n_rows_out=n_rows, salt=jnp.uint32(s)),
        }
        for name, fn in variants.items():
            got = int(fn(0))
            ok = "OK " if got == want else "BAD"
            ts = []
            for it in range(3):
                t0 = time.perf_counter()
                int(fn(it + 1))
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print(f"{name} G={G} K={K} seg={seg_rows}: {ok} "
                  f"t={t * 1e3:.1f}ms  {size / t / 1e9:.3f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
