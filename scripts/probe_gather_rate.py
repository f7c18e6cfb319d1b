#!/usr/bin/env python
"""Primitive probe: row-gather and row-scatter-add rate vs table size
on the axon chip. Methodology per memory/env-axon-tpu.md: real kernels
(scan of gathers, salted), value-fetch timing, two-length slope."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    B = 16384          # rows gathered per step

    @functools.partial(jax.jit, static_argnames=("steps",))
    def gather_scan(table, idx, salt, steps: int):
        def step(acc, i):
            rows = table[(idx + i + salt) % table.shape[0]]
            return acc + jnp.sum(rows, dtype=jnp.uint32), None
        acc, _ = jax.lax.scan(step, jnp.uint32(0),
                              jnp.arange(steps, dtype=jnp.int32))
        return acc

    @functools.partial(jax.jit, static_argnames=("steps",))
    def scatter_scan(table, idx, contrib, salt, steps: int):
        def step(tab, i):
            return tab.at[(idx + i + salt) % tab.shape[0]].add(contrib), None
        tab, _ = jax.lax.scan(step, table,
                              (jnp.arange(steps, dtype=jnp.int32)))
        return jnp.sum(tab[0], dtype=jnp.uint32)

    rng = np.random.default_rng(7)
    for rows_pow in (11, 13, 15, 16, 17):   # 256KB .. 16MB at 128B rows
        R = 1 << rows_pow
        table = jax.device_put(
            jnp.asarray(rng.integers(0, 255, (R, 32), dtype=np.uint32)))
        idx = jax.device_put(
            jnp.asarray(rng.integers(0, R, B, dtype=np.int32)))
        for tag, fn in (("gather", lambda s, steps: int(gather_scan(
                table, idx, jnp.int32(s), steps=steps))),):
            fn(0, 4)  # warm
            ts = {}
            for steps in (16, 64):
                best = None
                for it in range(3):
                    t0 = time.perf_counter()
                    fn(it + 1, steps)
                    dt = time.perf_counter() - t0
                    best = dt if best is None or dt < best else best
                ts[steps] = best
            slope = (64 - 16) * B / (ts[64] - ts[16])
            log(f"[probe] {tag} table {R * 128 >> 10}KB: "
                f"{slope / 1e6:.0f}M rows/s "
                f"({ts[16]*1e3:.1f}/{ts[64]*1e3:.1f}ms)")
    # scatter-add rate at one representative size
    R = 1 << 15
    table = jax.device_put(jnp.zeros((R, 32), jnp.uint32))
    idx = jax.device_put(jnp.asarray(rng.integers(0, R, 4096, dtype=np.int32)))
    contrib = jax.device_put(
        jnp.asarray(rng.integers(0, 255, (4096, 32), dtype=np.uint32)))
    int(scatter_scan(table, idx, contrib, jnp.int32(0), steps=4))
    ts = {}
    for steps in (16, 64):
        best = None
        for it in range(3):
            t0 = time.perf_counter()
            int(scatter_scan(table, idx, contrib, jnp.int32(it), steps=steps))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        ts[steps] = best
    slope = (64 - 16) * 4096 / (ts[64] - ts[16])
    log(f"[probe] scatter-add 4MB table: {slope / 1e6:.0f}M rows/s")


if __name__ == "__main__":
    main()
