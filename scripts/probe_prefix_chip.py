#!/usr/bin/env python
"""On-chip probe for the PREFIX-DENSE resolver skeleton: an inner fori
over passes where each pass gathers (Gp*K) rows from a small carried
(halo+seg_rows, 32) u32 table, runs the 7-stage barrel, reduces K, and
adds the contribution DENSELY (dynamic-update-slice, no scatter).

Question: at what seg_rows does the carried table stay fast (VMEM
residency), and what is the per-slot rate incl. barrel + dense add?
Sweeps seg_rows x K. Times by fetching a checksum (block_until_ready
lies on axon); salts args to defeat result caching.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

import bench
bench._enable_compile_cache(jax)


@functools.partial(jax.jit,
                   static_argnames=("seg_rows", "Gp", "K", "n_pass"))
def kernel(tbl0, idx, off, seg_rows, Gp, K, n_pass, salt):
    """tbl0 (256+seg_rows, 32) u32; idx (n_pass, Gp*K) i32 table BYTE
    addresses; off (n_pass,) i32 dst row offsets for the dense add."""
    B = Gp * K
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    tbl0 = tbl0 + (salt - salt)

    def pass_body(p, tbl):
        sa = jax.lax.dynamic_slice(idx, (p, 0), (1, B)).reshape(B)
        u = sa >> 7
        a = sa & 127
        frame = tbl[u]                                   # (B, 32) u32
        # representative barrel: 5 word + 2 byte stages, rotate by a
        t = a
        q = t >> 2
        r = t & 3
        x = frame
        for k in range(5):
            sh = 1 << k
            rolled = jnp.concatenate([x[:, sh:], x[:, :sh]], axis=1)
            bit = ((q >> k) & 1).astype(bool)[:, None]
            x = jnp.where(bit, rolled, x)
        for k in range(2):
            sb = 8 << k
            nxt = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
            shifted = (jax.lax.shift_right_logical(x, jnp.uint32(sb))
                       | (nxt << jnp.uint32(32 - sb)))
            bit = ((r >> k) & 1).astype(bool)[:, None]
            x = jnp.where(bit, shifted, x)
        mask8 = jnp.where((lane128 >= a[:, None]), jnp.uint8(0xFF),
                          jnp.uint8(0))
        mask = jax.lax.bitcast_convert_type(
            mask8.reshape(B, 32, 4), jnp.uint32)
        x = x & mask
        contrib = x.reshape(Gp, K, 32).sum(axis=1, dtype=jnp.uint32)
        o = off[p]
        sl = jax.lax.dynamic_slice(tbl, (o, 0), (Gp, 32))
        return jax.lax.dynamic_update_slice(tbl, sl + contrib, (o, 0))

    tbl = jax.lax.fori_loop(0, n_pass, pass_body, tbl0)
    return jnp.sum(tbl, dtype=jnp.uint32)


def probe(seg_rows, Gp, K, n_pass, iters=3):
    rng = np.random.default_rng(7)
    R = 256 + seg_rows
    tbl0 = rng.integers(0, 2**32, (R, 32), dtype=np.uint32)
    idx = rng.integers(0, R * 128 - 128, (n_pass, Gp * K), dtype=np.int32)
    off = np.minimum(256 + (np.arange(n_pass, dtype=np.int32) * 37) %
                     max(1, seg_rows - Gp), R - Gp).astype(np.int32)
    d_tbl = jax.device_put(tbl0)
    d_idx = jax.device_put(idx)
    d_off = jax.device_put(off)
    int(kernel(d_tbl, d_idx, d_off, seg_rows, Gp, K, n_pass,
               jnp.uint32(0)))  # warm/compile
    ts = []
    for it in range(iters):
        t0 = time.perf_counter()
        int(kernel(d_tbl, d_idx, d_off, seg_rows, Gp, K, n_pass,
                   jnp.uint32(it + 1)))
        ts.append(time.perf_counter() - t0)
    slots = n_pass * Gp * K
    t = min(ts)
    return t, slots / t / 1e6


def main():
    print(f"[probe] devices: {jax.devices()}", file=sys.stderr)
    for seg_rows, Gp, K in (
        (2048, 1024, 4),
        (4096, 1024, 4),
        (8192, 1024, 4),
        (4096, 2048, 4),
        (4096, 1024, 8),
        (4096, 4096, 4),
    ):
        n_pass = 32
        t, mslots = probe(seg_rows, Gp, K, n_pass)
        print(f"seg_rows={seg_rows} Gp={Gp} K={K} passes={n_pass}: "
              f"{t * 1e3:.1f} ms  {mslots:.0f} M slots/s", flush=True)


if __name__ == "__main__":
    main()
