#!/usr/bin/env python
"""Stage decomposition of the two device kernels (round 5).

Times jitted PREFIXES of the batched tokenize kernel (table build;
+lane scan; +stitch; full) and per-pass cost / pass count of the fused
resolve's pointer doubling, so optimization effort lands on the
measured stage, not a guess. Values are fetched (tunnel rule); each
prefix returns scalar sums so XLA can't DCE the work.

One chip job; run alone.
"""
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

import jax  # noqa: E402

bench._enable_compile_cache(jax)
import jax.numpy as jnp  # noqa: E402

import tbz.ops.batched as BT  # noqa: E402
import tbz.ops.fused as FU  # noqa: E402
import tbz.ops.speculative as SP  # noqa: E402
from tbz.native import loader as NL  # noqa: E402
from tbz.ops.tokenize_device import _entry_consts, build_flat_table  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=3):
    vals = []
    out = fn(*args)
    _ = np.asarray(out)  # warm compile
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        vals.append((time.perf_counter() - t0) * 1e3)
    return min(vals)


def main():
    data = bench.make_corpus(1 << 20)
    pe = zlib.compress(data, 6)[2:-4]
    nbits = len(pe) * 8
    plan = BT._build_plan(nbits, NL.scan_headers(pe), 8192)
    log(f"plan: Ln={plan.Ln} L={plan.L} S={plan.S} B={plan.B}")
    data32 = SP.stage_stream_device(pe)
    dev = jax.device_put((jnp.asarray(plan.lit_pad),
                          jnp.asarray(plan.dist_pad),
                          jnp.asarray(plan.tbl_idx),
                          jnp.asarray(plan.lane_starts),
                          jnp.asarray(plan.lane_ends),
                          jnp.asarray(plan.seg_id),
                          jnp.asarray(plan.seg_sym)))
    lit_pad, dist_pad, tbl_idx, ls, le, seg_id, seg_sym = dev
    L, S, B, n_out = plan.L, plan.S, plan.B, plan.n_out

    import functools

    @functools.partial(jax.jit, static_argnames=("B",))
    def k_tables(lit_lens, dist_lens, B):
        lit_c, dist_c, _ = (jnp.asarray(x) for x in _entry_consts())
        lit_tabs, e1 = jax.vmap(
            lambda ln: build_flat_table(ln, lit_c, 288, True))(lit_lens)
        dist_tabs, e2 = jax.vmap(
            lambda ln: build_flat_table(ln, dist_c, 32, True))(dist_lens)
        return (jnp.sum(lit_tabs, dtype=jnp.uint32)
                + jnp.sum(dist_tabs, dtype=jnp.uint32)
                + jnp.sum(e1 + e2).astype(jnp.uint32))

    @functools.partial(jax.jit, static_argnames=("L", "S", "B"))
    def k_lanes(data32, lit_lens, dist_lens, tbl_idx, ls, le, total_bits,
                L, S, B):
        lit_c, dist_c, _ = (jnp.asarray(x) for x in _entry_consts())
        lit_tabs, _ = jax.vmap(
            lambda ln: build_flat_table(ln, lit_c, 288, True))(lit_lens)
        dist_tabs, _ = jax.vmap(
            lambda ln: build_flat_table(ln, dist_c, 32, True))(dist_lens)
        lit_flat = lit_tabs.reshape(B << 15)
        dist_flat = dist_tabs.reshape(B << 15)
        starts, packed, dist, exits, ok = BT._lanes_multi(
            data32, lit_flat, dist_flat, tbl_idx << 15, ls, le,
            total_bits, L, S)
        return (jnp.sum(starts) + jnp.sum(packed) + jnp.sum(dist)
                + jnp.sum(exits) + jnp.sum(ok))

    t_tab = timed(k_tables, lit_pad, dist_pad, B)
    t_lan = timed(k_lanes, data32, lit_pad, dist_pad, tbl_idx, ls, le,
                  np.int32(nbits), L, S, B)
    t_full = timed(
        lambda: BT._batched_kernel(data32, *dev, np.int32(nbits), L, S,
                                   B, n_out)[-1])
    log(f"tables(B={B}): {t_tab:.0f} ms | tables+lanes: {t_lan:.0f} ms | "
        f"full kernel: {t_full:.0f} ms")
    log(f"  => lanes ~{t_lan - t_tab:.0f} ms, stitch+compact "
        f"~{t_full - t_lan:.0f} ms (each incl. ~28ms RT once)")

    # ---- resolve doubling: pass count (host) + per-pass cost (chip) ----
    res = BT.tokenize_stream_batched(pe)
    ol = res.tape.out_len.astype(np.int64)
    di = res.tape.dist.astype(np.int64)
    starts = np.cumsum(ol) - ol
    total = int(ol.sum())
    tid = np.zeros(total, np.int64)
    tid[starts[ol > 0]] = 1
    tid = np.cumsum(tid) - 1
    q = np.arange(total, dtype=np.int64)
    d = di[tid]
    ts = starts[tid]
    dd = np.maximum(d, 1)
    parent = np.where(d > 0, ts - d + (q - ts) % dd, q)
    parent = np.clip(parent, 0, total - 1)
    passes = 0
    while True:
        p2 = parent[parent]
        passes += 1
        if np.array_equal(p2, parent):
            break
        parent = p2
    log(f"resolve: {len(ol)} tokens, {total} bytes, doubling passes to "
        f"fixpoint (mod-init) = {passes}")

    cap = 1 << 20

    @functools.partial(jax.jit, static_argnames=("k", "cap"))
    def k_double(parent0, k, cap):
        p = parent0

        def body(i, p):
            return p[p]
        p = jax.lax.fori_loop(0, k, body, p)
        return jnp.sum(p)

    p0 = jnp.asarray(np.clip(parent, 0, cap - 1).astype(np.int32))
    p0 = jnp.pad(p0, (0, cap - p0.shape[0]))
    for k in (1, 4, 8):
        t = timed(k_double, p0, k, cap)
        log(f"  fixed {k:2d} doubling passes over {cap} elems: {t:.0f} ms")


if __name__ == "__main__":
    main()
