#!/usr/bin/env python
"""Gather-shape probe v2 (round 5): marginal per-op cost via in-kernel
fori_loop repetition and a two-count slope (k=4 vs k=16), removing the
~28ms tunnel RT that drowned v1. Each iteration is data-dependent on
the previous (indices perturbed by the running value) so XLA can't
hoist or batch the gathers.

One chip job; run alone. Values fetched (tunnel rule).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

import jax  # noqa: E402

bench._enable_compile_cache(jax)
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, *args, reps=4):
    out = fn(*args)
    _ = np.asarray(out)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        vals.append((time.perf_counter() - t0) * 1e3)
    return min(vals)


def slope(make, lo=4, hi=16):
    f_lo, f_hi = make(lo), make(hi)
    t_lo, t_hi = timed(f_lo), timed(f_hi)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def main():
    N = 1 << 20
    rng = np.random.default_rng(7)
    idx = rng.integers(0, N, N, dtype=np.int32)
    x0 = jnp.asarray(idx)

    def mk_elem(k):
        @jax.jit
        def f(x):
            def body(i, x):
                return x[x]
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return lambda: f(x0)

    m, lo, hi = slope(mk_elem)
    log(f"a) 1D elem gather p[p] {N}: {m:.2f} ms/pass "
        f"({N/m/1e3:.0f} M elem/s)  [k4={lo:.0f} k16={hi:.0f}]")

    for Wd in (8, 128):
        R = N // Wd

        def mk_ta(k, Wd=Wd, R=R):
            @jax.jit
            def f(x2):
                def body(i, x2):
                    ic = jnp.abs(x2) % R
                    return jnp.take_along_axis(x2, ic, axis=0)
                return jnp.sum(jax.lax.fori_loop(0, k, body, x2))
            x2v = x0.reshape(R, Wd)
            return lambda: f(x2v)

        m, lo, hi = slope(mk_ta)
        log(f"c/d) take_along_axis ({R},{Wd}): {m:.2f} ms/pass "
            f"({N/m/1e3:.0f} M elem/s)  [k4={lo:.0f} k16={hi:.0f}]")

    R = N // 8

    def mk_row(k):
        @jax.jit
        def f(x2):
            def body(i, x2):
                r = jnp.abs(x2[:, 0]) % R
                return x2[r]
            return jnp.sum(jax.lax.fori_loop(0, k, body, x2))
        x2v = jnp.abs(x0).reshape(R, 8)
        return lambda: f(x2v)

    m, lo, hi = slope(mk_row)
    log(f"e) row gather ({R} rows of 8): {m:.2f} ms/pass "
        f"({R/m/1e3:.0f} M rows/s, {N/m/1e3:.0f} M elem/s) "
        f"[k4={lo:.0f} k16={hi:.0f}]")

    M = N // 8

    def mk_sub(k):
        @jax.jit
        def f(x, s):
            def body(i, s):
                return x[s]
            return jnp.sum(jax.lax.fori_loop(0, k, body, s))
        return f

    s0 = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))

    def mk_sub2(k):
        f = mk_sub(k)
        return lambda: f(x0, s0)

    m, lo, hi = slope(mk_sub2)
    log(f"f) 1D elem gather subset {M} from {N}: {m:.2f} ms/pass "
        f"[k4={lo:.0f} k16={hi:.0f}]")

    def mk_conv(k):
        @jax.jit
        def f(x):
            def body(i, st):
                x, acc = st
                x2 = x[x]
                return x2, acc + jnp.any(x2 != x)
            x, acc = jax.lax.fori_loop(0, k, body,
                                       (x, jnp.int32(0)))
            return jnp.sum(x) + acc
        return lambda: f(x0)

    m, lo, hi = slope(mk_conv)
    log(f"g) doubling pass incl. convergence check: {m:.2f} ms/pass "
        f"[k4={lo:.0f} k16={hi:.0f}]")

    # h) elementwise ops baseline: how cheap is a cumsum / where pass
    def mk_cs(k):
        @jax.jit
        def f(x):
            def body(i, x):
                return jnp.cumsum(x) % N
            return jnp.sum(jax.lax.fori_loop(0, k, body, x))
        return lambda: f(x0)

    m, lo, hi = slope(mk_cs)
    log(f"h) cumsum {N}: {m:.2f} ms/pass [k4={lo:.0f} k16={hi:.0f}]")


if __name__ == "__main__":
    main()
