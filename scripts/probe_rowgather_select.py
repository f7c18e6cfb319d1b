#!/usr/bin/env python
"""Row-gather-emulated element gather probe (round 5).

probe_gather_shapes v2 measured width-8 row gather at ~700M rows/s vs
1D element gather at ~110M elem/s. This probes the full emulation
  y[i] = x[p[i]]  ==  rows = x.reshape(-1, w)[p >> lg] ; select(rows, p & (w-1))
at 1M indices for w in {2,4,8,16} and two select strategies (one-hot
mult-sum vs where-cascade), checks bit-exactness against x[p], and
times a complete emulated doubling pass.

One chip job; run alone. Values fetched (tunnel rule).
"""
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


def timed(fn, reps=4):
    out = fn()
    _ = np.asarray(out)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = np.asarray(out)
        vals.append((time.perf_counter() - t0) * 1e3)
    return min(vals)


def slope(make, lo=4, hi=16):
    f_lo, f_hi = make(lo), make(hi)
    t_lo, t_hi = timed(f_lo), timed(f_hi)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def sel_onehot(rows, col, w):
    oh = (jnp.arange(w, dtype=jnp.int32)[None, :] == col[:, None])
    return jnp.sum(rows * oh, axis=1)


def sel_cascade(rows, col, w):
    lvl = w
    bit = w.bit_length() - 2
    while lvl > 1:
        half = lvl // 2
        take_hi = ((col >> bit) & 1) == 1
        rows = jnp.where(take_hi[:, None], rows[:, half:lvl],
                         rows[:, :half])
        lvl = half
        bit -= 1
    return rows[:, 0]


def main():
    N = 1 << 20
    rng = np.random.default_rng(11)
    xv = rng.integers(0, N, N, dtype=np.int32)
    pv = rng.integers(0, N, N, dtype=np.int32)
    x0 = jnp.asarray(xv)
    p0 = jnp.asarray(pv)
    want = xv[pv]

    # correctness once per (w, sel)
    for w in (2, 4, 8, 16):
        lg = w.bit_length() - 1
        for name, sel in (("onehot", sel_onehot), ("cascade", sel_cascade)):
            @jax.jit
            def emu(x, p, w=w, lg=lg, sel=sel):
                rows = x.reshape(-1, w)[p >> lg]
                return sel(rows, p & (w - 1), w)

            got = np.asarray(emu(x0, p0))
            ok = np.array_equal(got, want)

            def mk(k, w=w, lg=lg, sel=sel):
                @jax.jit
                def f(x, p):
                    def body(i, p):
                        rows = x.reshape(-1, w)[p >> lg]
                        return sel(rows, p & (w - 1), w)
                    return jnp.sum(jax.lax.fori_loop(0, k, body, p))
                return lambda: f(x0, p0)

            m, tlo, thi = slope(mk)
            log(f"w={w:2d} {name:7s}: exact={ok} {m:.2f} ms/gather-pass "
                f"({N/m/1e3:.0f} M elem/s) [k4={tlo:.0f} k16={thi:.0f}]")

    # full doubling pass p <- p[p] emulated at best-guess w=8 cascade,
    # including the convergence check
    for w in (4, 8):
        lg = w.bit_length() - 1

        def mkd(k, w=w, lg=lg):
            @jax.jit
            def f(p):
                def body(i, st):
                    p, acc = st
                    rows = p.reshape(-1, w)[p >> lg]
                    p2 = sel_cascade(rows, p & (w - 1), w)
                    return p2, acc + jnp.any(p2 != p)
                p, acc = jax.lax.fori_loop(0, k, body, (p, jnp.int32(0)))
                return jnp.sum(p) + acc
            return lambda: f(p0)

        m, tlo, thi = slope(mkd)
        log(f"doubling w={w} cascade + convergence: {m:.2f} ms/pass "
            f"[k4={tlo:.0f} k16={thi:.0f}]")


if __name__ == "__main__":
    main()
