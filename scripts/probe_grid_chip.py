#!/usr/bin/env python
"""On-chip probe: grid span resolver vs classic, resident-plan two-size
slope. Run on the axon TPU (no JAX_PLATFORMS override). All detail to
stderr; exits nonzero on mismatch.

Methodology (CLAUDE.md / memory/env-axon-tpu.md): time by fetching a
value (block_until_ready lies through the tunnel), salt an argument to
defeat result caching, plans device_put once, report the marginal rate
between two sizes so per-call tunnel floor (~28ms) cancels.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import zlib

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

    from bench import make_corpus
    from tbz import reference
    from tbz.native import loader
    from tbz.ops import resolve_spans as rs

    log(f"[probe] devices: {jax.devices()}")

    sizes = [2 << 20, 8 << 20]
    datas = [make_corpus(s) for s in sizes]
    payloads = [zlib.compress(d, 6)[2:-4] for d in datas]
    tapes = [reference.tokenize_host(p, 0).tape for p in payloads]

    @functools.partial(jax.jit, static_argnames=("n_rows_out",))
    def grid_sum(*args, n_rows_out, salt):
        first = args[0] + (salt - salt)
        out = rs._resolve_grid_impl(first, *args[1:], n_rows_out)
        return jnp.sum(out, dtype=jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("n_rows_out",))
    def classic_sum(*args, n_rows_out, salt):
        first = args[0] + (salt - salt)
        out = rs._resolve_spans_impl(first, *args[1:], n_rows_out)
        return jnp.sum(out.astype(jnp.uint32))

    def word_sum(data):
        n = len(data)
        pad = (-n) % 4
        a = np.frombuffer(data + b"\x00" * pad, np.uint8)
        return int(a.view("<u4").astype(np.uint64).sum() % (1 << 32))

    def byte_sum(data):
        return int(np.frombuffer(data, np.uint8).astype(np.uint64).sum()
                   % (1 << 32))

    def run_variant(tag, stage_fn, sum_fn, want_fn, reps=3):
        ts = []
        for si, (data, payload, tape) in enumerate(
                zip(datas, payloads, tapes)):
            t0 = time.perf_counter()
            np_args, n_rows = stage_fn(tape, payload)
            t_plan = time.perf_counter() - t0
            args = [jax.device_put(jnp.asarray(a)) for a in np_args]
            t0 = time.perf_counter()
            s = int(sum_fn(*args, n_rows_out=n_rows, salt=jnp.uint32(0)))
            t_warm = time.perf_counter() - t0
            want = want_fn(data)
            if s != want:
                log(f"[probe] {tag} size={len(data)}: MISMATCH {s} != {want}")
                sys.exit(1)
            best = None
            for it in range(reps):
                t0 = time.perf_counter()
                int(sum_fn(*args, n_rows_out=n_rows,
                           salt=jnp.uint32(it + 1)))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            ts.append(best)
            log(f"[probe] {tag} size={len(data) >> 20}MB: plan {t_plan*1e3:.0f}ms "
                f"warm/compile {t_warm:.1f}s best {best*1e3:.1f}ms")
        slope = ((sizes[1] - sizes[0]) / (ts[1] - ts[0])
                 if ts[1] > ts[0] else float("inf"))
        log(f"[probe] {tag}: marginal {slope / 1e9:.3f} GB/s "
            f"(t={ts[0]*1e3:.1f}/{ts[1]*1e3:.1f}ms)")
        return slope

    @functools.partial(jax.jit,
                       static_argnames=("n_rows_out", "seg_rows"))
    def flat_sum(*args, n_rows_out, seg_rows, salt):
        first = args[0] + (salt - salt)
        out = rs._resolve_flat_impl(first, *args[1:], n_rows_out, seg_rows)
        return jnp.sum(out, dtype=jnp.uint32)

    results = {}

    only = sys.argv[1] if len(sys.argv) > 1 else None

    for G, K, SR in ((4096, 4, 8192), (4096, 4, 2048), (4096, 8, 8192)):
        if only and only != "flat":
            break
        seg_holder = {}

        def stage_flat(tape, payload, G=G, K=K, SR=SR, hold=seg_holder):
            plan = loader.plan_spans_flat(tape, payload, G=G, K=K,
                                          seg_rows=SR)
            hold["seg"] = plan.seg_rows
            return rs.stage_flat_plan(plan)

        def flat_sum_seg(*args, n_rows_out, salt, hold=seg_holder):
            return flat_sum(*args, n_rows_out=n_rows_out,
                            seg_rows=hold["seg"], salt=salt)

        results[f"flat_G{G}K{K}S{SR}"] = run_variant(
            f"flat G={G} K={K} seg={SR}", stage_flat, flat_sum_seg,
            word_sum)

    def stage_classic(tape, payload):
        plan = loader.plan_spans(tape, payload)
        return rs.stage_plan(plan)

    if only is None:
        results["classic"] = run_variant("classic", stage_classic,
                                         classic_sum, byte_sum)

    for K in (4, 2, 8):
        if only is not None:
            break
        def stage_grid(tape, payload, K=K):
            plan = loader.plan_spans_grid(tape, payload, K=K)
            return rs.stage_grid_plan(plan)
        results[f"grid_K{K}"] = run_variant(
            f"grid K={K}", stage_grid, grid_sum, word_sum)

    log("[probe] summary: " + "  ".join(
        f"{k}={v / 1e9:.3f}GB/s" for k, v in results.items()))


if __name__ == "__main__":
    main()
