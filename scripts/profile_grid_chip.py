#!/usr/bin/env python
"""Profile the grid resolver on-chip: jax.profiler trace of 3 salted
runs at 8MB, then parse the trace for per-op device durations."""
import functools
import glob
import gzip
import json
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

    data = make_corpus(8 << 20)
    payload = zlib.compress(data, 6)[2:-4]
    tape = reference.tokenize_host(payload, 0).tape
    variant = sys.argv[1] if len(sys.argv) > 1 else "grid"
    if variant == "flat":
        plan = loader.plan_spans_flat(tape, payload, G=4096, K=4)
        np_args, n_rows = rs.stage_flat_plan(plan)

        def impl(first, *a, n_rows_out):
            return rs._resolve_flat_impl(first, *a, n_rows_out,
                                         plan.seg_rows)
    else:
        plan = loader.plan_spans_grid(tape, payload, K=4)
        np_args, n_rows = rs.stage_grid_plan(plan)

        def impl(first, *a, n_rows_out):
            return rs._resolve_grid_impl(first, *a, n_rows_out)
    args = [jax.device_put(jnp.asarray(a)) for a in np_args]
    log(f"[prof] variant={variant} n_batches={plan.n_batches} n_spans={plan.n_spans}")

    @functools.partial(jax.jit, static_argnames=("n_rows_out",))
    def grid_sum(*a, n_rows_out, salt):
        first = a[0] + (salt - salt)
        out = impl(first, *a[1:], n_rows_out=n_rows_out)
        return jnp.sum(out, dtype=jnp.uint32)

    int(grid_sum(*args, n_rows_out=n_rows, salt=jnp.uint32(0)))  # warm
    tdir = "/tmp/grid_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for it in range(3):
            int(grid_sum(*args, n_rows_out=n_rows, salt=jnp.uint32(it + 1)))

    # parse: sum device-side op durations by name
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    log(f"[prof] traces: {paths}")
    agg = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            t = json.load(f)
        pid_names = {}
        for ev in t.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        for ev in t.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" not in pname and "tpu" not in pname:
                continue
            name = ev.get("name", "?")
            agg.setdefault(name, [0, 0.0])
            agg[name][0] += 1
            agg[name][1] += ev.get("dur", 0) / 1e6  # us -> s
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:25]
    tot = sum(v[1] for _, v in agg.items())
    log(f"[prof] total device op time {tot:.3f}s over 3 runs")
    for name, (cnt, dur) in top:
        log(f"  {dur:8.4f}s x{cnt:<6} {name[:110]}")


if __name__ == "__main__":
    main()
