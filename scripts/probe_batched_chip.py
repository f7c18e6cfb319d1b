#!/usr/bin/env python
"""On-chip probe for the batched tokenizer + fused decode (round 5).

Uses the PRODUCTION plan (_build_plan/_launch — advisor r4 #3) so the
probe measures exactly what production runs. Splits the old 'token
fetch' stage into kernel-execution wait (1-word fetch) vs pure D2H
(header / bound fetch), then times the fused device-resident decode
(ops/fused): e2e with output fetch, and resident (4-byte fetch).

One chip job; run alone. Timing rule (memory/env-axon-tpu.md): fetch
VALUES — block_until_ready lies on this tunnel.
"""
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

import jax  # noqa: E402

bench._enable_compile_cache(jax)

import tbz.ops.batched as BT  # noqa: E402
import tbz.ops.fused as FU  # noqa: E402
import tbz.ops.speculative as SP  # noqa: E402
from tbz.native import loader as NL  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_kernel(pe: bytes, chunk_bits: int, reps: int = 3):
    """Kernel wait vs D2H split for the batched tokenize kernel."""
    nbits = len(pe) * 8
    plan = BT._build_plan(nbits, NL.scan_headers(pe), chunk_bits)
    log(f"chunk_bits={chunk_bits}: Ln={plan.Ln} L={plan.L} S={plan.S} "
        f"B={plan.B} n_out={plan.n_out} hdr={plan.hdr_len} "
        f"bound={plan.bound} ({plan.bound * 4 / 1e6:.2f} MB fetch)")
    data32 = SP.stage_stream_device(pe)
    flat_d = BT._launch(data32, plan, nbits)
    _ = np.asarray(flat_d[:8])  # warm compile
    k_ms, h_ms, f_ms = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        flat_d = BT._launch(data32, plan, nbits)
        _ = np.asarray(flat_d[:8])            # kernel + 1 round trip
        t1 = time.perf_counter()
        _ = np.asarray(flat_d[:plan.hdr_len])  # header, pure D2H now
        t2 = time.perf_counter()
        first = np.asarray(flat_d[:plan.hdr_len + plan.bound])
        t3 = time.perf_counter()
        k_ms.append((t1 - t0) * 1e3)
        h_ms.append((t2 - t1) * 1e3)
        f_ms.append((t3 - t2) * 1e3)
    log(f"  kernel+RT  {sorted(round(x) for x in k_ms)} ms")
    log(f"  hdr D2H    {sorted(round(x) for x in h_ms)} ms "
        f"({plan.hdr_len * 4 / 1e3:.0f} KB)")
    log(f"  bound D2H  {sorted(round(x) for x in f_ms)} ms")
    return min(k_ms)


def probe_fused(pe: bytes, data: bytes, reps: int = 3):
    """Fused device-resident decode: e2e (output fetched) and resident
    (4-byte error-word fetch only)."""
    r = FU.decode_stream_fused(pe, collect_stats=True)
    if r is None:
        log("  fused: declined (no candidates)")
        return
    out, _, total, _, st = r
    assert out == data, "fused mismatch on chip!"
    log(f"  fused stats: {({k: round(v, 1) if isinstance(v, float) else v for k, v in st.items()})}")
    for fetch in (True, False):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = FU.decode_stream_fused(pe, fetch=fetch)
            ts.append((time.perf_counter() - t0) * 1e3)
        tag = "e2e(out fetched)" if fetch else "resident(4B fetch)"
        log(f"  fused {tag}: {sorted(round(x) for x in ts)} ms")


def main():
    data = bench.make_corpus(1 << 20)
    pe = zlib.compress(data, 6)[2:-4]
    log(f"payload {len(pe)} bytes, devices {jax.devices()}")
    for cb in (8192,):
        probe_kernel(pe, cb)
    probe_fused(pe, data)


if __name__ == "__main__":
    main()
