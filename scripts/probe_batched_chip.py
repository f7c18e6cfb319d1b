#!/usr/bin/env python
"""On-chip probe for the batched tokenizer (round 4).

Splits the 'token fetch' stage into kernel-execution wait vs D2H
transfer (time a 1-word fetch = kernel + round trip, then the bound
fetch = transfer), and A/Bs chunk_bits. One chip job; run alone.

Timing rule (memory/env-axon-tpu.md): fetch VALUES — block_until_ready
lies on this tunnel.
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
import tbz.ops.speculative as SP  # noqa: E402
from tbz.native import loader as NL  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(pe: bytes, chunk_bits: int, reps: int = 3):
    nbits = len(pe) * 8
    hdr, symb, bfin, hlit, hdist, lens = NL.scan_headers(pe)
    seg_ends = np.append(hdr[1:], nbits)
    lane_starts, lane_ends, seg_id = BT._plan_lanes(symb, seg_ends,
                                                    chunk_bits)
    Ln = len(lane_starts)
    Bn = len(hdr)
    L = 1 << max(4, (Ln - 1).bit_length())
    B = 1 << max(1, (Bn - 1).bit_length())
    S = max(256, (chunk_bits + BT.EXT_BITS) * 3 // 16)
    lane_ends_e = lane_ends + BT.EXT_BITS
    pad = L - Ln
    ls = np.concatenate([lane_starts, np.zeros(pad, np.int32)])
    le = np.concatenate([lane_ends_e, np.zeros(pad, np.int32)])
    si = np.concatenate([seg_id, np.zeros(pad, np.int32)])
    seg_sym = np.zeros(L, np.int32)
    seg_sym[:Ln] = symb[si[:Ln]]
    lit_pad = np.zeros((B, 288), np.int32)
    dist_pad = np.zeros((B, 32), np.int32)
    for i in range(Bn):
        lit_pad[i, :hlit[i]] = lens[i, :hlit[i]]
        dist_pad[i, :hdist[i]] = lens[i, hlit[i]:hlit[i] + hdist[i]]
    n_out = L * S
    hdr_len = 6 * L + 2 * B + 1
    covered = int((le[:Ln].astype(np.int64) - ls[:Ln].astype(np.int64)
                   ).sum())
    bound = min(n_out, covered // 5 + Ln)
    log(f"chunk_bits={chunk_bits}: Ln={Ln} L={L} S={S} B={B} "
        f"n_out={n_out} bound={bound} ({bound * 4 / 1e6:.2f} MB fetch)")

    data32 = SP.stage_stream_device(pe)
    dev = jax.device_put((jnp.asarray(lit_pad), jnp.asarray(dist_pad),
                          jnp.asarray(si), jnp.asarray(ls),
                          jnp.asarray(le), jnp.asarray(si),
                          jnp.asarray(seg_sym)))
    # warm compile
    flat_d = BT._batched_kernel(data32, *dev, np.int32(nbits), L, S, B,
                                n_out)
    _ = np.asarray(flat_d[:8])
    k_ms, f_ms, tot_ms = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        flat_d = BT._batched_kernel(data32, *dev, np.int32(nbits), L, S,
                                    B, n_out)
        _ = np.asarray(flat_d[:8])          # kernel + 1 round trip
        t1 = time.perf_counter()
        first = np.asarray(flat_d[:hdr_len + bound])   # pure D2H now
        t2 = time.perf_counter()
        k_ms.append((t1 - t0) * 1e3)
        f_ms.append((t2 - t1) * 1e3)
        tot_ms.append((t2 - t0) * 1e3)
        total = int(first[hdr_len - 1])
    log(f"  kernel+RT  {sorted(k_ms)} ms")
    log(f"  bound D2H  {sorted(f_ms)} ms")
    log(f"  total      {sorted(tot_ms)} ms  (real tokens {total})")
    return min(tot_ms)


def main():
    data = bench.make_corpus(1 << 20)
    pe = zlib.compress(data, 6)[2:-4]
    log(f"payload {len(pe)} bytes, devices {jax.devices()}")
    for cb in (2048, 4096, 8192):
        probe(pe, cb)


if __name__ == "__main__":
    main()
