"""Device LZ77 span resolver — the TPU-native fast path.

Design (round 2, replacing the pointer-doubling gather resolver): the
only fast dynamic-indexing primitive on the target hardware is the 2D
ROW gather (`table[row_idx]`, lowered to DMA row fetches at ~90-400M
rows/s); element gather and take_along_axis are ~100x slower (measured —
see docs/ROADMAP.md). So resolution is reformulated as one row fetch per
span:

  - the C++ planner (frontend.cc tbz_plan_spans) rewrites the token tape
    into generation-sorted batches of plain contiguous copies: overlap
    copies become doubling pieces, literal/stored bytes are packed into
    a side buffer and become gen-0 spans sourcing it;
  - output is processed in 64KB chunks; the chunk-local byte space
    [32KB window | 64KB chunk | 66KB literal slice] lives as a
    (1288, 128) uint8 row table — small enough that its row gathers and
    scatters run at VMEM speeds;
  - per span: ONE 512-byte row fetch from an overlapping (stride-256)
    unit view covers any source span (len <= 255 by the planner), a
    9-stage per-row barrel shift aligns it to the destination offset
    (uniform shift within a row — vectorized across the whole batch),
    and three 128B-row scatter-adds place it (span bytes are disjoint,
    so uint8 adds never collide);
  - batches are generation-pure, so every span in a batch only reads
    bytes already resolved by earlier batches — the whole batch is one
    vectorized step of a lax.scan, no data-dependent control flow.

Semantics matched: deflate.lisp:244-359 (overlap/offset<8 copies via the
doubling decomposition), :121-137 (32KB window carry across chunks —
here carried between scan steps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

W_ROWS = 256          # 32KB window
CHUNK_ROWS = 512      # 64KB chunk
LIT_ROWS = 520        # chunk literal slice (64KB + alignment slack)
LOCAL_ROWS = W_ROWS + CHUNK_ROWS + LIT_ROWS  # 1288
CHUNK_OUT = CHUNK_ROWS * 128


@functools.partial(jax.jit, static_argnames=("n_rows_out",))
def _resolve_spans_impl(srclen, dst, b_first, b_chunk,
                        b_litrow, litrows, window_rows, n_rows_out: int):
    """srclen/dst: (NB, B) int32 packed spans, dst-sorted per batch;
    b_*: (NB,) int32 batch metadata; litrows: (LR, 128) uint8;
    window_rows: (W_ROWS, 128) uint8 preset window. Returns
    (n_rows_out, 128) uint8 resolved output rows."""
    B = srclen.shape[1]
    out0 = jnp.zeros((n_rows_out, 128), jnp.uint8)
    local0 = jnp.zeros((LOCAL_ROWS, 128), jnp.uint8).at[:W_ROWS].set(
        window_rows)
    lane384 = jax.lax.broadcasted_iota(jnp.int32, (1, 384), 1)

    def step(carry, xs):
        out, local = carry
        sl, ds, first, ch, litrow = xs

        # chunk transition: rebuild the small local table (the big `out`
        # carry is NEVER under a cond/select — that would copy it every
        # step; it only receives cheap 64KB slice-writes below)
        def transition(local):
            # window for this chunk: last 32KB of the previous chunk, or
            # the preset window when entering chunk 0
            win = jnp.where(ch > 0,
                            local[CHUNK_ROWS:W_ROWS + CHUNK_ROWS],
                            local[:W_ROWS])
            lit = jax.lax.dynamic_slice(litrows, (litrow, 0),
                                        (LIT_ROWS, 128))
            return (jnp.zeros_like(local)
                    .at[:W_ROWS].set(win)
                    .at[W_ROWS + CHUNK_ROWS:].set(lit))

        local = jax.lax.cond(first == 1, transition, lambda l: l, local)

        src = sl & 0x3FFFF
        ln = jax.lax.shift_right_logical(sl, 18) & 0xFF

        # source frame: two 256B row fetches from the plain table cover
        # [256u, 256u+512) >= any span (len<=255, offset<256)
        view2 = local.reshape(LOCAL_ROWS // 2, 256)
        u = src >> 8
        frame = jnp.concatenate(
            [view2[u], view2[jnp.minimum(u + 1, LOCAL_ROWS // 2 - 1)]],
            axis=1)                                            # (B, 512)

        # barrel-align: span sits at lane a in frame; move to lane o.
        # Output lanes [0, 384); needed input lanes [0, 384+255] — pad
        # the frame left by 128 (shift range) and right to 640.
        a = src & 255
        o = ds & 127
        m = a - o + 128                      # shift-left amount in (0, 384)
        x = jnp.concatenate(
            [jnp.zeros((B, 128), jnp.uint8), frame], axis=1)   # (B, 640)
        for k in range(9):
            s = 1 << k
            rolled = jnp.concatenate(
                [x[:, s:], jnp.zeros((B, s), jnp.uint8)], axis=1)
            bit = ((m >> k) & 1).astype(bool)[:, None]
            x = jnp.where(bit, rolled, x)
        al = x[:, :384]                                        # (B, 384)
        mask = (lane384 >= o[:, None]) & (lane384 < (o + ln)[:, None])
        al = jnp.where(mask, al, jnp.uint8(0))

        # place: three 128B pieces at plain local rows (dst>>7)+{0,1,2},
        # one combined scatter-add (span bytes are disjoint; no carries).
        # Measured alternatives on-chip: dense cumsum segment-sum 3x
        # WORSE (axis-0 cumsum is log-pass expensive); gathering only
        # boundary-crossing pieces via planner crossing lists a wash
        # (the extra row gathers cost what the saved scatter rows
        # saved). The scatter primitive (~83M rows/s) is the kernel's
        # floor at short span lengths.
        r0 = ds >> 7
        rows = jnp.concatenate([r0, r0 + 1, r0 + 2])
        pieces = jnp.concatenate(
            [al[:, :128], al[:, 128:256], al[:, 256:384]])
        local = local.at[rows].add(pieces)
        # publish the chunk's current state every batch (64KB write; the
        # chunk's LAST batch leaves the final bytes in place)
        out = jax.lax.dynamic_update_slice(
            out, local[W_ROWS:W_ROWS + CHUNK_ROWS], (ch * CHUNK_ROWS, 0))
        return (out, local), None

    (out, local), _ = jax.lax.scan(
        step, (out0, local0), (srclen, dst, b_first, b_chunk, b_litrow))
    return out


# --- grid resolver (round 3) ------------------------------------------------
# Round-2 profiling pinned the classic kernel's floor at the scatter-add:
# THREE 128B scatter rows per span at ~83M rows/s, with average spans of
# 4-8 bytes (30-50x write amplification). The grid formulation removes
# per-span scatters entirely: the planner (frontend.cc
# tbz_plan_spans_grid) chops every span to a single 128B output row and
# packs batches as 512 ROW-GROUPS x K SLOTS, so the kernel
#   - fetches ONE 256B frame per slot (row gather from the VMEM-sized
#     local table, the one fast dynamic-indexing primitive here),
#   - barrel-aligns in uint32 lanes (4x fewer vector elements than the
#     round-2 uint8 barrel, and 384B wide instead of 640B),
#   - sums each group's K masked slots densely, and
#   - lands the whole batch with ONE 512-row scatter-add (dup rows fine).
# Per 2048-span batch that is 512 scatter rows instead of 6144.

GRID_G = 512  # row-groups per batch (= frontend.cc kGridG)


@functools.partial(jax.jit, static_argnames=("n_rows_out",))
def _resolve_grid_impl(srclen, dstoff, g_rows, b_first, b_chunk, b_litrow,
                       litrows, window_rows, n_rows_out: int):
    """srclen (NB,G,K) int32 = src|len<<18 in chunk-local byte coords;
    dstoff (NB,G,K) uint8 in-row byte offset; g_rows (NB,G) int32 target
    LOCAL row per group; litrows (LR,32)/window_rows (W_ROWS,32) uint32
    word rows (little-endian bytes). Returns (n_rows_out, 32) uint32:
    output byte j = byte (j&3) of word [j>>7, (j>>2)&31]."""
    NB, G, K = srclen.shape
    B = G * K
    out0 = jnp.zeros((n_rows_out, 32), jnp.uint32)
    local0 = jnp.zeros((LOCAL_ROWS, 32), jnp.uint32).at[:W_ROWS].set(
        window_rows)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def step(carry, xs):
        out, local = carry
        sl, off, gr, first, ch, litrow = xs

        def transition(local):
            win = jnp.where(ch > 0,
                            local[CHUNK_ROWS:W_ROWS + CHUNK_ROWS],
                            local[:W_ROWS])
            lit = jax.lax.dynamic_slice(litrows, (litrow, 0),
                                        (LIT_ROWS, 32))
            return (jnp.zeros_like(local)
                    .at[:W_ROWS].set(win)
                    .at[W_ROWS + CHUNK_ROWS:].set(lit))

        local = jax.lax.cond(first == 1, transition, lambda l: l, local)

        sl_f = sl.reshape(B)
        src = sl_f & 0x3FFFF
        ln = jax.lax.shift_right_logical(sl_f, 18) & 0xFF
        o = off.reshape(B).astype(jnp.int32)

        # 256B source frames: overlapping stride-128 view as one table
        # (row i = words of rows i, i+1), ONE row fetch per slot
        t2 = jnp.concatenate(
            [local,
             jnp.concatenate([local[1:], jnp.zeros((1, 32), jnp.uint32)],
                             axis=0)], axis=1)          # (LOCAL_ROWS, 64)
        u = src >> 7
        a = src & 127
        frame = t2[u]                                   # (B, 64)

        # barrel: shift flat bytes LEFT by m = a-o+128 in [1,255];
        # 6 word stages + 2 byte-in-word stages, all uint32 lanes
        m = a - o + 128
        x = jnp.concatenate([jnp.zeros((B, 32), jnp.uint32), frame],
                            axis=1)                     # (B, 96)
        q = m >> 2
        r = m & 3
        for k in range(6):
            s = 1 << k
            rolled = jnp.concatenate(
                [x[:, s:], jnp.zeros((B, s), jnp.uint32)], axis=1)
            bit = ((q >> k) & 1).astype(bool)[:, None]
            x = jnp.where(bit, rolled, x)
        for k in range(2):
            sb = 8 << k
            nxt = jnp.concatenate(
                [x[:, 1:], jnp.zeros((B, 1), jnp.uint32)], axis=1)
            shifted = (jax.lax.shift_right_logical(x, jnp.uint32(sb))
                       | (nxt << jnp.uint32(32 - sb)))
            bit = ((r >> k) & 1).astype(bool)[:, None]
            x = jnp.where(bit, shifted, x)
        al = x[:, :32]                                  # (B, 32)

        # byte-granular span mask [o, o+len), built u8 then bitcast
        mask8 = jnp.where((lane128 >= o[:, None])
                          & (lane128 < (o + ln)[:, None]),
                          jnp.uint8(0xFF), jnp.uint8(0))
        mask = jax.lax.bitcast_convert_type(
            mask8.reshape(B, 32, 4), jnp.uint32)
        al = al & mask

        # dense K-reduction per group (disjoint bytes: add == or), then
        # ONE scatter-add of G rows for the whole batch
        contrib = (al.reshape(G, K, 32)
                   .sum(axis=1, dtype=jnp.uint32))      # (G, 32)
        local = local.at[gr].add(contrib)
        out = jax.lax.dynamic_update_slice(
            out, local[W_ROWS:W_ROWS + CHUNK_ROWS], (ch * CHUNK_ROWS, 0))
        return (out, local), None

    (out, local), _ = jax.lax.scan(
        step, (out0, local0),
        (srclen, dstoff, g_rows, b_first, b_chunk, b_litrow))
    return out


def stage_grid_plan(plan, window: bytes = b""):
    """Stage a host GridPlan into the padded argument tuple for
    _resolve_grid_impl. Returns (args, n_rows_out)."""
    NB = max(plan.n_batches, 1)
    NB_pad = _pad_batches(NB)
    G, K = GRID_G, plan.K
    srclen = np.zeros((NB_pad, G, K), np.int32)
    dstoff = np.zeros((NB_pad, G, K), np.uint8)
    g_rows = np.zeros((NB_pad, G), np.int32)
    srclen[:NB] = plan.srclen.reshape(NB, G, K)
    dstoff[:NB] = plan.dstoff.reshape(NB, G, K)
    g_rows[:NB] = plan.g_row.reshape(NB, G)
    b_first = np.zeros(NB_pad, np.int32)
    b_chunk = np.zeros(NB_pad, np.int32)
    b_litrow = np.zeros(NB_pad, np.int32)
    b_first[:NB] = plan.b_first
    b_chunk[:NB] = plan.b_chunk
    b_litrow[:NB] = plan.b_litrow
    b_chunk[NB:] = plan.b_chunk[NB - 1] if NB else 0

    lit_rows_used = -(-max(plan.lit_bytes, 1) // 128)
    LR = _pow2(lit_rows_used + LIT_ROWS + 1, floor=LIT_ROWS + 8)
    lit8 = np.zeros(LR * 128, np.uint8)
    lit8[:plan.lit_bytes] = plan.litbuf[:plan.lit_bytes]
    litrows = lit8.view("<u4").reshape(LR, 32)

    w8 = np.zeros(W_ROWS * 128, np.uint8)
    if window:
        w = np.frombuffer(bytes(window)[-32768:], np.uint8)
        w8[32768 - len(w):] = w
    wrows = w8.view("<u4").reshape(W_ROWS, 32)

    n_rows_out = _pow2(int(plan.n_chunks)) * CHUNK_ROWS
    args = (srclen, dstoff, g_rows, b_first, b_chunk, b_litrow, litrows,
            wrows)
    return args, n_rows_out


def resolve_grid_device(tape, input_bytes, window: bytes = b"",
                        K: int = 4):
    """Plan on host (C++ grid planner), resolve on device. Returns
    (device uint32 word rows, total_out)."""
    from ..native import loader
    plan = loader.plan_spans_grid(tape, input_bytes,
                                  window_len=len(window), K=K)
    args, n_rows_out = stage_grid_plan(plan, window)
    rows = _resolve_grid_impl(*(jnp.asarray(a) for a in args), n_rows_out)
    return rows, plan.total_out


def resolve_grid_bytes(tape, input_bytes, window: bytes = b"",
                       K: int = 4) -> bytes:
    """Convenience: grid-resolve and fetch to host bytes."""
    rows, total = resolve_grid_device(tape, input_bytes, window, K=K)
    host = np.ascontiguousarray(np.asarray(rows))
    return bytes(host.view(np.uint8).reshape(-1)[:total])


# --- flat resolver (round 3b) -----------------------------------------------
# Designed from the on-chip profile of the grid kernel: its ~30-57us
# scan step was ~20 small ops (chunk-transition cond, local-table
# rebuild, 256B two-row frames, publish DUS) with nothing dominant —
# per-op overhead, not the gather primitive, was the floor. The flat
# kernel deletes the chunk machinery: literals are host-prefilled into
# the output (never enter the kernel), the carried table IS the output
# array (256 window rows prepended, global row coords), and spans are
# chopped at src AND dst 128B rows so each slot is ONE single-row frame
# fetch. Per step: gather, pad, 8 barrel selects, mask, K-reduce,
# scatter-add — ~10 ops on larger batches (G=2048 x K=2 default).


def _barrel_contrib(frame, a, o, ln, G, K, lane128):
    """Shared slot pipeline: rotate each (B, 32)-u32 128-byte frame left
    by (a-o)&127, mask to [o, o+ln), reduce the K slots of each group.
    Valid because the planner never lets a span straddle its source row
    (a+len <= 128), so the rotate's wrap never lands inside the mask.
    5 word stages + 2 byte-in-word stages; the round-3a shift
    formulation needed 8 stages on 64 lanes (2.3x the vector traffic)."""
    B = frame.shape[0]
    t = (a - o) & 127
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
    mask8 = jnp.where((lane128 >= o[:, None])
                      & (lane128 < (o + ln)[:, None]),
                      jnp.uint8(0xFF), jnp.uint8(0))
    mask = jax.lax.bitcast_convert_type(
        mask8.reshape(B, 32, 4), jnp.uint32)
    x = x & mask
    return x.reshape(G, K, 32).sum(axis=1, dtype=jnp.uint32)  # (G, 32)


@functools.partial(jax.jit, static_argnames=("n_rows_out", "seg_rows"))
def _resolve_flat_scan_impl(srcaddr, lenoff, g_rows, b_segrow, out0,
                            window_rows, n_rows_out: int, seg_rows: int):
    """Scan-over-batches variant: per batch, gather frames from the full
    table, scatter-add the group contributions into a seg_rows dynamic
    slice at the batch's segment row (batches are segment-pure). The
    round-3 A/B baseline for _resolve_flat_impl."""
    NB, G, K = srcaddr.shape
    B = G * K
    table0 = jnp.concatenate([window_rows, out0], axis=0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def step(table, xs):
        sa, lo_, gr, segrow = xs
        sa = sa.reshape(B)
        lo_f = lo_.reshape(B).astype(jnp.int32)
        u = sa >> 7
        a = sa & 127
        o = jax.lax.shift_right_logical(lo_f, 8) & 127
        ln = lo_f & 255
        contrib = _barrel_contrib(table[u], a, o, ln, G, K, lane128)
        seg = jax.lax.dynamic_slice(table, (segrow, 0), (seg_rows, 32))
        seg = seg.at[gr].add(contrib)
        return jax.lax.dynamic_update_slice(table, seg, (segrow, 0)), None

    table, _ = jax.lax.scan(step, table0,
                            (srcaddr, lenoff, g_rows, b_segrow))
    return table[W_ROWS:]


@functools.partial(jax.jit, static_argnames=("n_rows_out",))
def _resolve_flat_gscat_impl(srcaddr, lenoff, g_rows_g, out0,
                             window_rows, n_rows_out: int):
    """Scan-over-batches with DIRECT global scatter (no slice/update):
    g_rows_g are absolute table rows. A/B variant — big-table scatter
    measured ~18M rows/s, but it avoids the slice/update copies."""
    NB, G, K = srcaddr.shape
    B = G * K
    table0 = jnp.concatenate([window_rows, out0], axis=0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def step(table, xs):
        sa, lo_, gr = xs
        sa = sa.reshape(B)
        lo_f = lo_.reshape(B).astype(jnp.int32)
        u = sa >> 7
        a = sa & 127
        o = jax.lax.shift_right_logical(lo_f, 8) & 127
        ln = lo_f & 255
        contrib = _barrel_contrib(table[u], a, o, ln, G, K, lane128)
        return table.at[gr].add(contrib), None

    table, _ = jax.lax.scan(step, table0, (srcaddr, lenoff, g_rows_g))
    return table[W_ROWS:]


@functools.partial(jax.jit, static_argnames=("n_rows_out", "seg_rows"))
def _resolve_flat_impl(srcaddr, lenoff, g_rows, seg_lo, seg_hi, seg_base,
                       out0, window_rows, n_rows_out: int, seg_rows: int):
    """srcaddr (NB,G,K) int32 table byte address (= global src + 32768);
    lenoff (NB,G,K) int16 = dstoff<<8 | len; g_rows (NB,G) int32 target
    row RELATIVE to the batch's segment; seg_lo/seg_hi/seg_base (S,)
    int32 = each segment's [batch range) and base table row; out0
    (n_rows_out,32)/window_rows (256,32) uint32 word rows. Returns
    (n_rows_out, 32) uint32 resolved output rows.

    Nested-loop structure (measured on the target chip): row scatter
    into a >=4MB HBM table runs ~18M rows/s vs ~83M+ into VMEM-sized
    targets, and a per-batch dynamic slice/update of the table costs
    table-sized copies (a slice-per-batch variant measured ~480us/batch
    of pure overhead at 8MB). So the OUTER fori walks segments and
    touches the table once per segment (slice + add + update), while
    the INNER fori walks the segment's batches with the table as a
    loop-INVARIANT gather source and scatter-adds into a small carried
    (seg_rows, 32) accumulator. Same-segment reads are served by
    table[u] + acc[u - base]: literal prefill lives in the table, match
    contributions in acc, and the two never overlap a byte. Batches
    outside every segment range (shape padding) never execute."""
    NB, G, K = srcaddr.shape
    B = G * K
    S = seg_base.shape[0]
    table0 = jnp.concatenate([window_rows, out0], axis=0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def seg_body(s, table):
        base = seg_base[s]

        def batch_body(b, acc):
            sa = jax.lax.dynamic_slice(srcaddr, (b, 0, 0),
                                       (1, G, K)).reshape(B)
            lo_f = jax.lax.dynamic_slice(lenoff, (b, 0, 0),
                                         (1, G, K)).reshape(B)
            lo_f = lo_f.astype(jnp.int32)
            gr = jax.lax.dynamic_slice(g_rows, (b, 0), (1, G)).reshape(G)
            u = sa >> 7
            a = sa & 127
            o = jax.lax.shift_right_logical(lo_f, 8) & 127
            ln = lo_f & 255

            frame = table[u]                            # (B, 32) u32
            rel = u - base
            in_seg = (rel >= 0) & (rel < seg_rows)
            facc = acc[jnp.clip(rel, 0, seg_rows - 1)]
            frame = frame + jnp.where(in_seg[:, None], facc,
                                      jnp.uint32(0))
            contrib = _barrel_contrib(frame, a, o, ln, G, K, lane128)
            return acc.at[gr].add(contrib)

        acc0 = jnp.zeros((seg_rows, 32), jnp.uint32)
        acc = jax.lax.fori_loop(seg_lo[s], seg_hi[s], batch_body, acc0)
        seg = jax.lax.dynamic_slice(table, (base, 0), (seg_rows, 32))
        return jax.lax.dynamic_update_slice(table, seg + acc, (base, 0))

    table = jax.lax.fori_loop(0, S, seg_body, table0)
    return table[W_ROWS:]


def stage_flat_plan(plan, window: bytes = b""):
    """Stage a host FlatPlan into the padded argument tuple for
    _resolve_flat_impl. Returns (args, n_rows_out)."""
    NB = max(plan.n_batches, 1)
    NB_pad = _pad_batches(NB, floor=4)
    G, K = plan.G, plan.K
    srcaddr = np.zeros((NB_pad, G, K), np.int32)
    lenoff = np.zeros((NB_pad, G, K), np.int16)
    g_rows = np.zeros((NB_pad, G), np.int32)
    if plan.n_batches:
        srcaddr[:NB] = plan.srcaddr.reshape(NB, G, K)
        lenoff[:NB] = plan.lenoff.reshape(NB, G, K)
        g_rows[:NB] = plan.g_row.reshape(NB, G)

    # segment table from the per-batch segment rows: runs of equal
    # b_segrow become [seg_lo, seg_hi) batch ranges. Shape-padded
    # entries get empty ranges — the kernel's inner loop never runs
    # them, so batch padding costs nothing on device.
    if plan.n_batches:
        bs = plan.b_segrow
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        seg_base_v = bs[starts]
        seg_lo_v = starts
        seg_hi_v = np.r_[starts[1:], NB]
    else:
        seg_base_v = np.array([W_ROWS], np.int32)
        seg_lo_v = np.array([0], np.int32)
        seg_hi_v = np.array([0], np.int32)
    S = len(seg_base_v)
    S_pad = _pad_batches(S, floor=1)
    seg_base = np.full(S_pad, seg_base_v[-1], np.int32)
    seg_lo = np.full(S_pad, NB_pad, np.int32)
    seg_hi = np.full(S_pad, NB_pad, np.int32)
    seg_base[:S] = seg_base_v
    seg_lo[:S] = seg_lo_v
    seg_hi[:S] = seg_hi_v

    # pow2 >= seg_rows and a multiple of it: the last segment's dynamic
    # slice [segrow, segrow + seg_rows) always stays inside the table
    n_rows_out = _pow2(-(-max(plan.total_out, 1) // 128),
                       floor=plan.seg_rows)
    o8 = np.zeros(n_rows_out * 128, np.uint8)
    o8[:plan.out0.size] = plan.out0
    out0 = o8.view("<u4").reshape(n_rows_out, 32)

    w8 = np.zeros(W_ROWS * 128, np.uint8)
    if window:
        w = np.frombuffer(bytes(window)[-32768:], np.uint8)
        w8[32768 - len(w):] = w
    wrows = w8.view("<u4").reshape(W_ROWS, 32)
    return (srcaddr, lenoff, g_rows, seg_lo, seg_hi, seg_base, out0,
            wrows), n_rows_out


def resolve_flat_device(tape, input_bytes, window: bytes = b"",
                        G: int = 4096, K: int = 4, seg_rows: int = 16384):
    """Plan on host (C++ flat planner), resolve on device. Returns
    (device uint32 word rows, total_out)."""
    from ..native import loader
    plan = loader.plan_spans_flat(tape, input_bytes,
                                  window_len=len(window), G=G, K=K,
                                  seg_rows=seg_rows)
    args, n_rows_out = stage_flat_plan(plan, window)
    # ONE batched host->device transfer for the whole plan (a per-array
    # jnp.asarray paid a dispatch round trip each on the tunnel)
    dargs = jax.device_put(tuple(args))
    rows = _resolve_flat_impl(*dargs, n_rows_out, plan.seg_rows)
    return rows, plan.total_out


def resolve_flat_bytes(tape, input_bytes, window: bytes = b"",
                       G: int = 4096, K: int = 4,
                       seg_rows: int = 16384) -> bytes:
    """Convenience: flat-resolve and fetch to host bytes."""
    rows, total = resolve_flat_device(tape, input_bytes, window, G=G, K=K,
                                      seg_rows=seg_rows)
    host = np.ascontiguousarray(np.asarray(rows))
    return bytes(host.view(np.uint8).reshape(-1)[:total])


def _pow2(n: int, floor: int = 1) -> int:
    n = max(n, floor)
    return 1 << (n - 1).bit_length()


def _pad_batches(n: int, floor: int = 16) -> int:
    """Batch-count shape ladder: pow2 AND 1.5*pow2 steps (max ~33%
    padding — padded batches run the full per-step kernel cost, so pow2
    alone wasted up to half the scan)."""
    n = max(n, floor)
    p = 1 << (n - 1).bit_length()
    if n <= p // 2 + p // 4:
        return p // 2 + p // 4
    return p


def resolve_spans_device(tape, input_bytes, window: bytes = b"",
                         batch: int = 1024):
    """Plan on host (C++), resolve on device. Returns (device uint8 rows
    flattened view promise, total_out) — callers slice [:total_out]."""
    from ..native import loader
    plan = loader.plan_spans(tape, input_bytes, window_len=len(window),
                             batch=batch)
    return _run_plan(plan, window), plan.total_out


def stage_plan(plan, window: bytes = b""):
    """Stage a host SpanPlan into the padded numpy argument tuple for
    _resolve_spans_impl. Returns (args, n_rows_out) — args order matches
    the kernel's positional parameters. Shared by the decode path, the
    bench's resident-plan probe, and the driver entry point."""
    NB = max(plan.n_batches, 1)
    NB_pad = _pad_batches(NB)
    B = plan.batch
    srclen = np.zeros((NB_pad, B), np.int32)
    dst = np.full((NB_pad, B), 98176, np.int32)
    srclen[:NB] = plan.srclen.reshape(NB, B)
    dst[:NB] = plan.dst.reshape(NB, B)
    b_first = np.zeros(NB_pad, np.int32)
    b_chunk = np.zeros(NB_pad, np.int32)
    b_litrow = np.zeros(NB_pad, np.int32)
    b_first[:NB] = plan.b_first
    b_chunk[:NB] = plan.b_chunk
    b_litrow[:NB] = plan.b_litrow
    b_chunk[NB:] = plan.b_chunk[NB - 1] if NB else 0

    lit_rows_used = -(-max(plan.lit_bytes, 1) // 128)
    LR = _pow2(lit_rows_used + LIT_ROWS + 1, floor=LIT_ROWS + 8)
    litrows = np.zeros((LR, 128), np.uint8)
    flat = litrows.reshape(-1)
    flat[:plan.lit_bytes] = plan.litbuf[:plan.lit_bytes]

    wrows = np.zeros((W_ROWS, 128), np.uint8)
    if window:
        w = np.frombuffer(bytes(window)[-32768:], np.uint8)
        wrows.reshape(-1)[32768 - len(w):] = w

    n_rows_out = _pow2(int(plan.n_chunks)) * CHUNK_ROWS
    args = (srclen, dst, b_first, b_chunk, b_litrow, litrows, wrows)
    return args, n_rows_out


def _run_plan(plan, window: bytes):
    args, n_rows_out = stage_plan(plan, window)
    return _resolve_spans_impl(*(jnp.asarray(a) for a in args), n_rows_out)


def resolve_spans_bytes(tape, input_bytes, window: bytes = b"") -> bytes:
    """Convenience: resolve and fetch to host bytes."""
    rows, total = resolve_spans_device(tape, input_bytes, window)
    return bytes(np.asarray(rows).reshape(-1)[:total])
