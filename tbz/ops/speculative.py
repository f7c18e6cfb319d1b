"""Speculative multi-lane in-block decode (prototype of the north-star
kernel; cf. the parallel-inflate literature in PAPERS.md — rapidgzip /
"Massively-Parallel Lossless Data Decompression").

One Huffman block's symbol stream is sequential at bit level, but the
code is self-synchronizing: a decoder started at a WRONG bit offset
almost always converges onto the true symbol boundaries within a few
symbols. So:

  1. L lanes decode speculatively from evenly spaced bit offsets
     (lane 0 at the true block start), all in lockstep vector steps —
     one `lax.while_loop` whose body decodes one symbol on EVERY lane
     (flat-table gathers, vectorized over lanes).
  2. Each lane records its visited symbol-start positions and tokens.
  3. Stitching (host, cheap): the true entry of chunk l+1 is the first
     visited position >= that chunk's start in the TRUE decode of chunk
     l; if that position appears in lane l+1's visited set, lane l+1's
     tokens from that index on are exact. Unsynced lanes fall back to
     sequential decode — correctness never depends on synchronization.

Distance validation is deferred to stitch time (speculative lanes don't
know how much output precedes them).

This is the correctness substrate + measurement harness; the round-2
production version moves stitching on-device and adds block-header
speculation (docs/ROADMAP.md §2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import errors as E
from ..tape import TokenTape
from .tokenize_device import (_entry_consts, _peek, build_flat_table,
                              _e_nbits, _e_op, _e_extra, _e_val)

MAX_ENTRY_DRIFT = 48  # a symbol spans < 48 bits; true chunk entry is
                      # within this window past the chunk start


@functools.partial(jax.jit, static_argnames=("L", "max_syms"))
def _lanes_decode(data32, lit_tab, dist_tab, lane_starts, lane_ends,
                  total_bits, L: int, max_syms: int):
    """Decode up to max_syms symbols per lane, each lane stopping once
    its bit position passes its lane_end (or EOB / invalid / stream end).

    Returns per-lane arrays:
      starts   (L, max_syms) int32  symbol start bit positions (-1 pad)
      out_len  (L, max_syms) int32
      dist     (L, max_syms) int32  (-1 marks end-of-block token)
      rv       (L, max_syms) int32
      n_syms   (L,) int32
      ok       (L,) bool   lane ended cleanly (not invalid/underrun)
    """
    lanes = jnp.arange(L, dtype=jnp.int32)

    st = dict(
        bit=lane_starts.astype(jnp.int32),
        n=jnp.zeros(L, jnp.int32),
        active=jnp.ones(L, jnp.bool_),
        bad=jnp.zeros(L, jnp.bool_),
        starts=jnp.full((L, max_syms), -1, jnp.int32),
        out_len=jnp.zeros((L, max_syms), jnp.int32),
        dist=jnp.zeros((L, max_syms), jnp.int32),
        rv=jnp.zeros((L, max_syms), jnp.int32),
    )
    keys = list(st.keys())
    pack = lambda d: tuple(d[k] for k in keys)
    unpack = lambda t: dict(zip(keys, t))

    peek_v = jax.vmap(lambda p, n=15: _peek(data32, p, 15))

    def body(t):
        s = unpack(t)
        bit = s["bit"]
        e = lit_tab[peek_v(bit).astype(jnp.int32)]
        nb = _e_nbits(e)
        op = _e_op(e)
        ex = _e_extra(e)
        # length extra bits
        p1 = bit + nb
        ebits = jax.vmap(lambda p: _peek(data32, p, 13))(p1).astype(
            jnp.int32) & ((1 << jnp.clip(ex, 0, 13)) - 1)
        length = _e_val(e) + ebits
        p2 = p1 + jnp.where(op == C.OP_MATCH, ex, 0)
        # distance code (only meaningful for matches)
        de = dist_tab[jax.vmap(lambda p: _peek(data32, p, 15))(p2).astype(
            jnp.int32)]
        dnb = _e_nbits(de)
        p3 = p2 + jnp.where(op == C.OP_MATCH, dnb, 0)
        dex = _e_extra(de)
        debits = jax.vmap(lambda p: _peek(data32, p, 13))(p3).astype(
            jnp.int32) & ((1 << jnp.clip(dex, 0, 13)) - 1)
        d = _e_val(de) + debits
        p4 = p3 + jnp.where(op == C.OP_MATCH, dex, 0)

        is_lit = op == C.OP_LITERAL
        is_end = op == C.OP_END
        is_match = op == C.OP_MATCH
        invalid = (op == C.OP_INVALID) | (is_match &
                                          (_e_op(de) != C.OP_MATCH))
        next_bit = jnp.where(is_match, p4, bit + nb)
        underrun = next_bit > total_bits

        emit = s["active"] & ~invalid & ~underrun
        tok_len = jnp.where(is_lit, 1, jnp.where(is_end, 0, length))
        tok_dist = jnp.where(is_end, -1, jnp.where(is_match, d, 0))
        tok_rv = jnp.where(is_lit, _e_val(e), 0)

        idx = jnp.minimum(s["n"], max_syms - 1)
        def put(arr, val):
            cur = arr[lanes, idx]
            return arr.at[lanes, idx].set(jnp.where(emit, val, cur))
        s = dict(s)
        s["starts"] = put(s["starts"], bit)
        s["out_len"] = put(s["out_len"], tok_len)
        s["dist"] = put(s["dist"], tok_dist)
        s["rv"] = put(s["rv"], tok_rv)
        s["n"] = s["n"] + jnp.where(emit, 1, 0)
        s["bad"] = s["bad"] | (s["active"] & (invalid | underrun))
        # stop once the NEXT symbol would start at/past the lane end, at
        # EOB, on error, or when the tape fills. The stop bit is the
        # lane's exit — the next chunk's true entry when synced.
        crossed = next_bit >= lane_ends
        s["active"] = (s["active"] & ~invalid & ~underrun & ~is_end
                       & ~crossed & (s["n"] < max_syms))
        s["bit"] = jnp.where(emit, next_bit, s["bit"])
        return pack(s)

    def cond(t):
        s = unpack(t)
        return jnp.any(s["active"])

    out = unpack(jax.lax.while_loop(cond, body, pack(st)))
    return (out["starts"], out["out_len"], out["dist"], out["rv"],
            out["n"], ~out["bad"], out["bit"])


def tokenize_block_speculative(data: bytes, start_bit: int,
                               lit_lens: np.ndarray,
                               dist_lens: np.ndarray,
                               chunk_bits: int = 2048,
                               produced_before: int = 0,
                               window_len: int = 0):
    """Speculatively decode one block's symbol stream (tables known,
    from `start_bit` up to its end-of-block).

    Returns (TokenTape, end_bit, stats) where stats reports lane
    synchronization. Falls back to sequential decode for any unsynced
    span, so the result is always exact (verified vs the oracle in
    tests).
    """
    from .. import huffman
    lit_lens = np.asarray(lit_lens, np.int64)
    dist_lens = np.asarray(dist_lens, np.int64)
    lit_pad = np.zeros(288, np.int64)
    lit_pad[:len(lit_lens)] = lit_lens
    dist_pad = np.zeros(32, np.int64)
    dist_pad[:len(dist_lens)] = dist_lens
    lit_c, dist_c, _ = (jnp.asarray(x) for x in _entry_consts())
    lit_tab, err = build_flat_table(jnp.asarray(lit_pad), lit_c, 288, True)
    dist_tab, err2 = build_flat_table(jnp.asarray(dist_pad), dist_c, 32,
                                      True)
    assert int(err) == 0 and int(err2) == 0

    nbits = len(data) * 8
    pad = -(-len(data) // 4) * 4 + 8
    buf = np.zeros(pad, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    data32 = jnp.asarray(buf.view("<u4"))

    span = nbits - start_bit
    L = max(1, min(256, span // chunk_bits))
    max_syms = chunk_bits  # min ~1.3 bits/symbol in a valid code; cap
    lane_starts = np.array([start_bit + l * chunk_bits for l in range(L)],
                           np.int32)
    lane_ends = np.minimum(lane_starts + chunk_bits, nbits).astype(np.int32)

    (starts, out_len, dist, rv, n_syms, ok, exits) = (
        np.asarray(x) for x in _lanes_decode(
            data32, lit_tab, dist_tab, jnp.asarray(lane_starts),
            jnp.asarray(lane_ends), np.int32(nbits), L, max_syms))

    # Sequential decoder with the same tables (fallback + EOB finisher).
    lit2 = huffman.build_decode_table_checked(lit_lens, huffman.KIND_LITLEN)
    dist2 = huffman.build_decode_table_checked(dist_lens, huffman.KIND_DIST)
    from ..bitreader import BitReader
    from .. import reference as R

    def seq_decode(bit):
        br = BitReader(data, bit)
        ol, di, rvv = [], [], []
        while True:
            op, extra, val = R._decode_symbol(br, lit2, huffman.KIND_LITLEN)
            if op == C.OP_END:
                return (np.array(ol, np.int32), np.array(di, np.int32),
                        np.array(rvv, np.int32), br.bit_position())
            if op == C.OP_LITERAL:
                ol.append(1)
                di.append(0)
                rvv.append(val)
            else:
                length = val + (br.bits(extra) if extra else 0)
                _, dex, dval = R._decode_symbol(br, dist2, huffman.KIND_DIST)
                d = dval + (br.bits(dex) if dex else 0)
                ol.append(length)
                di.append(d)
                rvv.append(0)

    def decode_one(br):
        """(kind, out_len, dist, rv): kind 0=lit/match, 1=EOB."""
        op, extra, val = R._decode_symbol(br, lit2, huffman.KIND_LITLEN)
        if op == C.OP_END:
            return 1, 0, 0, 0
        if op == C.OP_LITERAL:
            return 0, 1, 0, val
        length = val + (br.bits(extra) if extra else 0)
        _, dex, dval = R._decode_symbol(br, dist2, huffman.KIND_DIST)
        d = dval + (br.bits(dex) if dex else 0)
        return 0, length, d, 0

    toks_ol: list = []
    toks_di: list = []
    toks_rv: list = []
    synced = 0
    fallbacks = 0
    gap_syms = 0
    entry = start_bit
    hit_eob = False
    for l in range(L):
        if entry >= int(lane_ends[l]) or hit_eob:
            continue  # a previous gap decode already covered this chunk
        row_n = int(n_syms[l])
        row_starts = starts[l, :row_n]
        usable = bool(ok[l]) and row_n < max_syms
        # Gap decode: walk the TRUE chain from `entry` until it lands on
        # a position this lane visited (self-synchronization merge), or
        # past the lane (chunk stays sequential).
        merge = None
        if usable:
            pos = int(np.searchsorted(row_starts, entry))
            if pos < row_n and row_starts[pos] == entry:
                merge = pos
        if merge is None:
            br = BitReader(data, entry)
            g_ol, g_di, g_rv = [], [], []
            while True:
                p = br.bit_position()
                if usable:
                    pos = int(np.searchsorted(row_starts, p))
                    if pos < row_n and row_starts[pos] == p:
                        merge = pos
                        break
                if p >= int(lane_ends[l]):
                    entry = p
                    break
                kind, tl, td, tr = decode_one(br)
                gap_syms += 1
                if kind == 1:
                    hit_eob = True
                    entry = p  # EOB start; sequential tail finishes
                    break
                g_ol.append(tl)
                g_di.append(td)
                g_rv.append(tr)
            if g_ol:
                toks_ol.append(np.array(g_ol, np.int32))
                toks_di.append(np.array(g_di, np.int32))
                toks_rv.append(np.array(g_rv, np.int32))
            if merge is None:
                fallbacks += 1
                continue  # next lane stitches from the updated entry
        synced += 1
        seg_d = dist[l, merge:row_n]
        eob_rel = np.nonzero(seg_d == -1)[0]
        if eob_rel.size:
            j = merge + int(eob_rel[0])
            toks_ol.append(out_len[l, merge:j])
            toks_di.append(dist[l, merge:j])
            toks_rv.append(rv[l, merge:j])
            entry = int(starts[l, j])  # EOB symbol start; tail decodes it
            hit_eob = True
            continue
        toks_ol.append(out_len[l, merge:row_n])
        toks_di.append(dist[l, merge:row_n])
        toks_rv.append(rv[l, merge:row_n])
        entry = int(exits[l])

    ol2, di2, rv2, end_bit = seq_decode(entry)
    ol = np.concatenate(toks_ol + [ol2]) if toks_ol else ol2
    di = np.concatenate(toks_di + [di2]) if toks_di else di2
    rvv = np.concatenate(toks_rv + [rv2]) if toks_rv else rv2

    # Deferred distance validation (speculative lanes cannot know the
    # produced prefix; the reference checks inline, deflate.lisp:691).
    produced = np.cumsum(ol.astype(np.int64)) - ol
    bad = di > (produced + produced_before + window_len)
    if np.any(bad & (di > 0)):
        E.raise_for_code(E.ERR_BAD_DISTANCE)

    tape = TokenTape(out_len=ol.astype(np.int32), dist=di.astype(np.int32),
                     root_val=rvv.astype(np.int32), total_out=int(ol.sum()))
    stats = {"lanes": L, "synced": synced, "fallbacks": fallbacks,
             "gap_syms": gap_syms,
             "sync_rate": synced / L if L else 1.0, "hit_eob": hit_eob}
    return tape, end_bit, stats
