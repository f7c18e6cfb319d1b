"""Flat span resolver (ops/resolve_spans._resolve_flat_impl + native
tbz_plan_spans_flat) — byte-exact against stdlib zlib across content
classes, preset windows, stored blocks, G/K variants, and structure
fuzz.

Contract (deflate.lisp:244-359 semantics): literals host-prefilled into
the output rows, match spans chopped to single src/dst 128B rows,
globally list-scheduled batches, table = 256 window rows + output rows.
"""

import random
import zlib

import numpy as np
import pytest

from tbz import reference
from tbz.native import loader
from tbz.ops import resolve_spans as rs

from util import corpus

pytestmark = pytest.mark.skipif(not loader.available(),
                                reason="needs native planner")


def roundtrip(data, level=9, window=b"", G=2048, K=2):
    if window:
        co = zlib.compressobj(level, zlib.DEFLATED, -15, zdict=window)
    else:
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    res = reference.tokenize_host(payload, 0, window_len=len(window))
    return rs.resolve_flat_bytes(res.tape, payload, window, G=G, K=K)


@pytest.mark.parametrize("name,data", [
    ("empty", b""),
    ("one", b"x"),
    ("run", b"a" * 200000),
    ("repeat", b"hello world " * 20000),
    ("text", corpus(11, 1 << 18)),
    ("odd-size", corpus(12, (1 << 17) + 12345)),
])
def test_roundtrip_classes(name, data):
    assert roundtrip(data) == data


@pytest.mark.parametrize("G,K", [(512, 4), (1024, 2), (2048, 4),
                                 (4096, 2)])
def test_shape_variants(G, K):
    data = corpus(33, 1 << 17)
    assert roundtrip(data, G=G, K=K) == data


@pytest.mark.parametrize("seg_rows", [256, 1024, 8192])
def test_segment_variants(seg_rows):
    # 1 << 18 output = 2048 rows: seg_rows=256 forces 8 segments,
    # 1024 forces 2, 8192 clamps to the single-table case
    data = corpus(34, 1 << 18)
    payload = zlib.compress(data, 9)[2:-4]
    res = reference.tokenize_host(payload, 0)
    assert rs.resolve_flat_bytes(res.tape, payload,
                                 seg_rows=seg_rows) == data


def test_stored_blocks():
    data = corpus(13, 150000)
    co = zlib.compressobj(0, zlib.DEFLATED, -15)
    payload = co.compress(data) + co.flush()
    res = reference.tokenize_host(payload, 0)
    assert rs.resolve_flat_bytes(res.tape, payload, b"") == data


def test_preset_dictionary_window():
    data = corpus(14, 50000)
    zdict = corpus(15, 4000)
    assert roundtrip(data, window=zdict) == data
    big_dict = corpus(16, 40000)
    assert roundtrip(data, window=big_dict[-32768:]) == data


def test_deep_overlap_chains():
    data = (b"\x00" * 1000 + b"ab" * 700 + b"xyz" * 500) * 40
    assert roundtrip(data) == data


def test_structure_fuzz():
    rng = random.Random(23)
    nprng = np.random.default_rng(23)
    for _ in range(6):
        parts = []
        for _ in range(rng.randrange(1, 6)):
            k = rng.randrange(5)
            if k == 0:
                parts.append(bytes([rng.randrange(256)])
                             * rng.randrange(1, 70000))
            elif k == 1:
                parts.append(bytes(nprng.integers(
                    0, 256, rng.randrange(1, 40000), dtype=np.uint8)))
            elif k == 2:
                parts.append((b"pat%d" % rng.randrange(10))
                             * rng.randrange(1, 6000))
            elif k == 3:
                parts.append(corpus(rng.randrange(100), 20000))
            else:
                parts.append(b"ab" * rng.randrange(1, 30000))
        data = b"".join(parts)
        level = rng.choice([0, 1, 6, 9])
        assert roundtrip(data, level) == data, (len(data), level)


def test_flat_planner_invariants():
    """Every slot is a single-row copy on both sides: len <= 128, the
    dst offset + len stays inside the row, the src frame [addr&127,
    +len) stays inside its row; batches are segment-pure (g_row in
    [0, seg_rows) relative to an aligned b_segrow >= the 256 window
    rows)."""
    data = corpus(17, 1 << 18)
    payload = zlib.compress(data, 6)[2:-4]
    res = reference.tokenize_host(payload, 0)
    plan = loader.plan_spans_flat(res.tape, payload, G=1024, K=2,
                                  seg_rows=512)
    G, K = plan.G, plan.K
    sa = plan.srcaddr.reshape(plan.n_batches, G, K)
    lo = plan.lenoff.reshape(plan.n_batches, G, K).astype(np.int32)
    ln = lo & 255
    off = lo >> 8
    live = ln > 0
    assert (sa >= 0).all()
    assert (ln <= 128).all()
    assert (off[live] + ln[live] <= 128).all()
    assert ((sa[live] & 127) + ln[live] <= 128).all()
    rows = plan.g_row.reshape(plan.n_batches, G)
    live_g = live.any(axis=2)
    assert (rows[live_g] >= 0).all()
    assert (rows[live_g] < plan.seg_rows).all()
    assert (plan.b_segrow >= 256).all()
    assert ((plan.b_segrow - 256) % plan.seg_rows == 0).all()
    # segment base rows are nondecreasing (batches run in scan order)
    assert (np.diff(plan.b_segrow) >= 0).all()
    # every live slot's global dst row stays inside its batch's segment
    assert plan.n_spans == int(live.sum())
    # literal bytes already present in out0 at non-span positions
    out0 = plan.out0[:plan.total_out]
    assert len(out0) == len(data)


def test_flat_kernel_variants_agree():
    """The scan+slice-scatter and scan+global-scatter A/B variants
    (kept for on-chip comparison) must stay byte-identical to the
    production nested kernel."""
    import jax
    import jax.numpy as jnp
    from tbz.ops import resolve_spans as rs
    data = corpus(33, 3 << 17)
    payload = zlib.compress(data, 6)[2:-4]
    res = reference.tokenize_host(payload, 0)
    plan = loader.plan_spans_flat(res.tape, payload, G=1024, K=2,
                                  seg_rows=2048)
    np_args, n_rows = rs.stage_flat_plan(plan)
    args = [jnp.asarray(a) for a in np_args]
    NB_pad = np_args[0].shape[0]
    b_segrow = np.full(NB_pad, rs.W_ROWS, np.int32)
    b_segrow[:plan.n_batches] = plan.b_segrow
    g_glob = jnp.asarray((np_args[2] + b_segrow[:, None]).astype(np.int32))
    nested = rs._resolve_flat_impl(*args, n_rows, plan.seg_rows)
    scan = rs._resolve_flat_scan_impl(
        args[0], args[1], args[2], jnp.asarray(b_segrow), args[6],
        args[7], n_rows, plan.seg_rows)
    gscat = rs._resolve_flat_gscat_impl(
        args[0], args[1], g_glob, args[6], args[7], n_rows)
    body = bytes(np.asarray(jax.lax.bitcast_convert_type(
        nested, jnp.uint8)).reshape(-1)[:plan.total_out])
    assert body == data
    assert (np.asarray(scan) == np.asarray(nested)).all()
    assert (np.asarray(gscat) == np.asarray(nested)).all()
