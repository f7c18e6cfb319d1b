"""ops/gather.py: the TPU row-gather emulation must be bit-exact with
the native gather on every dtype/shape it is used with (it substitutes
inside resolve/fused/batched kernels whenever the arrays live on TPU —
CPU CI can still pin exactness by forcing emu=True)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tbz.ops import gather as G  # noqa: E402


@pytest.mark.parametrize("dtype", [np.int32, np.uint32, np.uint8])
@pytest.mark.parametrize("n", [16, 100, 1 << 15])
def test_take1d_matches_native(dtype, n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 200, n).astype(dtype)
    idx = rng.integers(-5, n + 5, 4096).astype(np.int32)  # incl. OOB
    want = np.asarray(G.take1d(jnp.asarray(x), jnp.asarray(idx), False))
    got = np.asarray(G.take1d(jnp.asarray(x), jnp.asarray(idx), True))
    assert np.array_equal(got, want)
    assert got.dtype == x.dtype


def test_take1d_2d_index_shape():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 20, 1 << 12).astype(np.int32)
    idx = rng.integers(0, 1 << 12, (64, 33)).astype(np.int32)
    want = np.asarray(G.take1d(jnp.asarray(x), jnp.asarray(idx), False))
    got = np.asarray(G.take1d(jnp.asarray(x), jnp.asarray(idx), True))
    assert got.shape == (64, 33)
    assert np.array_equal(got, want)


def test_take1d_under_jit_static_emu():
    import jax

    rng = np.random.default_rng(3)
    x = rng.integers(0, 99, 1000).astype(np.int32)
    idx = rng.integers(0, 1000, 777).astype(np.int32)

    f = jax.jit(G.take1d, static_argnames=("emu",))
    a = np.asarray(f(jnp.asarray(x), jnp.asarray(idx), emu=True))
    b = np.asarray(f(jnp.asarray(x), jnp.asarray(idx), emu=False))
    assert np.array_equal(a, b)


def test_want_emulation_cpu_false():
    arr = jnp.zeros(4, jnp.int32)
    assert G.want_emulation(arr) is False  # conftest forces CPU
    assert G.want_emulation(np.zeros(4)) is False  # non-jax input
