"""Fused memory-read kernel vs the jnp reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.ops.attention import memory_read
from t2igan.ops.pallas.memory_read import memory_read_fused


@pytest.fixture
def data(rng):
    b, h, w, c, l = 3, 16, 16, 64, 11
    q = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    lens = rng.integers(3, l + 1, size=b)
    pad = ~(np.arange(l)[None, :] < lens[:, None])
    return q, k, v, jnp.asarray(pad)


def test_fused_matches_reference(data):
    q, k, v, pad = data
    ref, _ = memory_read(q, k, v, pad)
    fused = memory_read_fused(q, k, v, pad, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_no_mask(data):
    q, k, v, _ = data
    ref, _ = memory_read(q, k, v, None)
    fused = memory_read_fused(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients(data):
    q, k, v, pad = data

    def loss_ref(q, k, v):
        return jnp.sum(jnp.tanh(memory_read(q, k, v, pad)[0]))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.tanh(memory_read_fused(q, k, v, pad, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_non_tile_multiple_pixels(rng):
    """HW not a multiple of the pixel tile exercises the padding path."""
    b, h, w, c, l = 2, 10, 10, 32, 7   # 100 pixels < tile
    q = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    ref, _ = memory_read(q, k, v, None)
    fused = memory_read_fused(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_zero_at_padding(data):
    """Padded memory slots must receive zero key/value gradients."""
    q, k, v, pad = data

    def loss(k, v):
        return jnp.sum(memory_read_fused(q, k, v, pad, True) ** 2)

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    pad_np = np.asarray(pad)
    assert np.abs(np.asarray(dk)[pad_np]).max() < 1e-6
    assert np.abs(np.asarray(dv)[pad_np]).max() < 1e-6
