"""Pallas kernel tests (interpreter mode on CPU): fused DAMSM matching
scores vs. the jnp reference, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.losses.damsm import attention_match_scores
from t2igan.ops.pallas.damsm_attn import attention_match_scores_fused

B, L, P, D = 5, 9, 49, 128
G1, G2 = 4.0, 5.0


@pytest.fixture
def data(rng):
    words = rng.standard_normal((B, L, D)).astype(np.float32)
    regions = rng.standard_normal((B, P, D)).astype(np.float32)
    lens = rng.integers(3, L + 1, size=B)
    mask = (np.arange(L)[None, :] < lens[:, None])
    return jnp.asarray(words), jnp.asarray(regions), jnp.asarray(mask)


def test_fused_forward_matches_reference(data):
    words, regions, mask = data
    ref = attention_match_scores(words, regions, mask, G1, G2)
    fused = attention_match_scores_fused(words, regions, mask, G1, G2, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_forward_no_mask(data):
    words, regions, _ = data
    ref = attention_match_scores(words, regions, None, G1, G2)
    fused = attention_match_scores_fused(words, regions, None, G1, G2, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_gradients_match_reference(data):
    words, regions, mask = data

    def loss_ref(w, r):
        return jnp.sum(jnp.sin(attention_match_scores(w, r, mask, G1, G2)))

    def loss_fused(w, r):
        return jnp.sum(jnp.sin(
            attention_match_scores_fused(w, r, mask, G1, G2, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(words, regions)
    gf = jax.grad(loss_fused, argnums=(0, 1))(words, regions)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_odd_shapes(rng):
    """Non-multiple-of-8 word/patch counts exercise the tile padding."""
    words = jnp.asarray(rng.standard_normal((3, 13, 128)).astype(np.float32))
    regions = jnp.asarray(rng.standard_normal((3, 50, 128)).astype(np.float32))
    mask = jnp.asarray(np.tri(3, 13, 5, dtype=bool))
    ref = attention_match_scores(words, regions, mask, G1, G2)
    fused = attention_match_scores_fused(words, regions, mask, G1, G2, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
