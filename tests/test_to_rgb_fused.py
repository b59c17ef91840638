"""Fused RGB-head kernel vs the plain conv+tanh (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.ops.pallas.to_rgb import to_rgb_fused


def _naive(x, k):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16),
                                   (1, 16, 16, 8),   # multi-chunk rows
                                   (2, 4, 12, 4)])
def test_to_rgb_fused_matches_naive(rng, shape):
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, 3)).astype(np.float32))
    ref = _naive(x, k)
    got = to_rgb_fused(x, k, True)
    assert got.shape == (b, h, w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_to_rgb_fused_grads_match_naive(rng):
    """The custom VJP (jnp recompute) matches the plain composition's
    gradients for both operands."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, 6, 3)).astype(np.float32))

    def loss_fused(x, k):
        return jnp.sum(to_rgb_fused(x, k, True) ** 2)

    def loss_naive(x, k):
        return jnp.sum(_naive(x, k) ** 2)

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    gx_n, gk_n = jax.grad(loss_naive, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_n),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(1, 64, 256, 64),
                                   (2, 128, 256, 64)])  # multi-block halo
def test_to_rgb_paired_matches_naive(rng, shape):
    """The paired-pixel production-head kernel (C=64 packed two pixels per
    128-lane row) matches conv3x3+tanh, including the zero-pad borders the
    lane rolls and edge-row zeroing implement."""
    from t2igan.ops.pallas.to_rgb import to_rgb_paired

    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, 3)).astype(np.float32))
    ref = _naive(x, k)
    got = to_rgb_paired(x, k, True)
    assert got.shape == (b, h, w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_to_rgb_paired_rejects_unsupported_shapes(rng):
    from t2igan.ops.pallas.to_rgb import to_rgb_paired

    x = jnp.zeros((1, 8, 8, 16))
    k = jnp.zeros((3, 3, 16, 3))
    with pytest.raises(ValueError):
        to_rgb_paired(x, k, True)


def test_to_rgb_paired_grads_match_naive(rng):
    from t2igan.ops.pallas.to_rgb import to_rgb_paired

    x = jnp.asarray(rng.standard_normal((1, 64, 256, 64)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, 64, 3)).astype(np.float32))

    def loss_fused(x, k):
        return jnp.sum(to_rgb_paired(x, k, True) ** 2)

    def loss_naive(x, k):
        return jnp.sum(_naive(x, k) ** 2)

    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, k)
    gx_n, gk_n = jax.grad(loss_naive, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_n),
                               rtol=1e-4, atol=1e-4)


def test_get_image_g_kernel_flag_equivalence(rng, monkeypatch):
    """GetImageG's kernel path and the plain conv share one param tree and
    agree (CPU takes the platform-dispatch jnp branch)."""
    from t2igan.models.generator import GetImageG

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    module = GetImageG()
    monkeypatch.setenv("T2IGAN_RGB_KERNEL", "0")
    variables = module.init(jax.random.PRNGKey(0), x)
    ref = module.apply(variables, x)
    monkeypatch.setenv("T2IGAN_RGB_KERNEL", "1")
    got = module.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _naive_glu(x, k):
    c = x.shape[-1] // 2
    g = x[..., :c] * jax.nn.sigmoid(x[..., c:].astype(jnp.float32)
                                    ).astype(x.dtype)
    return _naive(g, k)


@pytest.mark.parametrize("shape", [(1, 32, 128, 128),
                                   (2, 64, 256, 128)])  # multi-block halo
def test_to_rgb_glu_matches_naive(rng, shape):
    """The GLU-fused variant (pre-GLU 2C=128 input) matches
    glu -> conv3x3 -> tanh, including borders."""
    from t2igan.ops.pallas.to_rgb import to_rgb_glu

    b, h, w, c2 = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c2)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c2 // 2, 3)).astype(np.float32))
    ref = _naive_glu(x, k)
    got = to_rgb_glu(x, k, True)
    assert got.shape == (b, h, w, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_to_rgb_glu_grads_match_naive(rng):
    from t2igan.ops.pallas.to_rgb import to_rgb_glu

    x = jnp.asarray(rng.standard_normal((1, 32, 128, 128)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, 64, 3)).astype(np.float32))

    gx_f, gk_f = jax.grad(lambda x, k: jnp.sum(to_rgb_glu(x, k, True) ** 2),
                          argnums=(0, 1))(x, k)
    gx_n, gk_n = jax.grad(lambda x, k: jnp.sum(_naive_glu(x, k) ** 2),
                          argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_n),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # two full GNet applies: ~28s
def test_gnet_glu_rgb_flag_equivalence(rng, monkeypatch):
    """T2IGAN_RGB_KERNEL=glu reroutes the final eval stage through the
    folded RGB kernel + pre-GLU tail; same param tree, same output (CPU
    takes the jnp branch of the platform dispatch)."""
    from t2igan.models.generator import GNet

    model = GNet(gf_dim=64, nef=512, condition_dim=128,
                 branch_num=2, num_residual=1)
    b, L = 1, 5
    z = jnp.asarray(rng.standard_normal((b, 100)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((b, 512)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, L, 512)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((b, 128)).astype(np.float32))
    pad = jnp.zeros((b, L), bool)

    monkeypatch.setenv("T2IGAN_RGB_KERNEL", "0")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, False, eps)
    ref_imgs, _, _, _ = model.apply(variables, z, sent, words, pad, False,
                                    eps, False)
    monkeypatch.setenv("T2IGAN_RGB_KERNEL", "glu")
    got_imgs, _, _, _ = model.apply(variables, z, sent, words, pad, False,
                                    eps, False)
    assert len(got_imgs) == len(ref_imgs)
    np.testing.assert_allclose(np.asarray(got_imgs[-1]),
                               np.asarray(ref_imgs[-1]),
                               rtol=1e-5, atol=1e-5)
