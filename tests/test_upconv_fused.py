"""Fused eval-mode UpBlock kernel vs the naive op chain (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.ops.image import upsample_nearest_2x
from t2igan.ops.pallas.upconv import upconv_bn_glu_fused


def _naive(x, kernel, scale, shift):
    y = jax.lax.conv_general_dilated(
        upsample_nearest_2x(x), kernel.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.astype(jnp.float32) * scale + shift
    a, b = jnp.split(y, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16, 8),     # generic
                                   (1, 4, 4, 32, 16),    # init-stage-like
                                   (2, 16, 16, 8, 8)])   # multi-chunk rows
def test_upconv_fused_matches_naive(rng, shape):
    b, h, w, c, f = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, f)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal(f).astype(np.float32))
    ref = _naive(x, k, scale, shift)
    got = upconv_bn_glu_fused(x, k, scale, shift, interpret=True)
    assert got.shape == (b, 2 * h, 2 * w, f // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upblock_pallas_variant_matches_naive(rng, monkeypatch):
    """UpBlock's T2IGAN_UPBLOCK=pallas eval path equals the naive form,
    sharing one param tree.  (On CPU the platform dispatch takes the
    equivalent jnp branch; the kernel itself is pinned by the interpret-mode
    tests above.)"""
    from t2igan.models.generator import UpBlock

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    block = UpBlock(features=4)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "naive")
    variables = block.init(jax.random.PRNGKey(0), x, False)
    naive = block.apply(variables, x, False)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "pallas")
    fused = block.apply(variables, x, False)
    assert naive.shape == fused.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


def test_upblock_pallas_variant_train_mode_unchanged(rng, monkeypatch):
    """With train=True the pallas variant falls back to the XLA form (BN
    needs batch stats), including the batch_stats mutation."""
    from t2igan.models.generator import UpBlock

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    block = UpBlock(features=4)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "naive")
    variables = block.init(jax.random.PRNGKey(0), x, True)
    ref, ref_upd = block.apply(variables, x, True, mutable=["batch_stats"])
    monkeypatch.setenv("T2IGAN_UPBLOCK", "pallas")
    got, got_upd = block.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-5),
        ref_upd, got_upd)


# ---------------------------------------------------------------------------
# batch-minor variant (ops/pallas/upconv_bm.py)
# ---------------------------------------------------------------------------

@pytest.mark.slow  # interpret-mode minutes; fast bm coverage lives in
                   # test_upblock_bm_variant_matches_naive
@pytest.mark.parametrize("shape,chunks", [
    ((8, 8, 8, 16, 8), None),        # one program
    ((8, 16, 16, 8, 8), (4, 8)),     # multi row + col chunks
    ((16, 8, 16, 16, 4), (8, 4)),    # Wc < W, taller batch
])
def test_upconv_bm_matches_naive(rng, shape, chunks):
    from t2igan.ops.pallas.upconv_bm import upconv_bn_glu_bm

    b, h, w, c, f = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, f)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal(f).astype(np.float32))
    ref = _naive(x, k, scale, shift)
    got = upconv_bn_glu_bm(x, k, scale, shift, interpret=True,
                           chunks=chunks)
    assert got.shape == (b, 2 * h, 2 * w, f // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_upconv_bm_bf16(rng):
    """bf16 inputs accumulate in f32 — matches the f32 reference within
    bf16 rounding."""
    from t2igan.ops.pallas.upconv_bm import upconv_bn_glu_bm

    b, h, w, c, f = 8, 8, 8, 16, 8
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    k = 0.1 * rng.standard_normal((3, 3, c, f)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, f).astype(np.float32)
    shift = 0.1 * rng.standard_normal(f).astype(np.float32)
    ref = _naive(jnp.asarray(x), jnp.asarray(k), scale, shift)
    got = upconv_bn_glu_bm(jnp.asarray(x, jnp.bfloat16),
                           jnp.asarray(k, jnp.bfloat16),
                           jnp.asarray(scale), jnp.asarray(shift),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=3e-2, atol=3e-2)


def test_upblock_bm_variant_matches_naive(rng, monkeypatch):
    """UpBlock's T2IGAN_UPBLOCK=bm eval path equals the naive form on one
    param tree (CPU platform dispatch takes the equivalent jnp branch; the
    kernel itself is pinned by the interpret tests above).  Uses a batch
    of 128 so the hardware gate (B % 128 == 0) is the live branch."""
    from t2igan.models.generator import UpBlock

    x = jnp.asarray(rng.standard_normal((128, 8, 8, 6)).astype(np.float32))
    block = UpBlock(features=4)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "naive")
    variables = block.init(jax.random.PRNGKey(0), x, False)
    naive = block.apply(variables, x, False)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "bm")
    fused = block.apply(variables, x, False)
    assert naive.shape == fused.shape == (128, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-4, atol=1e-5)


def test_upblock_bm_variant_train_mode_unchanged(rng, monkeypatch):
    """With train=True the bm variant keeps the default XLA form including
    the batch_stats mutation."""
    from t2igan.models.generator import UpBlock

    x = jnp.asarray(rng.standard_normal((8, 8, 8, 6)).astype(np.float32))
    block = UpBlock(features=4)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "dilated")
    variables = block.init(jax.random.PRNGKey(0), x, True)
    ref, ref_upd = block.apply(variables, x, True, mutable=["batch_stats"])
    monkeypatch.setenv("T2IGAN_UPBLOCK", "bm")
    got, got_upd = block.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-5),
        ref_upd, got_upd)


@pytest.mark.slow
def test_upconv_bm_production_dims(rng):
    """Production stage-3 spatial dims (128^2, C=F=128 -> the default
    T=8/Wc=32 chunking) at a reduced batch, interpret mode."""
    from t2igan.ops.pallas.upconv_bm import upconv_bn_glu_bm

    b, h, w, c, f = 8, 128, 128, 128, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, f)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal(f).astype(np.float32))
    got = upconv_bn_glu_bm(x, k, scale, shift, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_naive(x, k, scale, shift)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("chunks", [None, (4, 8)])
def test_upconv_bm_pipelined_matches_simple(rng, chunks):
    """The software-pipelined DMA schedule (T2IGAN_BM_PIPE=1) is exact."""
    from t2igan.ops.pallas.upconv_bm import upconv_bn_glu_bm

    b, h, w, c, f = 8, 16, 16, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    k = jnp.asarray(
        0.1 * rng.standard_normal((3, 3, c, f)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, f).astype(np.float32))
    shift = jnp.asarray(0.1 * rng.standard_normal(f).astype(np.float32))
    ref = _naive(x, k, scale, shift)
    got = upconv_bn_glu_bm(x, k, scale, shift, interpret=True,
                           chunks=chunks, pipelined=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
