"""Unit oracles for the subpixel phase-space tail primitives.

The end-to-end equivalence of the phased tails is pinned in
tests/test_models_gan.py and tests/test_train_steps.py; these tests pin
the two round-5 backward rewrites at the primitive level:

* ``phase_batch_stats``'s inclusion-exclusion halo form vs the literal
  masked-einsum definition (values AND gradients);
* ``_phase_conv2x2``'s hand-written kernel-side-flip VJP vs XLA's own
  autodiff of the identical convolution (dx AND dw).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.ops.image import (_phase_conv2x2, _phase_halo_masks,
                              phase_batch_stats)


def _einsum_stats(y, f):
    """The literal masked-einsum definition (the pre-round-5 form)."""
    b, r_, c_, _ = y.shape
    h, w = r_ - 1, c_ - 1
    rm, cm = _phase_halo_masks(h, w)
    y7 = y.reshape(b, r_, c_, 2, 2, 2, f).astype(jnp.float32)
    count = b * 2 * h * 2 * w
    s1 = jnp.einsum("nRChabr,Ra,Cb->hr", y7, jnp.asarray(rm),
                    jnp.asarray(cm)) / count
    s2 = jnp.einsum("nRChabr,Ra,Cb->hr", jnp.square(y7), jnp.asarray(rm),
                    jnp.asarray(cm)) / count
    mean = s1.reshape(2 * f)
    var = jnp.maximum(0.0, s2 - jnp.square(s1)).reshape(2 * f)
    return mean, var


@pytest.mark.parametrize("b,h,w,f", [(3, 5, 7, 2), (2, 8, 8, 4)])
def test_phase_batch_stats_matches_masked_einsum(b, h, w, f):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((b, h + 1, w + 1, 8 * f))
                    .astype(np.float32))
    m, v = phase_batch_stats(y)
    mo, vo = _einsum_stats(y, f)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mo),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vo),
                               rtol=1e-5, atol=1e-6)


def test_phase_batch_stats_gradient_matches():
    rng = np.random.default_rng(1)
    b, h, w, f = 2, 4, 6, 2
    y = jnp.asarray(rng.standard_normal((b, h + 1, w + 1, 8 * f))
                    .astype(np.float32))
    wm = jnp.asarray(rng.standard_normal(2 * f).astype(np.float32))
    wv = jnp.asarray(rng.standard_normal(2 * f).astype(np.float32))

    def scal(stats_fn):
        def run(y):
            m, v = stats_fn(y)
            return jnp.sum(m * wm) + jnp.sum(v * wv)
        return run

    g_new = jax.grad(scal(phase_batch_stats))(y)
    g_old = jax.grad(scal(lambda t: _einsum_stats(t, f)))(y)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_old),
                               rtol=1e-4, atol=1e-6)


def test_phase_batch_stats_halo_is_excluded():
    """Poisoning the halo entries (invalid phase rows/cols) must not move
    the statistics.  The poison is O(10) — same order as real conv
    outputs; if the halo leaked into the stats the means would shift by
    ~1.5 (halo fraction × poison), vs the f32 rounding of the
    inclusion-exclusion cancellation at ~1e-5.  (The subtraction form is
    algebraically exact but, unlike the masked form, not bitwise
    invariant under ARBITRARILY large halo values — irrelevant in
    practice since halo entries come from the same conv as the valid
    ones.)"""
    rng = np.random.default_rng(2)
    b, h, w, f = 2, 4, 4, 2
    y = rng.standard_normal((b, h + 1, w + 1, 8 * f)).astype(np.float32)
    m0, v0 = phase_batch_stats(jnp.asarray(y))
    y5 = y.reshape(b, h + 1, w + 1, 2, 2, 2, f).copy()
    y5[:, 0, :, :, 1, :, :] = 13.0    # row 0 at row-phase a=1
    y5[:, h, :, :, 0, :, :] = -11.0   # row H at a=0
    y5[:, :, 0, :, :, 1, :] = 17.0    # col 0 at col-phase b=1
    y5[:, :, w, :, :, 0, :] = -7.0    # col W at b=0
    m1, v1 = phase_batch_stats(jnp.asarray(y5.reshape(y.shape)))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-4, atol=1e-4)


def _plain_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,h,w,ci,co", [(2, 6, 5, 4, 6), (1, 8, 8, 8, 16)])
def test_phase_conv2x2_matches_xla_autodiff(b, h, w, ci, co):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 2, ci, co)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(_phase_conv2x2(x, k)),
                               np.asarray(_plain_conv(x, k)), rtol=1e-6)
    cot = jnp.asarray(rng.standard_normal(
        (b, h + 1, w + 1, co)).astype(np.float32))
    gx1, gk1 = jax.grad(lambda x, k: jnp.sum(_phase_conv2x2(x, k) * cot),
                        (0, 1))(x, k)
    gx2, gk2 = jax.grad(lambda x, k: jnp.sum(_plain_conv(x, k) * cot),
                        (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-5, atol=1e-6)
