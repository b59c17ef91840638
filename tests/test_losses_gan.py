"""GAN loss parity tests against a torch oracle.

The oracle reproduces the reference's sigmoid + BCELoss compositions
(losses.py:276-302, :305-324) on logits; our fused logits-based versions
must match to float32 tolerance.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from t2igan.losses import (bce_with_logits, discriminator_loss,
                           generator_adv_loss, wrong_pair)

B = 8


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_bce_with_logits_targets(rng):
    logits = rng.standard_normal(B).astype(np.float32)
    for target in (0.0, 1.0):
        ref = F.binary_cross_entropy(torch.sigmoid(_t(logits)),
                                     torch.full((B,), target)).item()
        ours = float(bce_with_logits(jnp.asarray(logits), target))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_discriminator_loss_with_uncond(rng):
    lr = rng.standard_normal(B).astype(np.float32)
    lf = rng.standard_normal(B).astype(np.float32)
    lw = rng.standard_normal(B).astype(np.float32)
    ur = rng.standard_normal(B).astype(np.float32)
    uf = rng.standard_normal(B).astype(np.float32)
    ones, zeros = torch.ones(B), torch.zeros(B)
    bce = lambda lo, t: F.binary_cross_entropy(torch.sigmoid(_t(lo)), t)
    # (real + cond_real)/2 + (fake + cond_fake + cond_wrong)/3
    # (losses.py:297-298)
    ref = ((bce(ur, ones) + bce(lr, ones)) / 2.0 +
           (bce(uf, zeros) + bce(lf, zeros) + bce(lw, zeros)) / 3.0).item()
    ours, aux = discriminator_loss(jnp.asarray(lr), jnp.asarray(lf),
                                   jnp.asarray(lw), jnp.asarray(ur),
                                   jnp.asarray(uf))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux["real_acc"]),
                               torch.sigmoid(_t(ur)).mean().item(),
                               rtol=1e-5)


def test_discriminator_loss_without_uncond(rng):
    lr = rng.standard_normal(B).astype(np.float32)
    lf = rng.standard_normal(B).astype(np.float32)
    lw = rng.standard_normal(B).astype(np.float32)
    ones, zeros = torch.ones(B), torch.zeros(B)
    bce = lambda lo, t: F.binary_cross_entropy(torch.sigmoid(_t(lo)), t)
    # cond_real + (cond_fake + cond_wrong)/2 (losses.py:300)
    ref = (bce(lr, ones) + (bce(lf, zeros) + bce(lw, zeros)) / 2.0).item()
    ours, _ = discriminator_loss(jnp.asarray(lr), jnp.asarray(lf),
                                 jnp.asarray(lw), None, None)
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5, atol=1e-6)


def test_generator_adv_loss(rng):
    cond = rng.standard_normal(B).astype(np.float32)
    uncond = rng.standard_normal(B).astype(np.float32)
    ones = torch.ones(B)
    bce = lambda lo: F.binary_cross_entropy(torch.sigmoid(_t(lo)), ones)
    ref = (bce(uncond) + bce(cond)).item()
    ours = float(generator_adv_loss(jnp.asarray(cond), jnp.asarray(uncond)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    ref_c = bce(cond).item()
    ours_c = float(generator_adv_loss(jnp.asarray(cond), None))
    np.testing.assert_allclose(ours_c, ref_c, rtol=1e-5, atol=1e-6)


def test_wrong_pair_is_mismatched(rng):
    c = rng.standard_normal((B, 4)).astype(np.float32)
    w = np.asarray(wrong_pair(jnp.asarray(c)))
    assert not np.allclose(w, c)
    np.testing.assert_array_equal(w[:-1], c[1:])
    np.testing.assert_array_equal(w[-1], c[0])
