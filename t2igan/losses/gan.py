"""Adversarial loss set for the cascaded DM-GAN.

Parity targets: ``discriminator_loss`` (losses.py:276-302) and
``generator_loss`` (losses.py:305-367).

TPU-first notes:
* discriminators emit raw logits and losses use the fused
  sigmoid-cross-entropy; the reference applies ``nn.Sigmoid`` in the head and
  ``nn.BCELoss`` outside (model.py:684-686, losses.py:284) — identical loss
  value, better numerics, and one less kernel;
* the "wrong-pair" term rolls the conditioning vector by one instead of the
  reference's off-by-one slicing (``real_features[:B-1]`` vs
  ``conditions[1:]``, losses.py:289-290).  Rolling keeps shapes static (no
  B-1 remainder), uses every sample, and preserves the semantics — each real
  image is scored against a mismatched sentence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def bce_with_logits(logits: Array, target: float) -> Array:
    """Mean binary cross entropy against a constant 0/1 target."""
    # log-sigmoid formulation: -[t*log s + (1-t)*log(1-s)]
    if target == 1.0:
        return -jnp.mean(jax.nn.log_sigmoid(logits))
    if target == 0.0:
        return -jnp.mean(jax.nn.log_sigmoid(-logits))
    s = jax.nn.log_sigmoid(logits)
    ns = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(target * s + (1.0 - target) * ns)


def discriminator_loss(cond_real: Array, cond_fake: Array, cond_wrong: Array,
                       uncond_real: Array | None, uncond_fake: Array | None):
    """Combine per-scale discriminator logits into the D objective.

    Matches losses.py:276-302: with an unconditional head,
    ``(real + cond_real)/2 + (fake + cond_fake + cond_wrong)/3``;
    without, ``cond_real + (cond_fake + cond_wrong)/2``.

    The caller produces the logits (real/fake feature extraction and head
    application) so this stays a pure function of arrays.
    """
    cond_real_err = bce_with_logits(cond_real, 1.0)
    cond_fake_err = bce_with_logits(cond_fake, 0.0)
    cond_wrong_err = bce_with_logits(cond_wrong, 0.0)
    if uncond_real is not None:
        real_err = bce_with_logits(uncond_real, 1.0)
        fake_err = bce_with_logits(uncond_fake, 0.0)
        loss = ((real_err + cond_real_err) / 2.0 +
                (fake_err + cond_fake_err + cond_wrong_err) / 3.0)
    else:
        loss = cond_real_err + (cond_fake_err + cond_wrong_err) / 2.0
    aux = {
        "real_acc": jnp.mean(jax.nn.sigmoid(uncond_real))
        if uncond_real is not None else jnp.mean(jax.nn.sigmoid(cond_real)),
        "fake_acc": jnp.mean(jax.nn.sigmoid(uncond_fake))
        if uncond_fake is not None else jnp.mean(jax.nn.sigmoid(cond_fake)),
    }
    return loss, aux


def generator_adv_loss(cond_logits: Array, uncond_logits: Array | None) -> Array:
    """Per-scale generator adversarial term (losses.py:314-324):
    conditional (+ unconditional) BCE against the *real* label."""
    loss = bce_with_logits(cond_logits, 1.0)
    if uncond_logits is not None:
        loss = loss + bce_with_logits(uncond_logits, 1.0)
    return loss


def wrong_pair(conditions: Array) -> Array:
    """Mismatched conditioning for the wrong-pair term: roll by one so sample
    i is paired with sentence i+1 (static-shape variant of losses.py:289)."""
    return jnp.roll(conditions, shift=-1, axis=0)
