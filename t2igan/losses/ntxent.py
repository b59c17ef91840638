"""NT-Xent (SimCLR) contrastive loss.

Parity target: ``NT_Xent`` (nt_xent.py:4-35) with the precomputed
correlated-sample masks (masks.py:3-17).

TPU-first redesign: the reference materializes a [2B, 2B] boolean mask buffer
and gathers positives off diagonals.  Both are fused here into one masked
logsumexp: for row i the denominator is every column except self (positives
included, exactly as the reference's logits = [positive, negatives] CE), so

    loss_i = logsumexp_{j != i}(sim_ij / t) - sim_{i,partner} / t
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2igan.ops.attention import NEG_INF

Array = jnp.ndarray


def nt_xent_loss(z_i: Array, z_j: Array, temperature: float = 0.5) -> Array:
    """SimCLR NT-Xent over a batch of positive pairs.

    Args:
      z_i, z_j: [B, D] paired embeddings (two caption/image views).
      temperature: softmax temperature (0.5 in both trainers,
        trainer.py:288 / pretrain_DAMSM.py:447).

    Returns: scalar loss, averaged over the 2B anchors (nt_xent.py:33-34).
    """
    b = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)               # [2B, D]
    zn = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-8)
    sim = (zn @ zn.T) / temperature                       # cosine / t
    n = 2 * b
    self_mask = jnp.eye(n, dtype=bool)
    denom = jax.nn.logsumexp(jnp.where(self_mask, NEG_INF, sim), axis=-1)
    partner = (jnp.arange(n) + b) % n
    pos = sim[jnp.arange(n), partner]
    return jnp.mean(denom - pos)
