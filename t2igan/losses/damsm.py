"""DAMSM losses: sentence-level and word-region attention matching losses.

Parity targets in the reference:

* ``sent_loss``                  — losses.py:51-91
* ``similarity_text_image``      — losses.py:95-216
* ``words_loss``                 — losses.py:219-272

TPU-first redesign: the reference computes ``words_loss`` with a Python loop
over the batch (losses.py:228-251), broadcasting each caption against every
image one at a time — O(B) kernel launches of batch-sized bmms.  Here the full
(text i, image j) similarity tensor is produced by a single fused einsum chain
that XLA maps onto the MXU; the runtime asserts sprinkled through the
reference ("TEST 1/2", losses.py:133-159) are real unit tests in
``tests/test_losses_damsm.py`` instead of per-step assertions.

Faithfulness notes:
* similarity is computed on l2-normalized embeddings and the region-context
  vectors are built from the *normalized* regions (losses.py:113-117, 182);
* padded words are excluded from the per-patch softmax (losses.py:127) but —
  exactly as in the reference — still contribute their (uniform-attention)
  region-context term to the R(Q,D) log-sum-exp (losses.py:199-203 sums over
  all word slots);
* the R(Q,D) exp/sum/pow/log chain is evaluated as a scaled logsumexp, which
  is algebraically identical and numerically stable on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t2igan.ops.attention import NEG_INF, l2_normalize

Array = jnp.ndarray


def _class_mask(class_ids: Array) -> Array:
    """[B, B] bool: True where (i, j) are the same class but not the same
    sample — those pairs are excluded as negatives (losses.py:56-61)."""
    same = class_ids[:, None] == class_ids[None, :]
    eye = jnp.eye(class_ids.shape[0], dtype=bool)
    return same & ~eye


def _cross_entropy_rows(logits: Array) -> Array:
    """Mean CE with labels = arange(B) (the reference's
    ``nn.CrossEntropyLoss()(scores, labels)`` with match labels)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(logprobs))


def sent_loss(cnn_code: Array, rnn_code: Array,
              class_ids: Array | None, gamma3: float,
              eps: float = 1e-8):
    """Sentence-image matching loss (losses.py:51-91).

    Args:
      cnn_code: [B, D] image embeddings.
      rnn_code: [B, D] sentence embeddings.
      class_ids: [B] int class ids, or None for no same-class masking.
      gamma3: logit scale (cfg.TRAIN.SMOOTH.GAMMA3).

    Returns:
      (loss0, loss1): image→text and text→image cross entropies.
    """
    cnn_norm = jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
    rnn_norm = jnp.linalg.norm(rnn_code, axis=-1, keepdims=True)
    scores = cnn_code @ rnn_code.T
    denom = jnp.clip(cnn_norm * rnn_norm.T, min=eps)
    scores = scores / denom * gamma3                      # [B, B] rows=images
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), NEG_INF, scores)
    loss0 = _cross_entropy_rows(scores)
    loss1 = _cross_entropy_rows(scores.T)
    return loss0, loss1


def attention_match_scores(words: Array, regions: Array,
                           word_mask: Array | None,
                           gamma1: float, gamma2: float,
                           cosine_eps: float = 1e-6) -> Array:
    """R(Q, D) matching score for every (text i, image j) pair.

    Vectorized form of the loop at losses.py:228-251 calling
    ``similarity_text_image`` (losses.py:95-216).

    Args:
      words:   [B, L, D] word embeddings.
      regions: [B, P, D] region embeddings.
      word_mask: [B, L] bool, True at real tokens; or None.
      gamma1/gamma2: DAMSM attention/relevance sharpening factors.

    Returns:
      [B, B] matrix ``R[i, j]`` = attention-driven matching score between
      caption i and image j (rows = texts, matching losses.py:253-254).
    """
    wn = l2_normalize(words)                              # [B, L, D]
    rn = l2_normalize(regions)                            # [B, P, D]
    # sim[i, j, p, l]: similarity of image j's patch p with text i's word l.
    sim = jnp.einsum("jpd,ild->ijpl", rn, wn,
                     preferred_element_type=jnp.float32)
    # Per-patch softmax over words, padding masked to -inf (losses.py:127-144).
    if word_mask is not None:
        keep = word_mask[:, None, None, :]                # broadcast over j, p
        masked = jnp.where(keep, sim, NEG_INF)
    else:
        masked = sim
    sm = jax.nn.softmax(masked, axis=-1)                  # [i, j, p, l]
    # gamma1-sharpened softmax over patches (losses.py:173-174).
    attn = jax.nn.softmax(gamma1 * sm, axis=2)            # over p
    # Region-context vector per word from the normalized regions
    # (losses.py:176-182).
    rc = jnp.einsum("ijpl,jpd->ijld", attn, rn,
                    preferred_element_type=jnp.float32)
    # Cosine relevance per word (torch.nn.CosineSimilarity(dim=2, eps=1e-6)
    # semantics: dot / max(|a|*|b|, eps), losses.py:197-198).
    num = jnp.einsum("ijld,ild->ijl", rc, wn,
                     preferred_element_type=jnp.float32)
    rc_n = jnp.linalg.norm(rc, axis=-1)
    wn_n = jnp.linalg.norm(wn, axis=-1)
    cos = num / jnp.clip(rc_n * wn_n[:, None, :], min=cosine_eps)
    # R(Q,D) = (1/g2) * logsumexp_l(g2 * cos): stable form of
    # log((sum exp(g2*cos))^(1/g2)) at losses.py:199-203.  The sum runs over
    # every word slot, padded ones included — reference behavior.
    return jax.nn.logsumexp(gamma2 * cos, axis=-1) / gamma2


def words_loss(regions: Array, words: Array,
               class_ids: Array | None, word_mask: Array | None,
               gamma1: float, gamma2: float, gamma3: float):
    """Word-region attention matching loss (losses.py:219-272).

    The XLA einsum chain above is the production form.  A fused Pallas
    matching-score kernel (row-tiled fwd + flash-style bwd) shipped as the
    default in rounds 1-3 on the strength of a "2.7x step speedup" that
    round 4's timing-honesty work exposed as wall-fence fiction: by device
    trace span the b48 bf16 DAMSM step runs 29.4 ms on this einsum graph
    vs 30.24 ms with the kernel (a 2.8% loss at production shape), and the
    round-2 backward A/B had already shown jnp recompute winning at every
    batch size.  The kernel was deleted (docs/PERFORMANCE.md round 4;
    implementation preserved at commit e062727^).

    Args:
      regions: [B, P, D] image region embeddings.
      words:   [B, L, D] caption word embeddings.
      class_ids: [B] int ids or None.
      word_mask: [B, L] bool, True at real tokens; or None.

    Returns:
      (loss0, loss1): text→image CE and image→text CE.  Unlike the
      reference (which also returned per-pair attention maps from the
      loss), the maps are not produced here — recompute them via
      :func:`t2igan.ops.attention.word_region_attention` for visualization.
    """
    similarities = attention_match_scores(
        words, regions, word_mask, gamma1, gamma2) * gamma3  # [B_t, B_i]
    if class_ids is not None:
        similarities = jnp.where(_class_mask(class_ids), NEG_INF, similarities)
    loss0 = _cross_entropy_rows(similarities)
    loss1 = _cross_entropy_rows(similarities.T)
    return loss0, loss1


def kl_loss(mu: Array, logvar: Array) -> Array:
    """Conditioning-augmentation KL divergence (losses.py:371-375):
    ``-0.5 * mean(1 + logvar - mu^2 - exp(logvar))``."""
    element = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.mean(element)


def strip_special_tokens(words: Array, mask: Array):
    """Drop the <sos> and <eos> slots from CLIP word embeddings, statically.

    Parity target: ``rm_special_token`` (pretrain_DAMSM.py:58-79), which loops
    over the batch and concatenates around a dynamic <eos> index.  The result
    for a caption [sos, w1..wk, eos, pad...] is [w1..wk, pad...] of fixed
    length L-2 with a mask of k ones.  Here that is a single static gather:
    output j takes input j+1 before the <eos> slot and j+2 after it.

    Args:
      words: [B, L, D] word embeddings (CLIP text tower hidden states).
      mask:  [B, L] int/bool attention mask (1 = real token incl. sos/eos).

    Returns:
      (words_out [B, L-2, D], mask_out [B, L-2] bool).
    """
    b, l, _ = words.shape
    mask = mask.astype(jnp.int32)
    n_real = jnp.sum(mask, axis=-1)                      # k + 2
    # Index of the <eos> token; if the caption fills the window, the reference
    # branch (pretrain_DAMSM.py:66-68) drops first and last slots, which this
    # formula reproduces since eos_pos = L-1.
    eos_pos = jnp.clip(n_real - 1, 1, l - 1)             # [B]
    j = jnp.arange(l - 2)[None, :]                       # [1, L-2]
    idx = jnp.where(j + 1 < eos_pos[:, None], j + 1, j + 2)  # [B, L-2]
    words_out = jnp.take_along_axis(words, idx[:, :, None], axis=1)
    mask_out = jnp.take_along_axis(mask, idx, axis=1).astype(bool)
    return words_out, mask_out
