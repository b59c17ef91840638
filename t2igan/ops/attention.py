"""Attention primitives: word-region attention and gated-memory read.

TPU-first redesign of the reference attention stack
(``GlobalAttention.py:38-230``, ``model.py:406-452``):

* all shapes are static; padding is handled with boolean masks instead of the
  reference's caption-length sorting,
* sequence layout is ``[batch, length, dim]`` (the reference uses
  ``[batch, dim, length]`` to suit torch ``bmm``/``conv1d``; XLA einsum is
  layout-agnostic and the MXU prefers the contraction on the last axis),
* the reference's per-sample mask tiling bug (``mask.repeat(queryL, 1)`` in
  GlobalAttention.py:215 / model.py:438 tiles query-major while the weight
  rows are batch-major, misapplying sample ``j``'s mask to sample ``i``) is
  fixed: masks broadcast per-sample, which is the documented intent.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite -inf substitute: keeps softmax gradients NaN-free


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """L2 normalization matching the reference ``l2norm`` (losses.py:13-18):
    ``x / (sqrt(sum(x^2)) + eps)`` — eps added to the norm, not clamped."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True)) + eps
    return x / norm


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -1):
    """Softmax with positions where ``mask`` is False forced to ~0 weight.

    ``mask`` broadcasts against ``logits``; True = keep.  Uses a large finite
    negative instead of -inf so fully-masked rows produce a uniform
    distribution rather than NaN (the reference relies on at least one valid
    token per caption; we stay well-defined regardless).
    """
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    return jax.nn.softmax(logits, axis=axis)


def word_region_attention(words: jnp.ndarray,
                          regions: jnp.ndarray,
                          word_mask: jnp.ndarray | None,
                          gamma1: float):
    """AttnGAN eq. (7)-(9) word→region attention, batched on the MXU.

    Parity target: ``func_attention`` (GlobalAttention.py:38-160) — including
    its post-fix semantics: similarity on l2-normalized embeddings, padding
    words masked out of the per-patch softmax, then a ``gamma1``-sharpened
    softmax over patches producing one region-context vector per word.

    Args:
      words:   [B, L, D] word embeddings (need not be normalized).
      regions: [B, P, D] region embeddings (need not be normalized).
      word_mask: [B, L] bool, True for real tokens; or None.
      gamma1: attention sharpening factor (cfg.TRAIN.SMOOTH.GAMMA1).

    Returns:
      context: [B, L, D] region-context vector per word, built from the
        l2-normalized regions (matches GlobalAttention.py:153 where
        ``context`` was normalized in place at :60).
      attn:    [B, P, L] per-patch attention over words (post word-softmax),
        the map the reference returns reshaped to [B, L, s, s]
        (GlobalAttention.py:156-158).
    """
    wn = l2_normalize(words)          # [B, L, D]
    rn = l2_normalize(regions)        # [B, P, D]
    # Eq. (7): similarity of every (patch, word) pair.
    sim = jnp.einsum("bpd,bld->bpl", rn, wn,
                     preferred_element_type=jnp.float32)  # [B, P, L]
    # Eq. (8): per-patch distribution over words, padding masked out.
    mask = None if word_mask is None else word_mask[:, None, :]
    attn = masked_softmax(sim, mask, axis=-1)             # [B, P, L]
    # Eq. (9): gamma1-sharpened per-word distribution over patches.
    attn2 = jax.nn.softmax(gamma1 * attn, axis=1)         # softmax over P
    context = jnp.einsum("bpl,bpd->bld", attn2, rn,
                         preferred_element_type=jnp.float32)
    return context, attn


def memory_read(query_map: jnp.ndarray,
                key: jnp.ndarray,
                value: jnp.ndarray,
                pad_mask: jnp.ndarray | None,
                return_attn: bool = True):
    """DM-GAN gated-memory read: each pixel attends over word memory slots.

    Parity target: ``Memory.forward`` (model.py:406-452) with the *intended*
    mask semantics.  The reference's GAN trainer passes the raw
    ``attention_mask`` (1 = real token, trainer.py:317) into a module that
    fills ``-inf`` where ``mask > 0`` (model.py:436-439) — i.e. as written it
    masks out the real tokens; the original DM-GAN passed ``captions == 0``
    (padding).  We implement the documented intent: ``pad_mask`` is True at
    PADDING slots, and those are excluded from the softmax.

    Args:
      query_map: [B, H, W, C] image feature map (NHWC).
      key:       [B, L, C] memory keys.
      value:     [B, L, C] memory values.
      pad_mask:  [B, L] bool, True where the slot is padding; or None.

    Returns:
      read:  [B, H, W, C] value read-out per pixel.
      attn:  [B, H, W, L] attention of each pixel over memory slots, or
        None when ``return_attn=False`` — that path dispatches to the fused
        Pallas kernel on TPU backends, which keeps the attention tensor
        entirely in VMEM (see ops/pallas/memory_read.py).
    """
    if not return_attn:
        # The fused Pallas kernel is the default TPU path: at the full
        # eval graph the round-4 chip A/B measured the XLA einsum form at
        # 1204.3 vs 1437.5 imgs/sec gen+eval (−16.2%), even though the
        # custom-call boundary pays 2x537MB row-major copies at 128^2
        # (docs/PERFORMANCE.md rounds 3-4).  The round-1 "2.2x train step"
        # claim was measured with the broken wall fence (round-4 timing
        # honesty) — the TRAIN-side verdict is re-measured by device trace
        # span via the A/B-only `T2IGAN_MEMREAD=jnp` override below.
        # Non-TPU backends take the einsum form.
        import os

        if (os.environ.get("T2IGAN_MEMREAD", "fused") != "jnp"
                and jax.default_backend() in ("tpu", "axon")):
            from t2igan.ops.pallas.memory_read import memory_read_fused
            return memory_read_fused(query_map, key, value, pad_mask), None

    b, h, w, c = query_map.shape
    q = query_map.reshape(b, h * w, c)
    logits = jnp.einsum("bqc,blc->bql", q, key,
                        preferred_element_type=jnp.float32)
    keep = None if pad_mask is None else (~pad_mask)[:, None, :]
    attn = masked_softmax(logits, keep, axis=-1)          # [B, HW, L]
    read = jnp.einsum("bql,blc->bqc", attn, value,
                      preferred_element_type=jnp.float32)
    attn_maps = attn.reshape(b, h, w, -1) if return_attn else None
    return read.reshape(b, h, w, c), attn_maps
