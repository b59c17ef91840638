"""Legacy AttnGAN-heritage encoders (pre-CLIP path).

Parity targets (dead in the CLIP configs but part of the reference surface,
SURVEY §2 #26):
* ``RNN_ENCODER`` — bidirectional LSTM/GRU text encoder over the legacy
  word-index vocabulary (model.py:140-221); used by ``gen_example``
  (trainer.py:624-631).
* ``CNN_ENCODER`` — Inception-v3 DAMSM image encoder with trainable
  region/global embedding heads (model.py:224-329).
* ``GlobalAttention_text`` — text-side attention readout
  (GlobalAttention.py:233-280).

TPU-first notes: the recurrence runs as a ``flax.linen`` scan-based RNN
(static [B, T] shapes, output masked by length — no PackedSequence); the CNN
encoder reuses the framework's Inception-v3 trunk
(:mod:`t2igan.models.inception`) with the 17x17 Mixed_6e tap for region
features, exactly the reference's choice (model.py:296-309).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2igan.models.inception import InceptionV3

Array = jnp.ndarray


class RnnEncoder(nn.Module):
    """Bi-directional LSTM/GRU text encoder (model.py:140-221).

    Returns (words_emb [B, T, H], sent_emb [B, H]) where H = ``nhidden``;
    the per-direction width is H/2 like the reference (model.py:156).
    ``drop_prob`` applies to embeddings during training (model.py:198).
    """

    ntoken: int
    ninput: int = 300
    nhidden: int = 128
    rnn_type: str = "LSTM"
    drop_prob: float = 0.5

    @nn.compact
    def __call__(self, captions: Array, cap_lens: Array,
                 train: bool = False):
        h = self.nhidden // 2
        emb = nn.Embed(self.ntoken, self.ninput,
                       embedding_init=jax.nn.initializers.uniform(0.1)
                       )(captions)
        if train:
            emb = nn.Dropout(self.drop_prob)(
                emb, deterministic=False, rng=self.make_rng("dropout"))
        cell_cls = nn.OptimizedLSTMCell if self.rnn_type == "LSTM" \
            else nn.GRUCell
        fwd = nn.RNN(cell_cls(h), name="fwd")
        bwd = nn.RNN(cell_cls(h), reverse=True, keep_order=True, name="bwd")
        seq_lengths = cap_lens.astype(jnp.int32)
        out_f = fwd(emb, seq_lengths=seq_lengths)
        out_b = bwd(emb, seq_lengths=seq_lengths)
        words = jnp.concatenate([out_f, out_b], axis=-1)      # [B, T, H]
        t = captions.shape[1]
        mask = jnp.arange(t)[None, :] < seq_lengths[:, None]
        words = words * mask[:, :, None]
        # sentence embedding: final fwd state + first bwd state (the
        # concatenated last-layer hidden state, model.py:216-220)
        idx = jnp.clip(seq_lengths - 1, 0, t - 1)
        last_f = out_f[jnp.arange(out_f.shape[0]), idx]
        first_b = out_b[:, 0]
        sent = jnp.concatenate([last_f, first_b], axis=-1)
        return words, sent


class CnnEncoder(nn.Module):
    """Inception-v3 DAMSM image encoder (model.py:224-329).

    Returns (region features [B, 17, 17, nef], global code [B, nef]):
    Mixed_6e tap through a 1x1 conv head, final pooled 2048 through a linear
    head — both heads trainable with U(-0.1, 0.1) init (model.py:264-267),
    backbone frozen by the caller (stop_gradient, like requires_grad=False
    at model.py:235-236).
    """

    nef: int = 256

    @nn.compact
    def __call__(self, images: Array):
        """images: [B, H, W, 3] already resized/scaled for inception."""
        trunk = InceptionV3(variant="torchvision", num_classes=1000,
                            name="inception")
        out = trunk(images)
        features = jax.lax.stop_gradient(out["mixed6e"])
        code = jax.lax.stop_gradient(out["pool3"])
        u = jax.nn.initializers.uniform(scale=0.1)
        features = nn.Conv(self.nef, (1, 1), use_bias=False,
                           kernel_init=u, name="emb_features")(features)
        code = nn.Dense(self.nef, use_bias=True, kernel_init=u,
                        name="emb_cnn_code")(code)
        return features, code


class GlobalAttentionText(nn.Module):
    """Text-side attention (GlobalAttention.py:233-280): pixels attend over
    projected word context; returns the per-word weighted image features."""

    idf: int

    @nn.compact
    def __call__(self, input_map: Array, context: Array,
                 pad_mask: Optional[Array] = None):
        """input_map: [B, H, W, idf]; context: [B, L, cdf]."""
        b, h, w, c = input_map.shape
        source = nn.Dense(self.idf, name="conv_context")(context)  # [B,L,idf]
        target = input_map.reshape(b, h * w, c)
        attn = jnp.einsum("bqc,blc->bql", target, source)
        if pad_mask is not None:
            attn = jnp.where(pad_mask[:, None, :], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=1)       # over pixels (Gl.py:272)
        weighted = jnp.einsum("bqc,bql->blc", target, attn)
        return weighted                            # [B, L, idf]
