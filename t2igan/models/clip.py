"""CLIP ViT-B/32 text & vision towers in flax, plus the region head.

Parity targets:
* the reference wraps HuggingFace ``CLIPModel`` and adds a trainable
  ``Linear(768, 512)`` projecting ViT patch tokens into the joint space
  (``AddLinearOnCLIP``, model.py:17-79 / pretrain_DAMSM.py:346-360);
* ``encode_image_verbose`` returns (region_encoding, image_encoding)
  (model.py:23-48): regions = linear_subr(vision last_hidden_state) — note
  HF's ``last_hidden_state`` is NOT post-layernormed; image = visual
  projection of the post-layernormed CLS token;
* ``encode_text_verbose`` returns (word_embeddings, sentence_embeddings)
  (model.py:50-70): words = final-layernormed hidden states; sentence = text
  projection of the hidden state at the <eos> position.

TPU-first notes: encoders are pre-norm transformers with dense QKV — pure
MXU work; attention masks are additive and static-shape; computation dtype is
switchable to bfloat16 while parameters stay float32.  A converter maps a
torch ``CLIPModel``/``AddLinearOnCLIP`` state dict onto this tree
(:func:`convert_torch_clip_state`), verified to 1e-4 against the HF forward
in ``tests/test_clip.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

NEG = -3.4e38  # ~ finfo(float32).min, matching HF's mask fill value


@dataclasses.dataclass(frozen=True)
class ClipTowerConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """Defaults are exactly openai/clip-vit-base-patch32."""

    vocab_size: int = 49408
    max_positions: int = 77
    eos_token_id: int = 49407
    projection_dim: int = 512
    image_size: int = 224
    patch_size: int = 32
    region_dim: int = 512  # linear_subr output (model.py:21)
    text: ClipTowerConfig = ClipTowerConfig(512, 12, 8, 2048)
    vision: ClipTowerConfig = ClipTowerConfig(768, 12, 12, 3072)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """HF ``CLIPAttention`` semantics: scaled q, additive mask, f32 softmax."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, bias: Optional[Array] = None) -> Array:
        b, l, d = x.shape
        h = self.num_heads
        hd = d // h

        # One fused [d, 3, d] projection instead of three [d, d] Denses:
        # a single wide MXU matmul and one input read (the torch converter
        # stacks HF's q/k/v weights).  The kept middle axis keeps each
        # rank's q/k/v columns aligned under tensor parallelism
        # (P(None, None, model) — heads stay rank-local, see parallel/tp.py).
        qkv = nn.DenseGeneral((3, d), axis=-1, dtype=self.dtype,
                              name="qkv_proj")(x)
        q = qkv[..., 0, :].reshape(b, l, h, hd) * (hd ** -0.5)
        k = qkv[..., 1, :].reshape(b, l, h, hd)
        v = qkv[..., 2, :].reshape(b, l, h, hd)

        # Plain einsum + f32 softmax.  A Pallas flash-attention variant was
        # built and measured in round 4 (T2IGAN_FLASH_ATTN): CLIP sequences
        # are tiny (77 text / 50 vision tokens), so they pad up to the
        # kernel's 128-token block and the full DAMSM step ran 47.4 vs
        # ~105-128 steps/sec — a decisive loss; the lever was deleted
        # (docs/PERFORMANCE.md round 4).
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights = weights.astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, l, d).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-norm block: LN -> MHA -> +res; LN -> MLP(quick_gelu) -> +res."""

    num_heads: int
    mlp_dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, bias: Optional[Array] = None) -> Array:
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + MultiHeadAttention(self.num_heads, self.dtype,
                                   name="self_attn")(h, bias)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return x + h


class TextTower(nn.Module):
    """CLIP text transformer producing (word_states, eos_pooled)."""

    cfg: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Optional[Array]):
        c = self.cfg.text
        b, l = input_ids.shape
        # Clamp ids: jnp.take's OOB fill mode would silently produce NaN for
        # ids outside the table (e.g. a full-vocab tokenizer against a
        # reduced-vocab test model).
        input_ids = jnp.clip(input_ids, 0, self.cfg.vocab_size - 1)
        # Gather from the f32 table, convert the 77-row result: with
        # dtype=bf16 on nn.Embed, XLA converts the whole 49408x512 table
        # (50 MB) ahead of the take EVERY call (0.14 ms/iter in the round-2
        # trace); converting after the gather is bitwise-identical.
        tok = nn.Embed(self.cfg.vocab_size, c.hidden_size,
                       name="token_embedding")(input_ids).astype(self.dtype)
        pos = self.param("position_embedding",
                         jax.nn.initializers.normal(0.02),
                         (self.cfg.max_positions, c.hidden_size), jnp.float32)
        x = tok + pos[None, :l].astype(self.dtype)
        # Additive bias: causal mask + padding mask (HF combines them).
        causal = jnp.triu(jnp.full((l, l), NEG, jnp.float32), k=1)
        bias = causal[None, None]
        if attention_mask is not None:
            pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG)
            bias = bias + pad
        for i in range(c.num_layers):
            x = EncoderLayer(c.num_heads, c.mlp_dim, c.layer_norm_eps,
                             self.dtype, name=f"layers_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        # Pool at the first <eos> position (HF CLIPTextTransformer).
        eos_pos = jnp.argmax(
            (input_ids == self.cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        return x, pooled


class PatchEmbed(nn.Module):
    """ViT patch embedding as space-to-depth + ONE matmul.

    The parameter tree is identical to
    ``nn.Conv(D, (p, p), strides=(p, p), use_bias=False)`` — a ``kernel``
    of shape [p, p, C, D] — so the HF/torch converters and checkpoints are
    unchanged.  Why not a conv: in the adversarial step, gradients flow
    THROUGH the generated image into the generator (the DAMSM term on
    fakes), and XLA lowers the stride-32 conv's INPUT gradient to a
    pathological 20.6 ms/view fusion — two caption views = 41 ms, a third
    of the whole b16 train step (trace ``.profiles/train_r4``,
    docs/PERFORMANCE.md round 4).  As space-to-depth + matmul the backward
    is a plain [B·P, D] @ [D, p·p·C] matmul plus a free reshape/transpose.
    """

    hidden: int
    patch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cc = x.shape
        p = self.patch
        assert h % p == 0 and w % p == 0, (h, w, p)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, cc, self.hidden), jnp.float32)
        hp, wp = h // p, w // p
        x = x.reshape(b, hp, p, wp, p, cc).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp * wp, p * p * cc).astype(self.dtype)
        k = kernel.reshape(p * p * cc, self.hidden).astype(self.dtype)
        return x @ k                                      # [B, P, D]


class VisionTower(nn.Module):
    """CLIP ViT producing (last_hidden [B, 1+P, D], pooled post-LN CLS)."""

    cfg: ClipConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array):
        """pixel_values: [B, H, W, 3] NHWC, CLIP-normalized."""
        c = self.cfg.vision
        p = self.cfg.patch_size
        b = pixel_values.shape[0]
        patches = PatchEmbed(c.hidden_size, p, self.dtype,
                             name="patch_embedding")(pixel_values)
        cls = self.param("class_embedding",
                         jax.nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (b, 1, c.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)       # [B, 1+P, D]
        n_pos = x.shape[1]
        pos = self.param("position_embedding",
                         jax.nn.initializers.normal(0.02),
                         ((self.cfg.image_size // p) ** 2 + 1, c.hidden_size),
                         jnp.float32)
        x = x + pos[None, :n_pos].astype(self.dtype)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = EncoderLayer(c.num_heads, c.mlp_dim, c.layer_norm_eps,
                             self.dtype, name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return x, pooled


class ClipWithRegionHead(nn.Module):
    """Full joint encoder: CLIP backbone + linear_subr region head.

    The flagship text/image encoder of the framework; the TPU-native
    equivalent of ``AddLinearOnCLIP`` (model.py:17-79).
    """

    cfg: ClipConfig = ClipConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.text_model = TextTower(self.cfg, self.dtype)
        self.vision_model = VisionTower(self.cfg, self.dtype)
        self.text_projection = nn.Dense(self.cfg.projection_dim,
                                        use_bias=False, dtype=self.dtype)
        self.visual_projection = nn.Dense(self.cfg.projection_dim,
                                          use_bias=False, dtype=self.dtype)
        self.linear_subr = nn.Dense(self.cfg.region_dim, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1.0 / 0.07),
                                                 jnp.float32))

    def encode_text_verbose(self, input_ids: Array,
                            attention_mask: Optional[Array] = None):
        """(word_embs [B, L, 512], sent_emb [B, 512]) — model.py:50-70.
        Word embeddings are the raw final-LN hidden states (no projection),
        exactly like the reference."""
        words, pooled = self.text_model(input_ids, attention_mask)
        return words, self.text_projection(pooled)

    def encode_image_verbose(self, pixel_values: Array):
        """(region_enc [B, 1+P, 512], image_enc [B, 512]) — model.py:23-48.
        Regions come from the *pre*-post-layernorm hidden states through the
        trainable linear_subr head; layout is [B, tokens, dim] (the reference
        permutes to channel-first for torch bmm)."""
        hidden, pooled = self.vision_model(pixel_values)
        return self.linear_subr(hidden), self.visual_projection(pooled)

    def __call__(self, pixel_values: Array, input_ids: Array,
                 attention_mask: Optional[Array] = None):
        """(img, subr, sent, words) — the 4-tuple of AddLinearOnCLIP.forward
        (model.py:72-79).  ``img`` and ``sent`` are l2-normalized because the
        reference reads them from HF ``CLIPModel.forward``'s
        ``image_embeds``/``text_embeds``, which are normalized there (unlike
        the ``encode_*_verbose`` paths)."""
        subr, img = self.encode_image_verbose(pixel_values)
        words, sent = self.encode_text_verbose(input_ids, attention_mask)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        sent = sent / jnp.linalg.norm(sent, axis=-1, keepdims=True)
        return img, subr, sent, words


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def convert_torch_clip_state(state_dict, cfg: ClipConfig = ClipConfig()):
    """Convert a torch ``CLIPModel`` (or reference ``AddLinearOnCLIP``,
    checkpoints saved at trainer.py:461-462 / pretrain_DAMSM.py:493-494)
    state dict into this module's flax variables.

    Accepts keys with or without the ``backbone.`` / ``module.`` prefixes the
    reference's DataParallel checkpoints carry (main.py:149-151).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "").replace("backbone.", "")
        sd[k] = np.asarray(v, dtype=np.float32)

    p: dict = {"text_model": {}, "vision_model": {}}

    # --- text tower ---
    t = p["text_model"]
    t["token_embedding"] = {
        "embedding": sd["text_model.embeddings.token_embedding.weight"]}
    t["position_embedding"] = sd[
        "text_model.embeddings.position_embedding.weight"]
    for i in range(cfg.text.num_layers):
        src = f"text_model.encoder.layers.{i}"
        t[f"layers_{i}"] = _convert_layer(sd, src)
    t["final_layer_norm"] = {
        "scale": sd["text_model.final_layer_norm.weight"],
        "bias": sd["text_model.final_layer_norm.bias"]}

    # --- vision tower ---
    v = p["vision_model"]
    # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    v["patch_embedding"] = {
        "kernel": np.transpose(
            sd["vision_model.embeddings.patch_embedding.weight"],
            (2, 3, 1, 0))}
    v["class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    v["position_embedding"] = sd[
        "vision_model.embeddings.position_embedding.weight"]
    v["pre_layrnorm"] = {
        "scale": sd["vision_model.pre_layrnorm.weight"],
        "bias": sd["vision_model.pre_layrnorm.bias"]}
    for i in range(cfg.vision.num_layers):
        src = f"vision_model.encoder.layers.{i}"
        v[f"layers_{i}"] = _convert_layer(sd, src)
    v["post_layernorm"] = {
        "scale": sd["vision_model.post_layernorm.weight"],
        "bias": sd["vision_model.post_layernorm.bias"]}

    p["text_projection"] = {"kernel": _t(sd["text_projection.weight"])}
    p["visual_projection"] = {"kernel": _t(sd["visual_projection.weight"])}
    if "linear_subr.weight" in sd:
        p["linear_subr"] = {"kernel": _t(sd["linear_subr.weight"]),
                            "bias": sd["linear_subr.bias"]}
    else:  # bare CLIPModel checkpoint: fresh head
        rng = np.random.default_rng(0)
        p["linear_subr"] = {
            "kernel": (rng.standard_normal(
                (cfg.vision.hidden_size, cfg.region_dim)) /
                np.sqrt(cfg.vision.hidden_size)).astype(np.float32),
            "bias": np.zeros((cfg.region_dim,), np.float32)}
    p["logit_scale"] = sd.get("logit_scale",
                              np.float32(np.log(1.0 / 0.07)))
    return {"params": jax.tree.map(jnp.asarray, p)}


def _convert_layer(sd, src):
    def lin(name):
        return {"kernel": _t(sd[f"{src}.{name}.weight"]),
                "bias": sd[f"{src}.{name}.bias"]}

    qkv = [lin(f"self_attn.{n}_proj") for n in ("q", "k", "v")]
    return {
        "self_attn": {
            # fused [d, 3, d] kernel / [3, d] bias (see MultiHeadAttention)
            "qkv_proj": {
                "kernel": np.stack([p["kernel"] for p in qkv], axis=1),
                "bias": np.stack([p["bias"] for p in qkv], axis=0),
            },
            "out_proj": lin("self_attn.out_proj"),
        },
        "layer_norm1": {"scale": sd[f"{src}.layer_norm1.weight"],
                        "bias": sd[f"{src}.layer_norm1.bias"]},
        "layer_norm2": {"scale": sd[f"{src}.layer_norm2.weight"],
                        "bias": sd[f"{src}.layer_norm2.bias"]},
        "fc1": {"kernel": _t(sd[f"{src}.mlp.fc1.weight"]),
                "bias": sd[f"{src}.mlp.fc1.bias"]},
        "fc2": {"kernel": _t(sd[f"{src}.mlp.fc2.weight"]),
                "bias": sd[f"{src}.mlp.fc2.bias"]},
    }
