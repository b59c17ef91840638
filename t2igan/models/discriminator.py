"""Per-scale spectral-norm discriminators for 64/128/256 px images.

Parity targets in the reference ``model.py``:

* ``Block3x3_leakRelu`` / ``downBlock`` / ``encode_image_by_16times``
  — model.py:645-672
* ``D_GET_LOGITS`` (conditional + unconditional heads) — model.py:675-701
* ``D_NET64`` / ``D_NET128`` / ``D_NET256`` — model.py:705-768

TPU-first design decisions:
* NHWC; spectral norm as a mutable ``"spectral"`` collection
  (:class:`t2igan.ops.spectral.SNConv`);
* heads emit raw logits — the sigmoid lives fused inside
  :func:`t2igan.losses.gan.bce_with_logits` (reference applies
  ``nn.Sigmoid`` at model.py:686 and BCELoss outside; same objective,
  stabler and one less kernel);
* one module class parameterized by the image size replaces the three
  copy-pasted torch classes; real/fake batches can be concatenated into a
  single forward since the feature trunk is BN-free.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2igan.ops.spectral import SNConv

Array = jnp.ndarray

ortho = jax.nn.initializers.orthogonal


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class DownBlock(nn.Module):
    """SN conv4x4 stride 2 + LeakyReLU(0.2) (model.py:654-659)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return leaky(SNConv(self.features, (4, 4), strides=2, padding=1,
                            dtype=self.dtype)(x))


class Block3x3Leaky(nn.Module):
    """SN conv3x3 stride 1 + LeakyReLU(0.2) (model.py:645-650)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return leaky(SNConv(self.features, (3, 3), strides=1, padding=1,
                            dtype=self.dtype)(x))


class Encode16x(nn.Module):
    """Downsample 16x: 4 strided SN convs (model.py:662-672).
    3 -> ndf -> 2ndf -> 4ndf -> 8ndf."""

    ndf: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for mult in (1, 2, 4, 8):
            x = DownBlock(self.ndf * mult, self.dtype)(x)
        return x


class DGetLogits(nn.Module):
    """Discriminator head on a [B, 4, 4, 8ndf] code (model.py:675-701).

    Conditional: tile the sentence embedding over the 4x4 grid, joint SN conv,
    then a 4x4 stride-4 conv to one logit.  Unconditional: the final conv
    only.  Emits logits (no sigmoid — see module docstring).
    """

    ndf: int
    nef: int
    bcondition: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h_code: Array, c_code: Optional[Array] = None):
        if self.bcondition and c_code is not None:
            b = h_code.shape[0]
            c = jnp.broadcast_to(c_code[:, None, None, :],
                                 (b, 4, 4, self.nef)).astype(h_code.dtype)
            h_c = jnp.concatenate([h_code, c], axis=-1)
            h_c = Block3x3Leaky(self.ndf * 8, self.dtype)(h_c)
        else:
            h_c = h_code
        # Final 4x4 stride-4 conv -> [B, 1, 1, 1]; plain conv (the reference
        # does not spectral-normalize this one, model.py:684-686).
        logits = nn.Conv(1, (4, 4), strides=4, padding="VALID",
                         kernel_init=ortho(), dtype=self.dtype)(h_c)
        return logits.reshape(-1)


class DNet(nn.Module):
    """Per-scale discriminator trunk + heads.

    ``img_size`` selects the reference variant: 64 (D_NET64, model.py:705),
    128 (D_NET128, :723), 256 (D_NET256, :746).
    """

    ndf: int
    nef: int
    img_size: int = 64
    b_jcu: bool = True  # unconditional head present (model.py:711-715)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [B, S, S, 3] in [-1, 1] -> [B, 4, 4, 8ndf] feature code."""
        if x.shape[1] != self.img_size or self.img_size < 64:
            # Without this the head's concat of a <4x4 code with the tiled
            # 4x4 sentence embedding fails deep inside lax.concatenate.
            raise ValueError(
                f"D_NET{self.img_size} got a {x.shape[1]}x{x.shape[2]} "
                f"image; the discriminator trunk downsamples 16x to a 4x4 "
                f"code, so inputs must be {max(self.img_size, 64)}^2 "
                f"(TREE.BASE_SIZE >= 64 — reference floor, model.py:705)")
        h = Encode16x(self.ndf, self.dtype)(x)
        if self.img_size >= 128:
            h = DownBlock(self.ndf * 16, self.dtype)(h)
            if self.img_size == 128:
                h = Block3x3Leaky(self.ndf * 8, self.dtype)(h)
        if self.img_size >= 256:
            h = DownBlock(self.ndf * 32, self.dtype)(h)
            h = Block3x3Leaky(self.ndf * 16, self.dtype)(h)
            h = Block3x3Leaky(self.ndf * 8, self.dtype)(h)
        return h

    def cond_logits(self, h_code: Array, c_code: Array) -> Array:
        return DGetLogits(self.ndf, self.nef, bcondition=True,
                          dtype=self.dtype, name="cond_head")(h_code, c_code)

    def uncond_logits(self, h_code: Array) -> Array:
        if not self.b_jcu:
            raise ValueError("unconditional head disabled (b_jcu=False)")
        return DGetLogits(self.ndf, self.nef, bcondition=False,
                          dtype=self.dtype, name="uncond_head")(h_code)


class DNetWithHeads(nn.Module):
    """Convenience wrapper: one apply returning (features, cond, uncond).

    Keeps all three submodules under a single parameter tree so a D step is
    one ``apply`` per image batch.
    """

    ndf: int
    nef: int
    img_size: int = 64
    b_jcu: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.trunk = DNet(self.ndf, self.nef, self.img_size, self.b_jcu,
                          self.dtype)
        self.cond_head = DGetLogits(self.ndf, self.nef, bcondition=True,
                                    dtype=self.dtype)
        if self.b_jcu:
            self.uncond_head = DGetLogits(self.ndf, self.nef,
                                          bcondition=False, dtype=self.dtype)

    def features(self, x: Array) -> Array:
        return self.trunk(x)

    def cond(self, h: Array, c: Array) -> Array:
        return self.cond_head(h, c)

    def uncond(self, h: Array) -> Array:
        return self.uncond_head(h)

    def __call__(self, x: Array, c: Array):
        h = self.trunk(x)
        cond = self.cond_head(h, c)
        uncond = self.uncond_head(h) if self.b_jcu else None
        return h, cond, uncond
