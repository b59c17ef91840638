"""On-device image ops: upsampling, resizing, normalization.

The reference does all of this with torch/torchvision host-side helpers
(``nn.Upsample`` model.py:106, ``F.interpolate`` losses.py:348,
``transforms.Normalize`` datasets.py:403-406); here they are pure jnp ops that
fuse into the surrounding XLA graphs.  NHWC layout throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# CLIP preprocessing constants (datasets.py:405-406).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (``nn.Upsample(scale_factor=2,
    mode='nearest')``, model.py:106) for NHWC tensors.

    Implemented with reshape+broadcast instead of a gather so XLA lowers it
    to a pure data-movement op that fuses with the following convolution.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def resize_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest resize to (size, size) — semantics of
    ``F.interpolate(img, size=...)`` whose default mode is nearest
    (losses.py:348, trainer.py:579)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="nearest")


def resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


def clip_normalize(x01: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0,1] RGB to CLIP statistics (datasets.py:403-406)."""
    mean = jnp.asarray(CLIP_MEAN, dtype=x01.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x01.dtype)
    return (x01 - mean) / std


def tanh_to_clip(img: jnp.ndarray) -> jnp.ndarray:
    """Map generator output in [-1, 1] to CLIP-normalized space.

    NOTE (reference fidelity): the reference feeds the raw [-1, 1] generator
    output straight into CLIP after a nearest resize (losses.py:348-349,
    trainer.py:579-584) — without re-normalizing to CLIP statistics.  Real
    images, by contrast, reach CLIP via ``transforms.Normalize`` with the
    CLIP mean/std.  We reproduce that behavior exactly (identity here apart
    from the resize) so the DAMSM ranking-loss distribution matches; this
    helper exists for the *corrected* pipeline variant.
    """
    x01 = (img + 1.0) * 0.5
    return clip_normalize(x01)


def uint8_from_tanh(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> [0,255] uint8 (trainer.py:566-567)."""
    return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
