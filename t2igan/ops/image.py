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


# ---------------------------------------------------------------------------
# torch-exact bilinear resize (no antialias)
# ---------------------------------------------------------------------------
#
# ``jax.image.resize(method="bilinear")`` antialiases on downscale (TF2
# semantics); torch's ``F.interpolate(mode='bilinear',
# align_corners=False)`` — the resize inside pytorch-fid's InceptionV3
# (reference inception.py:143-147) and the IS script's ``nn.Upsample``
# (inception_score.py:74) — does not.  For eval-metric bit-fidelity we
# implement the torch kernel exactly: half-pixel source mapping
# ``src = (i + 0.5) * in/out - 0.5`` clamped at 0, two-tap lerp.  Because
# each output row/col is a fixed 2-tap linear combination of input
# rows/cols, the whole resize is two small matmuls — which XLA maps
# straight onto the MXU, faster than a gather-based lowering.

def _linear_resize_matrix(in_size: int, out_size: int):
    """[out, in] f32 interpolation matrix for torch bilinear
    (align_corners=False), exact for up- and downscaling."""
    import numpy as np

    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    # torch clamps the source index at 0 (area_pixel_compute_source_index)
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


def resize_bilinear_torch(x: jnp.ndarray, out_h: int,
                          out_w: int) -> jnp.ndarray:
    """NHWC resize matching ``F.interpolate(x, (out_h, out_w),
    mode='bilinear', align_corners=False)`` exactly (no antialias)."""
    _, h, w, _ = x.shape
    mh = jnp.asarray(_linear_resize_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_linear_resize_matrix(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


def resize_bilinear_torch_np(img, out_h: int, out_w: int):
    """Host (numpy) twin of :func:`resize_bilinear_torch` for a single HWC
    image — used by the eval input pipelines to bring arbitrary native
    resolutions to one static device shape with the same arithmetic."""
    import numpy as np

    h, w = img.shape[:2]
    mh = _linear_resize_matrix(h, out_h)
    mw = _linear_resize_matrix(w, out_w)
    return np.einsum("oh,hwc,pw->opc", mh, img.astype(np.float32), mw)


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
