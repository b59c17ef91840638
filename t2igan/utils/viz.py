"""Attention-map visualization grids.

Parity target: the reference's ``build_super_images``/``2``
(miscc/utils.py:54-327, partly broken — undefined names at :101/:147) and
``build_super_images3`` (pretrain_DAMSM.py:231-270).  This is a working
PIL-only reimplementation of the intent: a grid of images with per-word
attention heatmaps overlaid and the word text printed above each cell.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from t2igan.ops.image import CLIP_MEAN, CLIP_STD


def denormalize_clip(x: np.ndarray) -> np.ndarray:
    """CLIP-normalized float -> [0,1] (inverse of datasets.py:403-406)."""
    return np.clip(x * np.asarray(CLIP_STD) + np.asarray(CLIP_MEAN), 0, 1)


def tanh_to01(x: np.ndarray) -> np.ndarray:
    return np.clip((x + 1.0) * 0.5, 0, 1)


def _upscale_nearest(a: np.ndarray, size: int) -> np.ndarray:
    """Nearest-resize a 2-D map to exactly (size, size)."""
    idx_r = (np.arange(size) * a.shape[0]) // size
    idx_c = (np.arange(size) * a.shape[1]) // size
    return a[np.ix_(idx_r, idx_c)]


def attention_grid(images01: np.ndarray, attn: np.ndarray,
                   words: Sequence[Sequence[str]],
                   max_words: int = 8, cell: int = 96) -> np.ndarray:
    """Build an attention grid image.

    Args:
      images01: [B, S, S, 3] in [0, 1].
      attn: [B, Hw, Ww, L] (or [B, P, L] flat) attention of image regions
        over words.
      words: per-sample word strings.

    Returns: uint8 HWC grid: one row per sample, the raw image followed by
    up to ``max_words`` heatmap overlays.
    """
    from PIL import Image, ImageDraw

    b = images01.shape[0]
    if attn.ndim == 3:
        p = attn.shape[1]
        side = int(np.sqrt(p))
        attn = attn[:, :side * side, :].reshape(b, side, side, -1)
    n_words = min(max_words, attn.shape[-1])
    pad_top = 14
    grid = Image.new("RGB", ((n_words + 1) * cell, b * (cell + pad_top)),
                     "white")
    draw = ImageDraw.Draw(grid)
    for i in range(b):
        base = Image.fromarray(
            (images01[i] * 255).astype(np.uint8)).resize((cell, cell))
        y = i * (cell + pad_top) + pad_top
        grid.paste(base, (0, y))
        for w in range(n_words):
            amap = np.nan_to_num(attn[i, :, :, w])
            amax = amap.max() if amap.max() > 0 else 1.0
            amap = _upscale_nearest(amap / amax, cell)
            overlay = np.asarray(base, np.float32) / 255.0
            heat = np.stack([amap, np.zeros_like(amap), 1.0 - amap], -1)
            mix = np.clip(0.6 * overlay + 0.4 * heat, 0, 1)
            tile = Image.fromarray((mix * 255).astype(np.uint8))
            x = (w + 1) * cell
            grid.paste(tile, (x, y))
            label = words[i][w] if w < len(words[i]) else ""
            draw.text((x + 2, y - pad_top + 2), label[:12], fill="black")
    return np.asarray(grid)


def save_image_grid(images01: np.ndarray, path: str, ncol: int = 8):
    """Save a batch of [0,1] images as one tiled PNG."""
    from PIL import Image

    b, s, _, _ = images01.shape
    ncol = min(ncol, b)
    nrow = (b + ncol - 1) // ncol
    grid = np.zeros((nrow * s, ncol * s, 3), np.float32)
    for i in range(b):
        r, c = divmod(i, ncol)
        grid[r * s:(r + 1) * s, c * s:(c + 1) * s] = images01[i]
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
