"""ctypes bindings for the native image-preprocessing library.

Compiles ``image_ops.cc`` on first use (g++ -O3 -fopenmp, cached next to the
source) and exposes:

* :func:`resize_rgb` — antialiased triangle-filter resize,
* :func:`pyramid` — the full per-sample transform pipeline
  (scale/crop/flip + per-branch resize + CLIP normalize),
* :func:`pyramid_batch` — OpenMP-parallel batched variant.

``available()`` reports whether the library could be built; callers fall
back to the PIL/numpy path when it can't (no compiler in the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

from t2igan.ops.image import CLIP_MEAN, CLIP_STD

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_ops.cc")
_SO = os.path.join(_HERE, "libt2igan_image.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_MEAN = np.asarray(CLIP_MEAN, np.float32)
_STD = np.asarray(CLIP_STD, np.float32)


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _SO
    except Exception:
        try:  # retry without OpenMP
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", _SRC,
                            "-o", _SO], check=True, capture_output=True,
                           timeout=180)
            return _SO
        except Exception:
            return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.t2i_resize_rgb.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       f32p, ctypes.c_int, ctypes.c_int]
        lib.t2i_pyramid.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.POINTER(f32p), f32p, f32p]
        lib.t2i_pyramid.restype = ctypes.c_int
        lib.t2i_pyramid_batch.argtypes = [
            ctypes.POINTER(u8p), i32p, i32p, ctypes.c_int, ctypes.c_int,
            i32p, i32p, i32p, i32p, ctypes.c_int, ctypes.POINTER(f32p),
            f32p, f32p, ctypes.c_int]
        lib.t2i_pyramid_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def resize_rgb(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Antialiased resize of HWC uint8 RGB -> float32 HWC in [0, 255]."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.float32)
    lib.t2i_resize_rgb(_u8p(img), img.shape[0], img.shape[1],
                       _f32p(out), out_h, out_w)
    return out


def pyramid(img: np.ndarray, scale_size: int, crop: int, crop_x: int,
            crop_y: int, flip: bool,
            branch_sizes: Sequence[int]) -> List[np.ndarray]:
    """Full per-sample pipeline -> list of CLIP-normalized float32 HWC."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    sizes = np.asarray(branch_sizes, np.int32)
    outs = [np.empty((s, s, 3), np.float32) for s in branch_sizes]
    out_ptrs = (ctypes.POINTER(ctypes.c_float) * len(outs))(
        *[_f32p(o) for o in outs])
    err = lib.t2i_pyramid(_u8p(img), img.shape[0], img.shape[1], scale_size,
                          crop, crop_x, crop_y, int(flip), _i32p(sizes),
                          len(outs), out_ptrs, _f32p(_MEAN), _f32p(_STD))
    if err:
        raise ValueError("t2i_pyramid: invalid crop window")
    return outs


def pyramid_batch(imgs: Sequence[np.ndarray], scale_size: int, crop: int,
                  crop_xy: Sequence[Sequence[int]], flips: Sequence[bool],
                  branch_sizes: Sequence[int]) -> List[List[np.ndarray]]:
    """Batched pipeline, parallel across samples."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(imgs)
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    heights = np.asarray([im.shape[0] for im in imgs], np.int32)
    widths = np.asarray([im.shape[1] for im in imgs], np.int32)
    xs = np.asarray([c[0] for c in crop_xy], np.int32)
    ys = np.asarray([c[1] for c in crop_xy], np.int32)
    fl = np.asarray([int(f) for f in flips], np.int32)
    sizes = np.asarray(branch_sizes, np.int32)
    outs = [[np.empty((s, s, 3), np.float32) for s in branch_sizes]
            for _ in range(n)]
    src_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_u8p(i) for i in imgs])
    flat = [o for row in outs for o in row]
    out_ptrs = (ctypes.POINTER(ctypes.c_float) * len(flat))(
        *[_f32p(o) for o in flat])
    err = lib.t2i_pyramid_batch(src_ptrs, _i32p(heights), _i32p(widths),
                                scale_size, crop, _i32p(xs), _i32p(ys),
                                _i32p(fl), _i32p(sizes), len(branch_sizes),
                                out_ptrs, _f32p(_MEAN), _f32p(_STD), n)
    if err:
        raise ValueError("t2i_pyramid_batch: invalid crop window")
    return outs
