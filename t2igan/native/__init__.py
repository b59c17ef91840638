"""ctypes bindings for the native image-preprocessing libraries.

Compiles ``image_ops.cc`` on first use (g++ -O3 -fopenmp, cached next to the
source) and exposes:

* :func:`resize_rgb` — antialiased triangle-filter resize,
* :func:`pyramid` — the full per-sample transform pipeline
  (scale/crop/flip + per-branch resize + CLIP normalize),
* :func:`pyramid_batch` — OpenMP-parallel batched variant.

``available()`` reports whether the library could be built; callers fall
back to the PIL/numpy path when it can't (no compiler in the image).

``image_exec.cc`` (built separately, needs libjpeg/libpng) adds the async
data executor — native file read + decode + transform on a C++ thread pool
with a ring of batch slots:

* :class:`AsyncExecutor` — submit batch plans / wait for the oldest /
  release its slot,
* :func:`decode_image` — sync JPEG/PNG decode (tests, tooling).

``exec_available()`` gates it the same way.
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
_EXEC_SRC = os.path.join(_HERE, "image_exec.cc")
_EXEC_SO = os.path.join(_HERE, "libt2igan_exec.so")
_HDR = os.path.join(_HERE, "image_core.h")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_exec_lib: Optional[ctypes.CDLL] = None
_exec_tried = False

_MEAN = np.asarray(CLIP_MEAN, np.float32)
_STD = np.asarray(CLIP_STD, np.float32)


def _mtime(*paths: str) -> float:
    return max(os.path.getmtime(p) for p in paths if os.path.isfile(p))


def _build() -> Optional[str]:
    if (os.path.isfile(_SO)
            and os.path.getmtime(_SO) >= _mtime(_SRC, _HDR)):
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


# --------------------------------------------------------------------------
# Async data executor (image_exec.cc): native decode + prefetch ring.
# --------------------------------------------------------------------------

def _build_exec() -> Optional[str]:
    if (os.path.isfile(_EXEC_SO)
            and os.path.getmtime(_EXEC_SO) >= _mtime(_EXEC_SRC, _HDR)):
        return _EXEC_SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _EXEC_SRC,
           "-o", _EXEC_SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _EXEC_SO
    except Exception:
        return None


def _load_exec() -> Optional[ctypes.CDLL]:
    global _exec_lib, _exec_tried
    with _lock:
        if _exec_lib is not None or _exec_tried:
            return _exec_lib
        _exec_tried = True
        so = _build_exec()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.t2i_exec_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, f32p, f32p]
        lib.t2i_exec_create.restype = ctypes.c_void_p
        lib.t2i_exec_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), i32p, f32p, u8p]
        lib.t2i_exec_submit.restype = ctypes.c_int
        lib.t2i_exec_inflight.argtypes = [ctypes.c_void_p]
        lib.t2i_exec_inflight.restype = ctypes.c_int
        lib.t2i_exec_wait.argtypes = [
            ctypes.c_void_p, i32p, i32p, ctypes.POINTER(f32p), i32p]
        lib.t2i_exec_wait.restype = ctypes.c_int
        lib.t2i_exec_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.t2i_exec_release.restype = ctypes.c_int
        lib.t2i_exec_destroy.argtypes = [ctypes.c_void_p]
        lib.t2i_decode_file.argtypes = [ctypes.c_char_p, i32p, i32p]
        lib.t2i_decode_file.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.t2i_decode_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        _exec_lib = lib
        return _exec_lib


def exec_available() -> bool:
    return _load_exec() is not None


def decode_image(path: str) -> np.ndarray:
    """Native JPEG/PNG decode -> uint8 HWC RGB (libjpeg/libpng — the same
    codecs PIL wraps, so pixels match ``PIL.Image.open().convert('RGB')``)."""
    lib = _load_exec()
    assert lib is not None, "native exec library unavailable"
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = lib.t2i_decode_file(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if not p:
        raise ValueError(f"t2i_decode_file: cannot decode {path!r}")
    try:
        buf = ctypes.cast(
            p, ctypes.POINTER(ctypes.c_uint8 * (h.value * w.value * 3)))
        out = np.frombuffer(buf.contents, np.uint8).reshape(
            h.value, w.value, 3).copy()
    finally:
        lib.t2i_decode_free(p)
    return out


# Per-sample error codes reported by AsyncExecutor.wait (image_exec.cc).
EXEC_ERR_READ = 1
EXEC_ERR_DECODE = 2
EXEC_ERR_CROP = 4


class AsyncExecutor:
    """Async native data executor: C++ thread pool + ring of batch slots.

    The TPU-native analogue of torch DataLoader worker processes
    (main.py:176-182): Python submits per-batch *plans* (paths, optional CUB
    bbox, crop fractions in [0,1), flip bits) and blocks only on the oldest
    in-flight batch; file IO, JPEG/PNG decode, bbox crop, the
    scale/crop/flip transform and the CLIP-normalized pyramid all run off
    the Python thread.  ``wait`` returns zero-copy views into the slot's
    buffers — valid until ``release(batch_id)`` recycles the slot.
    """

    def __init__(self, branch_sizes: Sequence[int], scale_size: int,
                 crop: int, max_batch: int, n_threads: int = 4,
                 n_slots: int = 3):
        lib = _load_exec()
        assert lib is not None, "native exec library unavailable"
        self._lib = lib
        self.branch_sizes = [int(s) for s in branch_sizes]
        self.max_batch = int(max_batch)
        sizes = np.asarray(self.branch_sizes, np.int32)
        self._h = lib.t2i_exec_create(
            int(n_threads), int(n_slots), self.max_batch, _i32p(sizes),
            len(self.branch_sizes), int(scale_size), int(crop),
            _f32p(_MEAN), _f32p(_STD))
        if not self._h:
            raise RuntimeError("t2i_exec_create failed")

    def submit(self, batch_id: int, paths: Sequence[str],
               bboxes: Optional[Sequence[Optional[Sequence[int]]]],
               uv: np.ndarray, flips: Sequence[bool]) -> None:
        """Queue one batch plan; blocks only while every slot is in flight."""
        n = len(paths)
        assert 1 <= n <= self.max_batch
        cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        bb = np.full((n, 4), -1, np.int32)
        if bboxes is not None:
            for i, b in enumerate(bboxes):
                if b is not None:
                    bb[i] = np.asarray(b, np.int32)
        uv = np.ascontiguousarray(uv, np.float32).reshape(n, 2)
        fl = np.asarray([int(f) for f in flips], np.uint8)
        rc = self._lib.t2i_exec_submit(self._h, int(batch_id), n, cpaths,
                                       _i32p(bb), _f32p(uv), _u8p(fl))
        if rc != 0:
            raise RuntimeError(f"t2i_exec_submit rc={rc}")

    def inflight(self) -> int:
        return self._lib.t2i_exec_inflight(self._h)

    def wait(self):
        """Block for the oldest submitted batch.

        Returns ``(batch_id, branches, sample_err)`` where ``branches`` are
        zero-copy ``[n, s, s, 3]`` float32 views (valid until ``release``)
        and ``sample_err`` is an int32 ``[n]`` of EXEC_ERR_* codes (0 = ok;
        failed samples are zero-filled).
        """
        bid = ctypes.c_int()
        n = ctypes.c_int()
        ptrs = (ctypes.POINTER(ctypes.c_float) * len(self.branch_sizes))()
        errs = np.zeros(self.max_batch, np.int32)
        rc = self._lib.t2i_exec_wait(self._h, ctypes.byref(bid),
                                     ctypes.byref(n), ptrs, _i32p(errs))
        if rc != 0:
            raise RuntimeError("t2i_exec_wait: nothing in flight")
        branches = []
        for b, s in enumerate(self.branch_sizes):
            count = n.value * s * s * 3
            arr = np.ctypeslib.as_array(ptrs[b], shape=(count,))
            branches.append(arr.reshape(n.value, s, s, 3))
        return bid.value, branches, errs[:n.value].copy()

    def release(self, batch_id: int) -> None:
        rc = self._lib.t2i_exec_release(self._h, int(batch_id))
        if rc != 0:
            raise RuntimeError(f"t2i_exec_release: unknown batch {batch_id}")

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.t2i_exec_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
