"""FID: Inception activations, Gaussian statistics, Fréchet distance.

Parity target: the vendored pytorch-fid CLI (``fid_score.py:21-250``):
activations from the patched Inception-v3 pool3 tap, (mu, sigma) per image
set, then ``|mu1-mu2|^2 + tr(s1) + tr(s2) - 2 tr(sqrtm(s1 s2))`` with an
eps-jitter retry for singular covariances (fid_score.py:113-164).

TPU-first redesign: activations run as one batched jitted inference sweep;
the matrix square root uses the symmetric eigendecomposition route —
``tr sqrtm(s1 s2) = tr sqrtm(s1^{1/2} s2 s1^{1/2})`` — which is exact for
PSD inputs and runs on-device (``jnp.linalg.eigh``), instead of scipy's
general ``sqrtm`` on host.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.models.inception import InceptionV3, preprocess

Array = jnp.ndarray


# dims -> feature tap, mirroring pytorch-fid's BLOCK_INDEX_BY_DIM
# (inception.py:24-29); spatial taps are adaptive-avg-pooled to vectors
# exactly as fid_score.py:101-102 does.
TAP_BY_DIM = {64: "pool1", 192: "pool2", 768: "mixed6e", 2048: "pool3"}


def make_activation_fn(variables, variant: str = "fid", dims: int = 2048):
    """Jitted [0,1]-NHWC image batch -> ``dims``-d activations.

    Weights enter the jit as an argument (bound in a wrapper): closure
    constants are serialized into the HLO upload and can exceed the axon
    remote-compile request limit.  XLA dead-code-eliminates the layers
    past the selected tap, so shallow taps also run faster."""
    if dims not in TAP_BY_DIM:
        raise ValueError(f"--dims must be one of {sorted(TAP_BY_DIM)}")
    tap = TAP_BY_DIM[dims]
    model = InceptionV3(variant=variant,
                        num_classes=1008 if variant == "fid" else 1000)

    @jax.jit
    def run(variables, x01):
        feat = model.apply(variables, preprocess(x01))[tap]
        if feat.ndim == 4:  # spatial tap -> global average pool
            feat = jnp.mean(feat, axis=(1, 2))
        return feat

    return lambda x01: run(variables, x01)


def compute_statistics(activation_fn, batches: Iterable[np.ndarray]
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate (mu, sigma) over an iterable of [B, H, W, 3] [0,1]
    float batches (fid_score.py:167-188)."""
    acts: List[np.ndarray] = []
    for batch in batches:
        acts.append(np.asarray(activation_fn(jnp.asarray(batch))))
    a = np.concatenate(acts, axis=0).astype(np.float64)
    mu = a.mean(axis=0)
    sigma = np.cov(a, rowvar=False)
    return mu, sigma


def _sqrtm_psd(mat: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Symmetric PSD matrix square root via eigh; negative eigenvalues from
    roundoff are clamped (the same role as pytorch-fid's imaginary-part
    check, fid_score.py:151-157)."""
    w, v = np.linalg.eigh(mat)
    w = np.clip(w, eps, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (fid_score.py:113-164).

    The activation sweep runs on TPU; this final 2048^2 reduction is a
    one-off host computation kept in float64 (JAX's default f32 loses the
    1e-6 agreement with the reference's scipy.sqrtm route)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64)
    s2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2

    s1_half = _sqrtm_psd(s1)
    inner = s1_half @ s2 @ s1_half
    w = np.linalg.eigvalsh(inner)
    tr_covmean = np.sum(np.sqrt(np.clip(w, 0.0, None)))
    fid = float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_covmean)
    if not np.isfinite(fid):
        # jittered retry, mirroring fid_score.py:146-150
        off = eps * np.eye(s1.shape[0])
        return frechet_distance(mu1, s1 + off, mu2, s2 + off, eps)
    return fid


# ---------------------------------------------------------------------------
# Directory walking + CLI (mirrors fid_score.py's path interface)
# ---------------------------------------------------------------------------

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def list_images(path: str) -> List[str]:
    out = []
    for root, _, names in os.walk(path):
        for n in sorted(names):
            if os.path.splitext(n)[1].lower() in IMAGE_EXTS:
                out.append(os.path.join(root, n))
    return out


def _decode_for_fid(path: str, size: int) -> np.ndarray:
    """One file -> [0,1] float HWC at `size` (fid_score.py ImagePathDataset
    + ToTensor + the model's internal resize).  Uses the native
    libjpeg/libpng decoder when built (same codecs PIL wraps — identical
    pixels), PIL otherwise."""
    from t2igan import native
    from t2igan.ops.image import resize_bilinear_torch_np

    arr = None
    if native.exec_available():
        try:
            arr = native.decode_image(path).astype(np.float32) / 255.0
        except ValueError:
            arr = None  # exotic format: PIL below
    if arr is None:
        from PIL import Image

        arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    if arr.shape[:2] != (size, size):
        arr = resize_bilinear_torch_np(arr, size, size)
    return arr


def image_batches(files: List[str], batch_size: int, size: int = 299,
                  num_workers: int = 6):
    """Decode to [0,1] float NHWC batches (fid_score.py ImagePathDataset +
    ToTensor).

    Protocol fidelity: pytorch-fid feeds native-resolution tensors and the
    model resizes internally with torch bilinear, no antialias
    (inception.py:143-147).  We apply the *same* kernel
    (:func:`resize_bilinear_torch_np`) per image on host — one resample
    from native resolution, identical arithmetic — so arbitrary native
    sizes batch into one static device shape (XLA needs static shapes; the
    reference itself crashes on mixed-size dirs with batch>1).  The device
    :func:`preprocess` resize is then an exact identity.

    Decode runs on a host thread pool (native codec releases the GIL) with
    the next chunk prefetched while the current one is consumed on device —
    the 30k-image eval sweep is host-decode-bound otherwise."""
    from concurrent.futures import ThreadPoolExecutor

    chunks = [files[s:s + batch_size]
              for s in range(0, len(files), batch_size)]
    # Two pools so the prefetch task can never starve its own decode
    # workers (a nested submit into one pool deadlocks at num_workers=1).
    with ThreadPoolExecutor(max(1, num_workers)) as pool, \
            ThreadPoolExecutor(1) as ahead:

        def make(chunk):
            return np.stack(
                list(pool.map(lambda f: _decode_for_fid(f, size), chunk)))

        pending = None
        for i, chunk in enumerate(chunks):
            batch = make(chunk) if pending is None else pending.result()
            pending = (ahead.submit(make, chunks[i + 1])
                       if i + 1 < len(chunks) else None)
            yield batch


def statistics_of_path(path: str, activation_fn, batch_size: int = 50):
    """(mu, sigma) for a directory of images or a precomputed .npz
    (fid_score.py:191-203)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    files = list_images(path)
    if not files:
        raise ValueError(f"no images under {path}")
    return compute_statistics(activation_fn,
                              image_batches(files, batch_size))


def calculate_fid_given_paths(paths, activation_fn,
                              batch_size: int = 50) -> float:
    """FID between two image directories (fid_score.py:206-222)."""
    m1, s1 = statistics_of_path(paths[0], activation_fn, batch_size)
    m2, s2 = statistics_of_path(paths[1], activation_fn, batch_size)
    return frechet_distance(m1, s1, m2, s2)
