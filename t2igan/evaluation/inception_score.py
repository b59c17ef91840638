"""Inception Score over a directory of generated images.

Parity target: ``inception_score.py:20-118``: torchvision Inception-v3
softmax predictions, per-split ``exp(mean KL(p(y|x) || p(y)))`` over 10
splits.  The reference's transform chain is original -> Scale(32) (PIL
bilinear) -> Normalize(.5) -> torch-bilinear upsample to 299
(inception_score.py:62-79); we reproduce it with exactly the same two
resamples (PIL on host, the torch kernel on device) so scores are
comparable.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.evaluation.fid import list_images
from t2igan.models.inception import InceptionV3
from t2igan.ops.image import resize_bilinear_torch


def _scale32_one(path: str, size: int) -> np.ndarray:
    from PIL import Image

    im = Image.open(path).convert("RGB")
    w, h = im.size
    if w <= h:
        out = (size, max(1, round(h * size / w)))
    else:
        out = (max(1, round(w * size / h)), size)
    im = im.resize(out, Image.BILINEAR)
    return np.asarray(im, np.float32) / 255.0


def scale32_batches(files: List[str], batch_size: int, size: int = 32,
                    num_workers: int = 6):
    """Host half of the reference IS transform chain
    (inception_score.py:62-66): PIL decode at native resolution ->
    ``transforms.Scale(32)`` (shorter side to 32, PIL BILINEAR — the same
    library call, so bit-identical) -> [0,1] float.  The reference only
    ever feeds square generated images, so batches are (32, 32).

    Decode+resize run on a host thread pool with the next chunk prefetched
    while the device consumes the current one (same pattern as
    ``fid.image_batches``)."""
    from concurrent.futures import ThreadPoolExecutor

    chunks = [files[s:s + batch_size]
              for s in range(0, len(files), batch_size)]
    with ThreadPoolExecutor(max(1, num_workers)) as pool, \
            ThreadPoolExecutor(1) as ahead:

        def make(chunk):
            imgs = list(pool.map(lambda f: _scale32_one(f, size), chunk))
            shapes = {a.shape for a in imgs}
            if len(shapes) > 1:
                raise ValueError(
                    f"mixed post-Scale(32) shapes {shapes}: the IS protocol "
                    "expects uniformly-sized (square) generated images")
            return np.stack(imgs)

        pending = None
        for i, chunk in enumerate(chunks):
            batch = make(chunk) if pending is None else pending.result()
            pending = (ahead.submit(make, chunks[i + 1])
                       if i + 1 < len(chunks) else None)
            yield batch


def make_pred_fn(variables):
    """Jitted [0,1] NHWC 32px batch -> softmax class probabilities.

    Device half of the reference chain (inception_score.py:62-79):
    Normalize(.5, .5) (=> [-1,1]) -> ``nn.Upsample((299, 299),
    'bilinear')`` — the torch kernel, no antialias — -> torchvision
    inception_v3 -> softmax.  Exactly two resamples from the original
    image, matching the reference (original -> 32 -> 299)."""
    model = InceptionV3(variant="torchvision", num_classes=1000)

    @jax.jit
    def run(variables, x01):
        x = 2.0 * x01 - 1.0
        x = resize_bilinear_torch(x, 299, 299)
        logits = model.apply(variables, x)["logits"]
        return jax.nn.softmax(logits, axis=-1)

    # weights as jit argument (not closure constant): keeps the HLO upload
    # under the axon remote-compile limit
    return lambda x01: run(variables, x01)


def inception_score_from_preds(preds: np.ndarray,
                               splits: int = 10) -> Tuple[float, float]:
    """exp(mean KL) per split -> (mean, std) (inception_score.py:84-103)."""
    n = preds.shape[0]
    scores = []
    for k in range(splits):
        part = preds[k * (n // splits):(k + 1) * (n // splits)]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score(path: str, variables, batch_size: int = 32,
                    splits: int = 10) -> Tuple[float, float]:
    pred_fn = make_pred_fn(variables)
    files = list_images(path)
    if not files:
        raise ValueError(f"no images under {path}")
    preds: List[np.ndarray] = []
    for batch in scale32_batches(files, batch_size):
        preds.append(np.asarray(pred_fn(jnp.asarray(batch))))
    return inception_score_from_preds(np.concatenate(preds), splits)
