"""Inception Score over a directory of generated images.

Parity target: ``inception_score.py:20-118``: torchvision Inception-v3
softmax predictions, per-split ``exp(mean KL(p(y|x) || p(y)))`` over 10
splits; the reference's input pipeline downscales to 32 px before the model
upsamples to 299 (inception_score.py:62-79) and we reproduce that quirk so
scores are comparable.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.evaluation.fid import image_batches, list_images
from t2igan.models.inception import InceptionV3


def make_pred_fn(variables):
    """Jitted [0,1] NHWC batch -> softmax class probabilities.

    Matches the reference transform chain: Scale(32) ->
    Normalize(.5, .5) (=> [-1,1]) -> bilinear upsample to 299
    (inception_score.py:62-79)."""
    model = InceptionV3(variant="torchvision", num_classes=1000)

    @jax.jit
    def run(variables, x01):
        b, _, _, c = x01.shape
        x = jax.image.resize(x01, (b, 32, 32, c), method="bilinear")
        x = 2.0 * x - 1.0
        x = jax.image.resize(x, (b, 299, 299, c), method="bilinear")
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
    for batch in image_batches(files, batch_size, size=299):
        preds.append(np.asarray(pred_fn(jnp.asarray(batch))))
    return inception_score_from_preds(np.concatenate(preds), splits)
