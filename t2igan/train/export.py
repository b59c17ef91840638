"""Standalone generator export/import.

Parity target: the reference ships inference-ready generator snapshots
(``netG_epoch_%d.pth`` holding the EMA weights, trainer.py:189-200) that the
eval configs point at (``TRAIN.NET_G``, cfg/eval_clip_bird.yml).  Here the
equivalent artifact is a single ``.npz`` holding the EMA parameters and the
generator's BatchNorm running statistics — everything ``sampling()`` needs,
loadable without the optimizer/discriminator state.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


def save_generator(path: str, ema_params, batch_stats) -> str:
    """Write an inference-ready generator artifact (.npz)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}
    for k, v in _flatten(ema_params, "params/").items():
        flat[k] = v
    for k, v in _flatten(batch_stats, "batch_stats/").items():
        flat[k] = v
    np.savez(path, **flat)
    return path


def load_generator(path: str) -> Tuple[dict, dict]:
    """Read (ema_params, batch_stats) from a generator artifact."""
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    stats = _unflatten({k[len("batch_stats/"):]: v for k, v in flat.items()
                        if k.startswith("batch_stats/")})
    return params, stats
