"""Tensor-parallel sharding rules for the CLIP towers.

The reference has no model parallelism at all (DataParallel only,
trainer.py:255-265), and at these model sizes pure DP is the right default
(see :mod:`t2igan.parallel.mesh`).  This module nevertheless provides
Megatron-style tensor-parallel PartitionSpecs for the transformer towers so
the same train step scales onto a 2-D ``(data, model)`` mesh when wanted —
attention QKV and MLP fc1 shard their output features over ``model``,
out-proj and fc2 shard their input features, embeddings and layernorms
replicate; XLA/GSPMD inserts the all-reduces on ICI automatically.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path, leaf, model_axis: str) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    name = "/".join(keys)
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    # column-parallel: outputs sharded
    if "qkv_proj" in name:
        # fused kernel [d, 3, d] / bias [3, d]: shard the feature dim so
        # each rank holds its own heads' q, k AND v columns
        if name.endswith("kernel"):
            return P(None, None, model_axis)
        if name.endswith("bias"):
            return P(None, model_axis)
    if "fc1" in name:
        if name.endswith("kernel"):
            return P(None, model_axis)
        if name.endswith("bias"):
            return P(model_axis)
    # row-parallel: inputs sharded, outputs all-reduced (bias replicated)
    if any(s in name for s in ("out_proj", "fc2")):
        if name.endswith("kernel"):
            return P(model_axis, None)
        return P()
    # projections/embeddings/layernorms replicate
    return P()


def clip_param_sharding(params: Any, mesh: Mesh,
                        model_axis: str = "model"):
    """NamedSharding tree for CLIP parameters on a (data, model) mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for_path(path, leaf, model_axis)),
        params)


def shard_clip_params(params: Any, mesh: Mesh, model_axis: str = "model"):
    shardings = clip_param_sharding(params, mesh, model_axis)
    return jax.tree.map(jax.device_put, params, shardings)
