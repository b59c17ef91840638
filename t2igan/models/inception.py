"""Inception-v3 in flax for FID features and Inception Score.

Parity targets:
* the vendored pytorch-fid network (``inception.py:16-322``): torchvision
  Inception-v3 topology with the TF-FID patches — ``count_include_pad=False``
  average pooling inside InceptionA/C/E (inception.py:205-280) and a
  max-pooled branch in the second InceptionE (inception.py:283-322), feature
  taps after each downsampling stage {64, 192, 768, 2048}
  (inception.py:24-29), input bilinearly resized to 299 and rescaled from
  [0,1] to [-1,1] (inception.py:143-150);
* torchvision ``inception_v3`` used by the IS script (inception_score.py:72).

One flax module covers both via ``variant``: ``"fid"`` applies the patched
pooling and the 1008-way TF-FID classifier head; ``"torchvision"`` keeps
standard pooling and the 1000-way head.  Weights load from a torch state
dict through :func:`convert_torch_inception_state` (drop
``pt_inception-2015-12-05`` or a torchvision checkpoint on local disk —
zero-egress environments can't download them).  Inference-only: BatchNorm
always uses running statistics.  NHWC layout.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _avg_pool3x3(x: Array, count_include_pad: bool) -> Array:
    """3x3 stride-1 average pool, pad 1.  ``count_include_pad=False`` divides
    by the true window size at the borders (the TF-FID patch,
    inception.py:217-219)."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return sums * jnp.asarray(1.0 / 9.0, x.dtype)
    ones = jnp.ones(x.shape[1:3], jnp.float32)[None, :, :, None]
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    # Multiply by the (tiny, constant) reciprocal map instead of dividing
    # the full [B, H, W, C] tensor — divides are far slower on the VPU.
    return sums * (1.0 / counts).astype(x.dtype)


def _max_pool(x: Array, window: int, stride: int, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=1e-3) + relu (torchvision BasicConv2d)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=self.strides, padding=pad, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    """The three same-input 1x1 branch convs run as ONE fused conv
    (``fused1x1``, split after BN+relu — exact, since BN/relu are
    per-channel): one MXU matmul with a wide N instead of three narrow
    ones, and one input read instead of three.  The torch converter
    concatenates the per-branch weights (:func:`_fuse_branch_entries`)."""

    pool_features: int
    fid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fused = BasicConv2d(64 + 48 + 64, (1, 1), dtype=self.dtype,
                            name="fused1x1")(x)
        b1, b5, b3 = jnp.split(fused, (64, 112), axis=-1)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool3x3(x, count_include_pad=not self.fid)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype,
                         name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, dtype=self.dtype,
                          name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        fused = BasicConv2d(192 + 2 * c7, (1, 1), dtype=self.dtype,
                             name="fused1x1")(x)
        b1, b7, bd = jnp.split(fused, (192, 192 + c7), axis=-1)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool3x3(x, count_include_pad=not self.fid)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fused = BasicConv2d(192 + 192, (1, 1), dtype=self.dtype,
                            name="fused1x1")(x)
        b3, b7 = jnp.split(fused, (192,), axis=-1)
        b3 = BasicConv2d(320, (3, 3), strides=2, dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"       # "avg" | "avg_nocount" | "max" (FID E2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fused = BasicConv2d(320 + 384 + 448, (1, 1), dtype=self.dtype,
                            name="fused1x1")(x)
        b1, b3, bd = jnp.split(fused, (320, 704), axis=-1)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype,
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype,
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool3x3(x, count_include_pad=(self.pool == "avg"))
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Inception-v3 trunk with FID feature taps.

    ``variant='fid'`` reproduces pytorch-fid's patched network
    (inception.py:180-322); ``variant='torchvision'`` the stock torchvision
    model used for IS.  ``__call__`` expects NHWC float input that is already
    resized to 299 and scaled to [-1, 1] (use :func:`preprocess`).
    """

    variant: str = "fid"
    num_classes: int = 1008
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        fid = self.variant == "fid"
        out: Dict[str, Array] = {}
        x = BasicConv2d(32, (3, 3), strides=2, dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        out["pool1"] = x                                  # 64-d tap
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        out["pool2"] = x                                  # 192-d tap
        x = InceptionA(32, fid, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, fid, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, fid, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, fid, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, fid, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, fid, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, fid, dtype=self.dtype, name="Mixed_6e")(x)
        out["mixed6e"] = x                                # 768-d tap
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg_nocount" if fid else "avg", dtype=self.dtype,
                       name="Mixed_7b")(x)
        x = InceptionE("max" if fid else "avg", dtype=self.dtype,
                       name="Mixed_7c")(x)
        pooled = jnp.mean(x, axis=(1, 2))                 # global avg pool
        out["pool3"] = pooled                             # 2048-d tap
        out["logits"] = nn.Dense(self.num_classes, dtype=self.dtype,
                                 name="fc")(pooled)
        return out


def preprocess(x01: Array, size: int = 299) -> Array:
    """[0,1] NHWC -> bilinear resize to 299 and rescale to [-1, 1],
    with the exact torch kernel (``F.interpolate(..., mode='bilinear',
    align_corners=False)``, inception.py:143-150 — NO antialias; an
    already-299 input passes through untouched since the interpolation
    matrix is then the identity)."""
    from t2igan.ops.image import resize_bilinear_torch

    x = resize_bilinear_torch(x01, size, size)
    return 2.0 * x - 1.0


# ---------------------------------------------------------------------------
# Torch weight conversion
# ---------------------------------------------------------------------------

# Per-block 1x1 branches that the flax modules run as one fused conv
# (``fused1x1``) — the torch layout keeps them separate, so conversion
# concatenates their weights in this order (must match the jnp.split order
# inside InceptionA/C/D/E above).
_FUSED_1X1 = {
    **{m: ("branch1x1", "branch5x5_1", "branch3x3dbl_1")
       for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d")},
    **{m: ("branch1x1", "branch7x7_1", "branch7x7dbl_1")
       for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e")},
    "Mixed_7a": ("branch3x3_1", "branch7x7x3_1"),
    **{m: ("branch1x1", "branch3x3_1", "branch3x3dbl_1")
       for m in ("Mixed_7b", "Mixed_7c")},
}


def _fuse_branch_entries(params: dict, batch_stats: dict) -> None:
    """Merge the per-branch 1x1 conv/BN entries of each ``_FUSED_1X1`` block
    into the single ``fused1x1`` module the flax graph expects (exact: the
    branches share their input, and BN/relu act per output channel)."""
    for module, branches in _FUSED_1X1.items():
        if module not in params or branches[0] not in params[module]:
            continue
        p, b = params[module], batch_stats[module]
        fused_p = {"conv": {"kernel": np.concatenate(
            [np.asarray(p[br]["conv"]["kernel"]) for br in branches],
            axis=-1)}}
        fused_p["bn"] = {
            k: np.concatenate([np.asarray(p[br]["bn"][k])
                               for br in branches])
            for k in ("scale", "bias")}
        fused_b = {"bn": {
            k: np.concatenate([np.asarray(b[br]["bn"][k])
                               for br in branches])
            for k in ("mean", "var")}}
        for br in branches:
            del p[br]
            del b[br]
        p["fused1x1"] = fused_p
        b["fused1x1"] = fused_b


def convert_torch_inception_state(state_dict,
                                  num_classes: int = 1008) -> dict:
    """Map a torch Inception-v3 state dict (pytorch-fid ``pt_inception`` or
    torchvision ``inception_v3``) onto the flax tree.  Aux-classifier keys
    are ignored."""
    sd = {k: np.asarray(v, dtype=np.float32)
          for k, v in state_dict.items() if not k.startswith("AuxLogits")}
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), val.T.copy())
            else:
                put(params, ("fc", "bias"), val)
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / ...bn.running_mean
        module_path = parts[:-2] if parts[-2] in ("conv", "bn") else parts[:-1]
        kind, name = parts[-2], parts[-1]
        if kind == "conv":
            put(params, tuple(module_path) + ("conv", "kernel"),
                val.transpose(2, 3, 1, 0).copy())
        elif kind == "bn":
            if name == "weight":
                put(params, tuple(module_path) + ("bn", "scale"), val)
            elif name == "bias":
                put(params, tuple(module_path) + ("bn", "bias"), val)
            elif name == "running_mean":
                put(batch_stats, tuple(module_path) + ("bn", "mean"), val)
            elif name == "running_var":
                put(batch_stats, tuple(module_path) + ("bn", "var"), val)
    _fuse_branch_entries(params, batch_stats)
    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, batch_stats)}
