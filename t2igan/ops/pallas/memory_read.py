"""Fused gated-memory read kernel (Pallas/TPU).

The DM-GAN memory READ (model.py:406-452) attends every generator pixel over
the word memory slots.  At the 128x128 stage with 77 slots the XLA path
materializes a [B, 16384, 77] attention tensor in HBM twice (softmax input
and output) — ~320 MB of traffic per forward at batch 64, pure bandwidth
waste since the attention is consumed immediately by the value readout.

This kernel tiles the pixels: each grid program holds a [T, C] query tile
plus the full [L, C] key/value (a few KB) in VMEM, computes logits, masked
softmax and the readout without the attention ever leaving the chip.

Used on the inference path (``return_attn=False``); training keeps the jnp
implementation, where XLA's DCE already eliminates the unused attention
output, and the visualization path still asks for the explicit maps.  The
backward (for completeness) recomputes through the jnp reference via
``jax.custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, keep_ref, out_ref):
    """q_ref: [1, T, C]; k_ref/v_ref: [1, L, C]; keep_ref: [1, 1, L]
    (1 = attend, 0 = padding/tile-pad); out_ref: [1, T, C]."""
    q = q_ref[0]                                        # [T, C]
    k = k_ref[0]                                        # [L, C]
    v = v_ref[0]                                        # [L, C]
    keep = keep_ref[0]                                  # [1, L]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [T, L] f32 accum
    logits = jnp.where(keep > 0, logits, NEG)
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits)
    attn = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
    out_ref[0] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def memory_read_fused(query_map, key, value, pad_mask,
                      interpret: bool = False):
    """Fused equivalent of :func:`t2igan.ops.attention.memory_read` without
    the attention-map output.

    Args:
      query_map: [B, H, W, C]; key/value: [B, L, C];
      pad_mask: [B, L] bool (True = padding) or None.
    Returns: [B, H, W, C] read-out.
    """
    return _forward(query_map, key, value, pad_mask, interpret)


def _forward(query_map, key, value, pad_mask, interpret):
    b, h, w, c = query_map.shape
    l = key.shape[1]
    hw = h * w
    tile = min(512, hw)
    # pad pixels to a tile multiple and slots to a sublane multiple
    hwp = _round_up(hw, tile)
    lp = _round_up(l, 8)

    # keep the model dtype (bf16 on the inference path): the matmuls
    # accumulate in f32 via preferred_element_type, softmax runs in f32
    dtype = query_map.dtype
    q = query_map.reshape(b, hw, c)
    q = jnp.pad(q, ((0, 0), (0, hwp - hw), (0, 0)))
    k = jnp.pad(key.astype(dtype), ((0, 0), (0, lp - l), (0, 0)))
    v = jnp.pad(value.astype(dtype), ((0, 0), (0, lp - l), (0, 0)))
    if pad_mask is None:
        keep = jnp.ones((b, l), jnp.float32)
    else:
        keep = 1.0 - pad_mask.astype(jnp.float32)
    keep = jnp.pad(keep, ((0, 0), (0, lp - l)))[:, None, :]   # [B, 1, L]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, hwp, c), dtype),
        grid=(b, hwp // tile),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hwp * lp * c,
            bytes_accessed=(2 * b * hwp * c + 2 * b * lp * c) * 4,
            transcendentals=b * hwp * lp),
        interpret=interpret,
    )(q, k, v, keep)
    return out[:, :hw].reshape(b, h, w, c)


def _fwd(query_map, key, value, pad_mask, interpret):
    out = _forward(query_map, key, value, pad_mask, interpret)
    return out, (query_map, key, value, pad_mask)


def _bwd(interpret, residuals, g):
    from t2igan.ops.attention import memory_read

    query_map, key, value, pad_mask = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: memory_read(q, k, v, pad_mask)[0],
        query_map, key, value)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


memory_read_fused.defvjp(_fwd, _bwd)
