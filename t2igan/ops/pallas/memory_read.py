"""Fused gated-memory read kernel (Pallas/TPU).

The DM-GAN memory READ (model.py:406-452) attends every generator pixel over
the word memory slots.  At the 128x128 stage with 77 slots the XLA path
materializes a [B, 16384, 77] attention tensor in HBM twice (softmax input
and output) — ~320 MB of traffic per forward at batch 64, pure bandwidth
waste since the attention is consumed immediately by the value readout.

This kernel tiles the pixels: each grid program holds a [T, C] query tile
plus the full [L, C] key/value (a few KB) in VMEM, computes logits, masked
softmax and the readout without the attention ever leaving the chip.

Used on both the inference AND the training path (``return_attn=False``):
the ``custom_vjp`` pairs this forward with the flash-style Pallas backward
below, which re-computes the attention per pixel tile and accumulates
dQ/dK/dV in f32 VMEM scratch.  Honest device-trace-span verdicts (queue
R4m, docs/PERFORMANCE.md round 4): **+19% on the full eval graph** and
**+6.9% on the adversarial train step** (83.11 vs 88.88 ms/step b16 bf16
against the einsum form) — the round-1 "131.6 → 288.9 steps/sec" claim
was wall-fence fiction and is retracted.  Only the visualization path
(``return_attn=True``) still takes the jnp route, since it needs the
explicit maps.
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


def _bwd_kernel(q_ref, k_ref, v_ref, keep_ref, dout_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    """Flash-style backward: recompute the tile's attention, then

        dv += attn^T dout;  ds = attn * (dout v^T - rowsum);  dq = ds k;
        dk += ds^T q

    dk/dv accumulate in f32 scratch across the pixel-tile grid dimension
    (scratch persists across sequential grid steps on a TensorCore) and are
    written out on the final tile.  No attention tensor ever reaches HBM —
    the jnp VJP would store/rematerialize [B, HW, L] twice.
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    keep = keep_ref[0]
    dout = dout_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    logits = jnp.where(keep > 0, logits, NEG)
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=1, keepdims=True)          # [T, L] f32

    dattn = jax.lax.dot_general(
        dout, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [T, L]
    ds = attn * (dattn - jnp.sum(attn * dattn, axis=1, keepdims=True))

    dq_ref[0] = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    dv_tile = jax.lax.dot_general(
        attn, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [L, C]
    dk_tile = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [L, C]

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dk_acc[...] += dk_tile
    dv_acc[...] += dv_tile

    @pl.when(j == n_j - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _backward(query_map, key, value, pad_mask, dout, interpret):
    b, h, w, c = query_map.shape
    l = key.shape[1]
    hw = h * w
    tile = min(512, hw)
    hwp = _round_up(hw, tile)
    lp = _round_up(l, 8)

    dtype = query_map.dtype
    q = jnp.pad(query_map.reshape(b, hw, c), ((0, 0), (0, hwp - hw), (0, 0)))
    k = jnp.pad(key.astype(dtype), ((0, 0), (0, lp - l), (0, 0)))
    v = jnp.pad(value.astype(dtype), ((0, 0), (0, lp - l), (0, 0)))
    g = jnp.pad(dout.reshape(b, hw, c), ((0, 0), (0, hwp - hw), (0, 0)))
    if pad_mask is None:
        keep = jnp.ones((b, l), jnp.float32)
    else:
        keep = 1.0 - pad_mask.astype(jnp.float32)
    keep = jnp.pad(keep, ((0, 0), (0, lp - l)))[:, None, :]

    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hwp, c), dtype),
            jax.ShapeDtypeStruct((b, lp, c), dtype),
            jax.ShapeDtypeStruct((b, lp, c), dtype),
        ),
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
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((lp, c), jnp.float32),
            pltpu.VMEM((lp, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, keep, g)

    dq = dq[:, :hw].reshape(b, h, w, c).astype(query_map.dtype)
    dk = dk[:, :l].astype(key.dtype)
    dv = dv[:, :l].astype(value.dtype)
    return dq, dk, dv


def _fwd(query_map, key, value, pad_mask, interpret):
    out = _forward(query_map, key, value, pad_mask, interpret)
    return out, (query_map, key, value, pad_mask)


def _bwd(interpret, residuals, g):
    query_map, key, value, pad_mask = residuals
    dq, dk, dv = _backward(query_map, key, value, pad_mask, g, interpret)
    return dq, dk, dv, None


memory_read_fused.defvjp(_fwd, _bwd)
