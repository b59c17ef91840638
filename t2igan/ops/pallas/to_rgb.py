"""Fused GetImageG kernel (Pallas/TPU): conv3x3(C -> 3) + tanh.

The generator's RGB head (model.py:536-547) is the worst-utilized op in the
whole inference graph: a 3-channel-output conv at 256^2 runs at ~1% MFU
through XLA (6.8 ms/batch at batch 128 bf16, tools/microbench_gen.py) —
the N=3 output dimension wastes 125/128 of every MXU tile.

This kernel flips the matmul to channels-major: P = Kpack @ X^T with
Kpack [27, C] (27 = 9 taps x 3 RGB outputs) and X the flattened pixel tile,
so the padding falls on the 27 -> 32 sublane axis instead of the 3 -> 128
lane axis (~16% waste instead of ~4200%).  The 9 tap planes are then
combined with cheap shifted adds over the pixel grid and tanh'd, all in
VMEM.  STATUS (round 3): OFF by default and now SUPERSEDED on the default
eval path — the RGB head fuses into the final refinement stage's tail
kernel (ops/pallas/reschain.py, ``rgb_kernel=``), where the 256^2 feature
map never reaches HBM at all, making a standalone RGB kernel moot there.
This kernel remains an opt-in (``T2IGAN_RGB_KERNEL=1``) for the
intermediate-scale heads, gated in models/generator.py to 128-lane-aligned
C: Mosaic requires the manual HBM->VMEM DMA slice to be tile-aligned in
BOTH minor dims — rows to 8 (handled by host padding) AND lanes to 128,
which for C=64 inputs would force a host-side channel pad that doubles the
input traffic.  (The pack-two-pixels-per-row variant that would fix C=64
alignment is documented but not built — the reschain path made it
redundant.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(t: int, h: int, w: int, c: int):
    """x_ref: [1, H+2, W+2, C] zero-padded image (single-buffered, revisited
    across row chunks); k_ref: [32, C] packed taps (rows 3*(3*dy+dx)+rgb);
    out_ref: [1, T, W, 3]."""

    # DMA slices need the sublane (row-pixel) dim 8-aligned, and Mosaic
    # unflattens the 3-D dot result from [32, (T+2)*Wp] with a 128-aligned
    # lane dim — so the host pads columns to W8 and the kernel pads on to
    # Wp before the dot.
    w8 = _round_up(w + 2, 8)
    wp = _round_up(w8, 128)

    def kernel(x_hbm, k_ref, out_ref, xs_ref, sem):
        # The padded input image stays in HBM (whole-image VMEM residency
        # does not fit at 256^2); each program DMAs its (T+2)-row slice.
        # x_hbm is [B*(H+2), W+2, C] (batch flattened into rows host-side)
        # so the slice is a single leading-dim pl.ds.
        b_idx = pl.program_id(0)
        r0 = b_idx * (h + 2) + pl.program_id(1) * t
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(r0, t + 2)], xs_ref, sem)
        dma.start()
        dma.wait()
        xs = jnp.pad(xs_ref[:], ((0, 0), (0, wp - w8), (0, 0)))
        p = jax.lax.dot_general(
            k_ref[:], xs, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32)          # [32, T+2, Wp]
        acc = jnp.zeros((3, t, w), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = 3 * (3 * dy + dx)
                acc = acc + p[tap:tap + 3, dy:dy + t, dx:dx + w]
        # NCHW out block — minor dims stay the pixel grid (lane-friendly);
        # the caller transposes the small [B, 3, H, W] result back to NHWC.
        out_ref[0] = jnp.tanh(acc).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def to_rgb_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """``tanh(conv3x3(x, kernel, padding=1))`` with a 3-channel output.

    Args: x: [B, H, W, C]; kernel: [3, 3, C, 3].
    Returns: [B, H, W, 3] in [-1, 1].  Differentiable: the backward
    recomputes through the XLA composition (the fused forward keeps the
    training graph numerics identical while the gradient path stays the
    well-tested conv vjp).
    """
    return _forward(x, kernel, interpret)


def _naive(x, kernel):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y)


def _fwd(x, kernel, interpret):
    return _forward(x, kernel, interpret), (x, kernel)


def _bwd(interpret, residuals, g):
    x, kernel = residuals
    _, vjp = jax.vjp(_naive, x, kernel)
    return vjp(g)


to_rgb_fused.defvjp(_fwd, _bwd)


def _forward(x: jnp.ndarray, kernel: jnp.ndarray,
             interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    t = max(1, min(h, 2048 // max(w, 1)))
    while h % t:
        t -= 1

    w8 = _round_up(w + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w8 - w - 1), (0, 0)))
    xp = xp.reshape(b * (h + 2), w8, c)
    kp = kernel.astype(x.dtype).transpose(0, 1, 3, 2).reshape(27, c)
    kp = jnp.pad(kp, ((0, 5), (0, 0)))                   # sublane pad to 32

    nchw = pl.pallas_call(
        _make_kernel(t, h, w, c),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), x.dtype),
        grid=(b, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((32, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, 3, t, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t + 2, w8, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 32 * c,
            bytes_accessed=2 * b * h * w * c + b * h * w * 3 * 2,
            transcendentals=b * h * w * 3),
        interpret=interpret,
    )(xp, kp)
    return nchw.transpose(0, 2, 3, 1)
