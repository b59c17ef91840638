"""Fused eval-mode UpBlock kernel (Pallas/TPU): nearest-2x upsample +
conv3x3 + BatchNorm(running stats) + GLU in one pass.

The generator's UpBlocks (model.py:104-110) dominate inference time: the
128^2 -> 256^2 stage-3 conv alone runs at ~19% MFU through XLA (naive
26.7 ms/batch at batch 128 bf16, tools/microbench_gen.py), and the
algebraic rewrites land between slower (explicit subpixel: odd conv shapes)
and compile-hostile (input-dilated conv: the conv algorithm search through
the axon relay takes tens of minutes at full model size).

This kernel computes the subpixel decomposition by hand instead: nearest-2x
duplicates each input pixel into a 2x2 block, so each output phase
(a, b) = (row parity, col parity) is an independent 2x2 convolution of the
LOW-res input with summed kernel taps — four [T*W, C] x [C, F] matmul
chains that stay in VMEM, at 16/36 of the naive FLOPs, with the BatchNorm
affine (folded from running stats) and the GLU gate applied before anything
returns to HBM.  The upsampled tensor and the pre-activation conv output
never exist in memory.

Eval-only by design: train-mode BatchNorm needs batch statistics of the
full pre-GLU conv output, so the training path keeps the XLA form (see
``t2igan/models/generator.py::UpBlock``).  No VJP is defined — the callers
never differentiate through eval-mode sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tap sets of the subpixel decomposition: output row 2i+a reads low-res
# rows (i-1+a+p) for p in {0, 1}, i.e. padded rows (i+a+p), with weights
# row a=0: [K0, K1+K2], row a=1: [K0+K1, K2] (same for columns).
_PHASE_TAPS = (((0,), (1, 2)), ((0, 1), (2,)))


def _phase_kernels(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, F] conv kernel -> [4(phase), 2, 2, C, F] summed-tap
    kernels, phase index = 2*a + b."""
    out = []
    for a in (0, 1):
        for b in (0, 1):
            rows = []
            for us in _PHASE_TAPS[a]:
                row = [sum(kernel[u, v] for u in us for v in vs)
                       for vs in _PHASE_TAPS[b]]
                rows.append(jnp.stack(row))
            out.append(jnp.stack(rows))
    return jnp.stack(out)  # [4, 2, 2, C, F]


def _make_kernel(t: int, h: int, w: int, c: int, f: int):
    """Kernel body for one (batch, row-chunk) program.

    x_ref:     [1, H+2, W+2, C]  zero-padded input image (revisited block —
                                 fetched once per batch image)
    w_ref:     [4, 2, 2, C, F]   phase kernels
    aff_ref:   [2, F]            folded BN (scale; shift)
    out_ref:   [1, 2T, 2W, F//2] post-GLU output chunk
    """
    fh = f // 2

    def kernel(x_ref, w_ref, aff_ref, out_ref):
        i = pl.program_id(1)
        r0 = i * t  # first low-res output row of this chunk
        scale = aff_ref[0].astype(jnp.float32)
        shift = aff_ref[1].astype(jnp.float32)
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                acc = jnp.zeros((t * w, f), jnp.float32)
                for p in (0, 1):
                    for q in (0, 1):
                        xs = x_ref[0, pl.ds(r0 + a + p, t),
                                   pl.ds(b + q, w), :]
                        acc = acc + jax.lax.dot_general(
                            xs.reshape(t * w, c),
                            w_ref[2 * a + b, p, q],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                y = acc * scale + shift
                g = y[:, :fh] * jax.nn.sigmoid(y[:, fh:])
                phases.append(g.reshape(t, w, fh).astype(out_ref.dtype))
        # out[2i+a, 2j+b] = phase(a,b)[i, j]
        y = jnp.stack(phases)                       # [4, T, W, Fh]
        y = y.reshape(2, 2, t, w, fh)
        y = y.transpose(2, 0, 3, 1, 4)              # [T, 2, W, 2, Fh]
        out_ref[0] = y.reshape(2 * t, 2 * w, fh)

    return kernel


def _row_chunk(h: int, w: int) -> int:
    """Low-res rows per program: target ~1024 matmul rows, divide H.  Kept
    modest — per-chunk intermediates live in the same ~16 MB scoped VMEM as
    the single-buffered image block."""
    t = max(1, min(h, 1024 // max(w, 1)))
    while h % t:
        t -= 1
    return t


def upconv_bn_glu_fused(x: jnp.ndarray, kernel: jnp.ndarray,
                        scale: jnp.ndarray, shift: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """glu(bn_affine(conv3x3(nearest_up2(x), kernel))) in one Pallas pass.

    Args:
      x: [B, H, W, C]; kernel: [3, 3, C, F] (F even; GLU halves it);
      scale/shift: [F] folded eval-mode BatchNorm affine.
    Returns: [B, 2H, 2W, F//2].
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    t = _row_chunk(h, w)
    dtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wp = _phase_kernels(kernel).astype(dtype)
    aff = jnp.stack([scale, shift]).astype(jnp.float32)

    return pl.pallas_call(
        _make_kernel(t, h, w, c, f),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, f // 2), dtype),
        grid=(b, h // t),
        in_specs=[
            # single-buffered: the image block is revisited by every row
            # chunk (it only changes when the batch index advances), and a
            # second buffer would blow the ~16 MB scoped-VMEM limit at the
            # 128^2 stage.
            pl.BlockSpec((1, h + 2, w + 2, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((4, 2, 2, c, f), lambda i, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((2, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, 2 * t, 2 * w, f // 2),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 16 * c * f,
            bytes_accessed=2 * (b * h * w * c + b * 2 * h * 2 * w * f // 2
                                + 16 * c * f),
            transcendentals=b * 4 * h * w * f // 2),
        interpret=interpret,
    )(xp, wp, aff)
