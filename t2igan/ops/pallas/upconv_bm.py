"""Batch-minor fused eval UpBlock kernel: upsample-conv3x3 + BN + GLU.

WHY A SECOND UPCONV KERNEL.  The round-2/3 device traces
(docs/PERFORMANCE.md, "layout economics") show the stage-3 upsample-conv
(bf16[128,256,256,128]) is the single hottest op of the geneval graph at
21.1 ms in-graph — ~3.5x its ~6 ms HBM+MXU floor — and that XLA lays every
conv activation out BATCH-MINOR (``{0,3,2,1}``: lanes carry the batch).
The existing row-major kernel (ops/pallas/upconv.py) loses to XLA's
input-dilated conv partly because every Pallas custom call forces row-major
operands, so the graph pays 537 MB layout copies at both boundaries.

This kernel instead speaks XLA's native layout: the operand is the
TRANSPOSED view ``[H, W, C, B]`` whose row-major bytes are identical to the
batch-minor ``[B, H, W, C]`` — the boundary ``jnp.transpose`` can then be a
layout bitcast, not a copy (whether XLA elides it is part of the queued
full-graph A/B).  Inside the kernel every pixel is a native ``[C, B]``
tile, and each subpixel-phase tap becomes one stationary-weight matmul

    acc[F, Wc*B] += K_tap[F, C] @ X_row[C, Wc*B]

with N = Wc*128 — the fat-N, K=128 shape the MXU pipelines at full rate
(the row-major kernel's chunked ``[T*W, C] @ [C, F]`` form puts the batch
in M and re-reads the image block per row chunk).  BN (folded running
stats) and GLU run on the f32 accumulator before anything returns to HBM,
so the pre-GLU [B,2H,2W,F] tensor (2.15 GB at the production shape) never
exists — the write is the post-GLU F/2 tensor.

Parity target: model.py:104-110 (upBlock) + :122-136 epilogues, eval mode.
Eval-only (train BN needs batch stats); no VJP — sampling never
differentiates.  Opt in with ``T2IGAN_UPBLOCK=bm`` (models/generator.py);
requires B % 128 == 0 (lanes carry the batch) and C % 8 == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t2igan.ops.pallas.upconv import _phase_kernels


def _pick_chunks(h: int, w: int) -> tuple:
    """(T low-res rows, Wc low-res cols) per program.  Bounded by the
    ~16-24 MB scoped VMEM: input rows (T+2) x [C, (Wc+2)B] bf16 plus one
    f32 [F, Wc*B] accumulator and two staged output row buffers."""
    wc = min(w, 32)
    while w % wc:
        wc -= 1
    t = min(h, 8)
    while h % t:
        t -= 1
    return t, wc


def _make_kernel(t: int, wc: int, h: int, w: int, c: int, f: int, b: int,
                 pipelined: bool):
    """Program = T low-res output row pairs x Wc low-res columns.

    Refs:
      xt_hbm: [H+2, W+2, C, B]   padded transposed input (ANY/HBM)
      w_ref:  [4, 2, 2, F, C]    phase kernels, [F, C] per tap (VMEM)
      aff_ref:[2, F, 1]          folded BN scale;shift (VMEM, f32)
      out_hbm:[2H, W, 2, Fh, B]  output, W split as (j, col parity) (ANY)
      scratch: raw [S, T+2, Wc+2, C, B] (S = 2 if pipelined else 1),
               xts [T+2, C, Wc+2, B], stage [2, Wc, 2, Fh, B],
               sem_in [S] DMA, sem_out [2] DMA

    ``pipelined`` (T2IGAN_BM_PIPE=1): the input block for program i+1 is
    prefetched into the other ``raw`` slot while program i computes
    (scratch persists across the sequential grid steps), and output-row
    DMAs are only waited on before their stage slot is reused — the simple
    form serializes a ~14 us input fetch and ~16 x 2.4 us output waits
    against ~90 us of matmuls per program.
    """
    fh = f // 2
    n = wc * b
    nwc = w // wc
    nprog = (h // t) * nwc

    def fetch(idx, slot, sem_in, xt_hbm, raw):
        ri = (idx // nwc) * t
        cj = (idx % nwc) * wc
        return pltpu.make_async_copy(
            xt_hbm.at[pl.ds(ri, t + 2), pl.ds(cj, wc + 2)],
            raw.at[slot], sem_in.at[slot])

    def kernel(xt_hbm, w_ref, aff_ref, out_hbm, raw, xts, stage,
               sem_in, sem_out):
        gi = pl.program_id(0)
        gj = pl.program_id(1)
        r0 = gi * t
        c0 = gj * wc
        idx = gi * nwc + gj

        if pipelined:
            slot = jax.lax.rem(idx, 2)

            @pl.when(idx == 0)
            def _():
                fetch(idx, slot, sem_in, xt_hbm, raw).start()

            @pl.when(idx < nprog - 1)
            def _():
                fetch(idx + 1, jax.lax.rem(idx + 1, 2), sem_in,
                      xt_hbm, raw).start()

            fetch(idx, slot, sem_in, xt_hbm, raw).wait()
        else:
            slot = 0
            cp = fetch(idx, slot, sem_in, xt_hbm, raw)
            cp.start()
            cp.wait()

        # transpose [Wc+2, C, B] -> [C, Wc+2, B] per row ((T+2)(Wc+2)
        # [C, B] tile stores — VMEM-bandwidth work)
        for rr in range(t + 2):
            for j in range(wc + 2):
                xts[rr, :, j, :] = raw[slot, rr, j]

        scale = aff_ref[0].astype(jnp.float32)          # [F, 1]
        shift = aff_ref[1].astype(jnp.float32)

        def out_copy(rr, a):
            return pltpu.make_async_copy(
                stage.at[a], out_hbm.at[2 * (r0 + rr) + a, pl.ds(c0, wc)],
                sem_out.at[a])

        for rr in range(t):
            for a in (0, 1):
                if pipelined and rr > 0:
                    # the previous DMA out of stage[a] must land before the
                    # slot is overwritten (usually already has)
                    out_copy(rr - 1, a).wait()
                for bcol in (0, 1):
                    acc = jnp.zeros((f, n), jnp.float32)
                    for p in (0, 1):
                        xrow = xts[rr + a + p].reshape(c, (wc + 2) * b)
                        for q in (0, 1):
                            o = (bcol + q) * b
                            acc = acc + jax.lax.dot_general(
                                w_ref[2 * a + bcol, p, q],
                                xrow[:, o:o + n],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    y = acc * scale + shift
                    g = (y[:fh] * jax.nn.sigmoid(y[fh:])).astype(
                        stage.dtype)                     # [Fh, Wc*B]
                    for j in range(wc):
                        stage[a, j, bcol, :, :] = g[:, j * b:(j + 1) * b]
                # one contiguous DMA per output row (both col parities)
                cp = out_copy(rr, a)
                cp.start()
                if not pipelined:
                    cp.wait()
        if pipelined:
            # drain before the next program reuses the stage slots
            out_copy(t - 1, 0).wait()
            out_copy(t - 1, 1).wait()

    return kernel


def upconv_bn_glu_bm(x: jnp.ndarray, kernel: jnp.ndarray,
                     scale: jnp.ndarray, shift: jnp.ndarray,
                     interpret: bool = False,
                     chunks: tuple | None = None,
                     pipelined: bool | None = None) -> jnp.ndarray:
    """glu(bn_affine(conv3x3(nearest_up2(x), kernel))), batch-minor layout.

    Args:
      x: [B, H, W, C]; B should be a multiple of 128 on hardware (the
         lanes carry the batch — models/generator.py gates the dispatch);
      kernel: [3, 3, C, F] (F even; GLU halves it);
      scale/shift: [F] folded eval BatchNorm affine;
      chunks: optional (T, Wc) override for tests;
      pipelined: software-pipeline the input/output DMAs (default: the
        ``T2IGAN_BM_PIPE=1`` env A/B switch).
    Returns: [B, 2H, 2W, F//2].
    """
    import os

    b, h, w, c = x.shape
    f = kernel.shape[-1]
    fh = f // 2
    assert b % 8 == 0 and f % 2 == 0, (b, f)
    t, wc = chunks if chunks is not None else _pick_chunks(h, w)
    assert h % t == 0 and w % wc == 0, (h, w, t, wc)
    if pipelined is None:
        pipelined = os.environ.get("T2IGAN_BM_PIPE", "0") == "1"
    nslots = 2 if pipelined else 1
    dtype = x.dtype

    # batch-minor boundary: bytes of [B,H,W,C]@{0,3,2,1} == row-major
    # [H,W,C,B] — XLA turns the transpose into a layout bitcast when the
    # producer already sits in its preferred batch-minor layout.
    xt = jnp.transpose(x, (1, 2, 3, 0))
    xt = jnp.pad(xt, ((1, 1), (1, 1), (0, 0), (0, 0)))

    # [4, 2, 2, C, F] -> [4, 2, 2, F, C] (stationary LHS of the tap dots)
    wp = jnp.transpose(_phase_kernels(kernel), (0, 1, 2, 4, 3)).astype(dtype)
    aff = jnp.stack([scale, shift]).astype(jnp.float32)[:, :, None]

    grid = (h // t, w // wc)
    out = pl.pallas_call(
        _make_kernel(t, wc, h, w, c, f, b, pipelined),
        out_shape=jax.ShapeDtypeStruct((2 * h, w, 2, fh, b), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 2, 2, f, c), lambda i, j: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
            pl.BlockSpec((2, f, 1), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nslots, t + 2, wc + 2, c, b), dtype),
            pltpu.VMEM((t + 2, c, wc + 2, b), dtype),
            pltpu.VMEM((2, wc, 2, fh, b), dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 16 * c * f,
            bytes_accessed=2 * (b * h * w * c * (t + 2) // t
                                + b * 2 * h * 2 * w * fh),
            transcendentals=b * 4 * h * w * fh),
        interpret=interpret,
    )(xt, wp, aff)

    # [2H, W, 2, Fh, B] -> [2H, 2W, Fh, B] -> [B, 2H, 2W, Fh] (bitcasts)
    out = out.reshape(2 * h, 2 * w, fh, b)
    return jnp.transpose(out, (3, 0, 1, 2))
