"""Fused eval-mode refinement-stage tail (Pallas/TPU): R_NUM residual
blocks + 2x upsample-conv + GLU (+ optionally the RGB head) in ONE pass
over a resident spatial tile.

Parity target: the tail of ``NEXT_STAGE_G`` (reference model.py:465-469
ResBlocks + :104-110 upBlock) and ``GET_IMAGE_G`` (model.py:536-547).

Why: the round-2 device trace (docs/PERFORMANCE.md) put ~half the gen+eval
step in convert-carrying conv epilogues — every conv in the 128^2 chain
round-trips a [B, 128, 128, C] activation through HBM, and the binding
resource is HBM bandwidth, not MXU issue rate (29% MFU).  This kernel keeps
one spatial row-band resident in VMEM across the whole chain:

    x ──(conv3x3→2C · bn-affine · GLU · conv3x3→C · bn-affine · +x) × R
      ──(nearest-2x upsample+conv3x3→C as 4 subpixel phases · bn-affine
         · GLU)──[· conv3x3→3 · tanh]

Each program owns ``t`` low-resolution output rows and brings the input
with a halo of P = 2R+1 rows/cols (each conv3x3 eats one ring; the
subpixel up-conv eats the last) — or P = 2R+2 when the RGB head is fused,
whose 3x3 conv needs one extra high-res ring.  All convs are shifted-tap
[rows*cols, C] x [C, F] matmuls with f32 accumulation; intermediate
activations never exist in HBM.  For the FINAL generator stage the
feature output can be dropped entirely (``want_h=False``): the 256^2
feature map's only consumer is the RGB head, so fusing it saves the
[B, 256, 256, C/2] write+read as well.

Eval-only by design: train-mode BatchNorm needs batch statistics of each
full pre-GLU conv output, so the training path keeps the XLA form (see
``t2igan/models/generator.py``).  No VJP — callers never differentiate
through eval-mode sampling.

Lessons applied from ops/pallas/upconv.py: single-buffered revisited image
block (one fetch per batch image), constant-index weight blocks, chunk
matmuls >= ~2048 rows, (8, 128)-aligned or full-dim block shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t2igan.ops.pallas.upconv import _phase_kernels

Array = jnp.ndarray


def _row_chunk(h: int, w: int) -> int:
    """Low-res output rows per program: target ~2048 matmul rows."""
    t = max(1, min(h, 2048 // max(w, 1)))
    while h % t:
        t -= 1
    return t


def _conv3(h: Array, kern_ref, c_out: int) -> Array:
    """Valid 3x3 conv of a resident tile as 9 shifted matmuls.

    h: [rows, cols, C] values; kern_ref: [3, 3, C, c_out] ref (or array).
    Returns [rows-2, cols-2, c_out] in f32.

    The dots stay 3-D (contract the channel dim directly): merging
    (rows, cols) into one matmul dim is NOT a layout no-op when cols is
    not sublane-aligned, so a 2-D reshape would materialize a relayout
    copy of the tile per tap — 9 extra buffers that blew the scoped-VMEM
    budget on the first on-chip run.
    """
    rows, cols, c_in = h.shape
    r, cw = rows - 2, cols - 2
    acc = jnp.zeros((r, cw, c_out), jnp.float32)
    for u in range(3):
        for v in range(3):
            acc = acc + jax.lax.dot_general(
                h[u:u + r, v:v + cw, :], kern_ref[u, v],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _glu_f32(y: Array) -> Array:
    c = y.shape[-1] // 2
    return y[..., :c] * jax.nn.sigmoid(y[..., c:])


def _mask_outside(v: Array, g_row, g_col, h_img: int, w_img: int) -> Array:
    """Zero positions whose global coordinates fall outside the image.

    The chain pads the INPUT once and runs valid convs, but the reference
    zero-pads EVERY conv at the image boundary; bn shifts/GLU make
    out-of-image halo values nonzero after each affine, so they must be
    re-zeroed before feeding the next conv.  v: [rows, cols, C];
    ``g_row``/``g_col``: global coordinate of v[0, 0] (may be traced).
    """
    rows, cols = v.shape[0], v.shape[1]
    gi = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + g_row
    gj = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + g_col
    valid = (gi >= 0) & (gi < h_img) & (gj >= 0) & (gj < w_img)
    # Multiply by an f32 mask rather than where(bool[..., None], ...):
    # Mosaic only supports non-no-op minor-dim insertion for 32-bit types,
    # so the broadcastee must be f32 (and so must v — callers pass the f32
    # accumulator stage, never a 16-bit tensor).
    assert v.dtype == jnp.float32, v.dtype
    return v * valid.astype(jnp.float32)[..., None]


def _make_kernel(t: int, h: int, w: int, c: int, n_res: int,
                 want_h: bool, with_rgb: bool, dtype):
    """Kernel body for one (batch, row-chunk) program.

    Ref layout (in order): x_ref [1, H+2P, W+2P, C], then per residual
    block (k1 [3,3,C,2C], aff1 [2,2C], k2 [3,3,C,C], aff2 [2,C]), then
    up phases [4,2,2,C,C] + aff_up [2,C], then optionally rgb kernel
    [3,3,C//2,3]; outputs: optionally h_out [1,2t,2w,C//2], optionally
    rgb_out [1,2t,2w,3].
    """
    p = 2 * n_res + (2 if with_rgb else 1)
    ch = c // 2

    def kernel(*refs):
        x_ref = refs[0]
        widx = 1
        j = pl.program_id(1)
        r0 = j * t

        hcur = x_ref[0, pl.ds(r0, t + 2 * p), :, :]  # [t+2P, W+2P, C]
        g = r0 - p  # global low-res row of hcur[0]; col is -p (static)
        gc = -p
        for _ in range(n_res):
            k1, aff1, k2, aff2 = refs[widx:widx + 4]
            widx += 4
            s1 = aff1[0].astype(jnp.float32)
            b1 = aff1[1].astype(jnp.float32)
            s2 = aff2[0].astype(jnp.float32)
            b2 = aff2[1].astype(jnp.float32)
            y = _conv3(hcur, k1, 2 * c) * s1 + b1
            y = _mask_outside(_glu_f32(y), g + 1, gc + 1, h, w).astype(dtype)
            z = _conv3(y, k2, c) * s2 + b2
            hcur = hcur[2:-2, 2:-2, :].astype(jnp.float32) + z
            g, gc = g + 2, gc + 2
            hcur = _mask_outside(hcur, g, gc, h, w).astype(dtype)
        # hcur: [t+2q, w+2q, C], q = 1 (no rgb) or 2 (rgb)
        up_ref, aff_up = refs[widx], refs[widx + 1]
        widx += 2
        s_up = aff_up[0].astype(jnp.float32)
        b_up = aff_up[1].astype(jnp.float32)
        q = 2 if with_rgb else 1
        tq, wq = t + 2 * (q - 1), w + 2 * (q - 1)
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                acc = jnp.zeros((tq, wq, c), jnp.float32)
                for pp in (0, 1):
                    for qq in (0, 1):
                        acc = acc + jax.lax.dot_general(
                            hcur[a + pp:a + pp + tq, b + qq:b + qq + wq, :],
                            up_ref[2 * a + b, pp, qq],
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                y = acc * s_up + b_up
                phases.append(_glu_f32(y))
        y = jnp.stack(phases)                     # [4, tq, wq, Ch] f32
        y = y.reshape(2, 2, tq, wq, ch)
        y = y.transpose(2, 0, 3, 1, 4)            # [tq, 2, wq, 2, Ch]
        up = y.reshape(2 * tq, 2 * wq, ch)        # halo 2(q-1) hi-res

        out_idx = widx + (1 if with_rgb else 0)
        if want_h:
            if with_rgb:
                refs[out_idx][0] = up[2:-2, 2:-2, :].astype(dtype)
            else:
                refs[out_idx][0] = up.astype(dtype)
            out_idx += 1
        if with_rgb:
            rgb_ref = refs[widx]
            # up's halo ring can fall outside the image, where the RGB
            # conv's zero padding must see zeros.
            ri = _mask_outside(up[1:-1, 1:-1, :], 2 * r0 - 1, -1,
                               2 * h, 2 * w).astype(dtype)
            rgb = _conv3(ri, rgb_ref, 3)
            refs[out_idx][0] = jnp.tanh(rgb).astype(dtype)

    return kernel, p


def resblock_chain_up_fused(
        x: Array,
        rb_params: Sequence[Tuple[Array, Array, Array, Array, Array, Array]],
        up_kernel: Array, up_scale: Array, up_shift: Array,
        rgb_kernel: Optional[Array] = None,
        want_h: bool = True,
        row_chunk: Optional[int] = None,
        interpret: bool = False):
    """Fused eval tail of a refinement stage.

    Args:
      x: [B, H, W, C] post-response-gate features (C = 2*ngf).
      rb_params: per ResBlock ``(k1 [3,3,C,2C], scale1 [2C], shift1 [2C],
        k2 [3,3,C,C], scale2 [C], shift2 [C])`` with the eval-mode
        BatchNorm folded into (scale, shift).
      up_kernel: [3, 3, C, C] UpBlock conv kernel (GLU halves C on output).
      up_scale/up_shift: [C] folded UpBlock BatchNorm affine.
      rgb_kernel: optional [3, 3, C//2, 3] RGB head kernel — fused when
        given.
      want_h: return the [B, 2H, 2W, C//2] feature map (set False on the
        final stage, where only the RGB image is consumed).

    Returns ``h2x``, ``(h2x, rgb)`` or ``rgb`` depending on flags, with
    ``rgb`` in [-1, 1] after tanh.
    """
    if not want_h and rgb_kernel is None:
        raise ValueError("nothing to compute: want_h=False and no rgb head")
    b, h, w, c = x.shape
    n_res = len(rb_params)
    t = row_chunk if row_chunk is not None else _row_chunk(h, w)
    assert h % t == 0, f"row_chunk {t} must divide H={h}"
    dtype = x.dtype
    with_rgb = rgb_kernel is not None
    kernel, p = _make_kernel(t, h, w, c, n_res, want_h, with_rgb, dtype)

    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    const = lambda *shape: pl.BlockSpec(           # noqa: E731
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM,
        pipeline_mode=pl.Buffered(1))

    operands: List[Array] = [xp]
    in_specs = [
        # single-buffered revisited image block: fetched once per batch
        # image, shared by every row-chunk program of that image.
        pl.BlockSpec((1, h + 2 * p, w + 2 * p, c), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM, pipeline_mode=pl.Buffered(1)),
    ]
    flops = 0
    for (k1, s1, b1, k2, s2, b2) in rb_params:
        operands += [k1.astype(dtype), jnp.stack([s1, b1]).astype(jnp.float32),
                     k2.astype(dtype), jnp.stack([s2, b2]).astype(jnp.float32)]
        in_specs += [const(3, 3, c, 2 * c), const(2, 2 * c),
                     const(3, 3, c, c), const(2, c)]
        flops += 2 * b * h * w * 9 * (c * 2 * c + c * c)
    operands += [_phase_kernels(up_kernel).astype(dtype),
                 jnp.stack([up_scale, up_shift]).astype(jnp.float32)]
    in_specs += [const(4, 2, 2, c, c), const(2, c)]
    flops += 2 * b * h * w * 16 * c * c
    if with_rgb:
        operands.append(rgb_kernel.astype(dtype))
        in_specs.append(const(3, 3, c // 2, 3))
        flops += 2 * b * 4 * h * w * 9 * (c // 2) * 3

    out_shapes, out_specs = [], []
    if want_h:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c // 2), dtype))
        out_specs.append(pl.BlockSpec((1, 2 * t, 2 * w, c // 2),
                                      lambda i, j: (i, j, 0, 0),
                                      memory_space=pltpu.VMEM))
    if with_rgb:
        out_shapes.append(jax.ShapeDtypeStruct((b, 2 * h, 2 * w, 3), dtype))
        out_specs.append(pl.BlockSpec((1, 2 * t, 2 * w, 3),
                                      lambda i, j: (i, j, 0, 0),
                                      memory_space=pltpu.VMEM))

    bytes_est = 2 * (b * h * w * c + b * 4 * h * w * (c // 2)
                     + n_res * 9 * 3 * c * c + 16 * c * c)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(b, h // t),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_est,
            transcendentals=b * 4 * h * w * c),
        # The chain keeps several row-band intermediates live at once; the
        # default 16 MB scoped-VMEM budget is too tight (first on-chip run
        # OOMed at 25.2 MB).  v5e has 128 MB of physical VMEM per core —
        # raise the cap and leave headroom for the pipelined input block.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if want_h and with_rgb:
        return out[0], out[1]
    return out[0]


def resblock_chain_up_reference(
        x: Array, rb_params, up_kernel: Array, up_scale: Array,
        up_shift: Array, rgb_kernel: Optional[Array] = None,
        want_h: bool = True):
    """XLA reference of the fused tail (same folded-weight math) — the
    ``platform_dependent`` fallback on non-TPU platforms and the test
    oracle for the kernel."""
    from t2igan.ops.image import upsample_nearest_2x

    dn = ("NHWC", "HWIO", "NHWC")
    dtype = x.dtype
    h = x
    for (k1, s1, b1, k2, s2, b2) in rb_params:
        y = jax.lax.conv_general_dilated(
            h, k1.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        y = y.astype(jnp.float32) * s1 + b1
        y = _glu_f32(y).astype(dtype)
        z = jax.lax.conv_general_dilated(
            y, k2.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        z = z.astype(jnp.float32) * s2 + b2
        h = (h.astype(jnp.float32) + z).astype(dtype)
    y = jax.lax.conv_general_dilated(
        upsample_nearest_2x(h), up_kernel.astype(dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn)
    y = y.astype(jnp.float32) * up_scale + up_shift
    up = _glu_f32(y).astype(dtype)
    if rgb_kernel is None:
        return up
    rgb = jax.lax.conv_general_dilated(
        up, rgb_kernel.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn)
    rgb = jnp.tanh(rgb.astype(jnp.float32)).astype(dtype)
    if want_h:
        return up, rgb
    return rgb
