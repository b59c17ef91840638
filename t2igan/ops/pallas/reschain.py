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

Lessons applied from the retired fused-upconv kernel: single-buffered revisited image
block (one fetch per batch image), constant-index weight blocks, chunk
matmuls >= ~2048 rows, (8, 128)-aligned or full-dim block shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Tap sets of the subpixel decomposition of conv3x3-over-nearest-2x: output
# row 2i+a reads low-res rows (i-1+a+p) for p in {0, 1}, i.e. padded rows
# (i+a+p), with weights row a=0: [K0, K1+K2], row a=1: [K0+K1, K2] (same for
# columns).  (Moved here from the retired ops/pallas/upconv.py when the
# standalone fused-upconv kernels measured as losses on chip — see
# docs/PERFORMANCE.md rounds 2-4.)
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


def _round_up16(x: int) -> int:
    """Pad to a multiple of 16: makes (rows, cols) -> rows*cols flattening
    a layout no-op for both bf16 (16-sublane tiles) and f32."""
    return ((x + 15) // 16) * 16


def _row_chunk(h: int, w: int) -> int:
    """Low-res output rows per program: target ~2048 matmul rows."""
    t = max(1, min(h, 2048 // max(w, 1)))
    while h % t:
        t -= 1
    return t


def _conv3_flat(h: Array, kern_ref, c_out: int) -> Array:
    """Valid-row / full-width 3x3 conv of a resident tile as 9 BIG 2-D
    matmuls (v3 structure, after two failed schedules on chip).

    h: [rows, cols0, C] with cols0 a multiple of 16 (host-padded), so the
    (rows, cols0) -> rows*cols0 flatten is a layout NO-OP for bf16/f32.
    Column taps then become flat sublane offsets: tap (u, v) of output
    position (i, j) is flat row (i+u)*cols0 + (j+v) — one offset slice
    feeding one [rows*cols0, C] x [C, F] matmul per tap, the shape the
    MXU actually likes (the v1 3-D dots lowered as per-row small matmuls:
    12.7% MFU; the v2 concat/roll forms hit Mosaic not-implementeds —
    offset-mismatched concat, non-32-bit rotate).

    The width never shrinks: output columns at the tile edge wrap across
    rows and contain garbage, but they live in the out-of-image halo that
    the caller's mask re-zeroes after every stage anyway.
    Returns [rows-2, cols0, c_out] in f32.
    """
    rows, cols0, c_in = h.shape
    r = rows - 2
    # +2 zero tail: the farthest tap's slice ends 2 elements past the
    # exact flat length (those positions are wrap garbage, masked later).
    hf = jnp.concatenate(
        [h.reshape(rows * cols0, c_in), jnp.zeros((2, c_in), h.dtype)])
    # v4 (probe-driven): the on-chip cost was NOT the matmuls or the
    # unaligned tap offsets but the f32 accumulator round-trips of
    # ``acc = acc + dot`` — 9 full [r*cols0, F] materializations per conv.
    # Concatenate the three ROW taps into one 3C-wide operand (their flat
    # offsets u*cols0 are 16-aligned, so Mosaic accepts the concat; the
    # COLUMN taps stay as offsets) -> 3 dots with 3x the contraction depth
    # and a third of the accumulator traffic.
    zu = jnp.concatenate(
        [hf[u * cols0:u * cols0 + r * cols0 + 2] for u in range(3)],
        axis=-1)                                     # [r*cols0+2, 3C]
    acc = jnp.zeros((r * cols0, c_out), jnp.float32)
    for v in range(3):
        kv = kern_ref[:, v].reshape(3 * c_in, c_out)
        acc = acc + jax.lax.dot_general(
            zu[v:v + r * cols0], kv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.reshape(r, cols0, c_out)


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
    import os

    if os.environ.get("T2IGAN_RESCHAIN_PROBE") == "nomask":
        return v  # PERF PROBE: wrong at borders, isolates masking cost
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

    q = 2 if with_rgb else 1
    wp = _round_up16(w + 2 * p)  # constant tile width through the chain

    def kernel(*refs):
        x_ref = refs[0]
        widx = 1
        j = pl.program_id(1)
        r0 = j * t

        hcur = x_ref[0, pl.ds(r0, t + 2 * p), :, :]  # [t+2P, Wp, C]
        g = r0 - p   # global low-res row of hcur[0]
        gc = -p      # global low-res col of tile col 0; DRIFTS +1 per conv
        #            (constant-width convs re-center at (i+1, j+1))
        for _ in range(n_res):
            k1, aff1, k2, aff2 = refs[widx:widx + 4]
            widx += 4
            s1 = aff1[0].astype(jnp.float32)
            b1 = aff1[1].astype(jnp.float32)
            s2 = aff2[0].astype(jnp.float32)
            b2 = aff2[1].astype(jnp.float32)
            rows = hcur.shape[0]
            hf_in = hcur.reshape(rows * wp, c)
            y = _conv3_flat(hcur, k1, 2 * c) * s1 + b1
            # the mask kills bn-shifted halo values AND the edge-column
            # wrap garbage of the full-width conv
            y = _mask_outside(_glu_f32(y), g + 1, gc + 1, h, w).astype(dtype)
            z = _conv3_flat(y, k2, c) * s2 + b2
            # Residual in drifted coordinates: z[i, j] sits at input
            # (i+2, j+2), so add the flat-offset slice of the original
            # tile (wrap garbage falls in masked halo columns).
            start = 2 * wp + 2
            res = hf_in[start:start + (rows - 4) * wp].astype(jnp.float32)
            hcur = res.reshape(rows - 4, wp, c) + z.reshape(rows - 4, wp, c)
            g, gc = g + 2, gc + 2
            hcur = _mask_outside(hcur, g, gc, h, w).astype(dtype)
        # hcur: [t+2q', Wp, C] with col 0 at global -q' (q' = p - 2R)
        up_ref, aff_up = refs[widx], refs[widx + 1]
        widx += 2
        s_up = aff_up[0].astype(jnp.float32)
        b_up = aff_up[1].astype(jnp.float32)
        tq = t + 2 * (q - 1)
        hf = jnp.concatenate(
            [hcur.reshape(hcur.shape[0] * wp, c), jnp.zeros((2, c), dtype)])
        # row-parity taps pre-concatenated (aligned offsets, see
        # _conv3_flat): 2 dots per phase instead of 4.
        za = [jnp.concatenate(
                  [hf[(a + pp) * wp:(a + pp) * wp + tq * wp + 2]
                   for pp in (0, 1)], axis=-1)
              for a in (0, 1)]                       # [tq*wp+2, 2C] x2
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                acc = jnp.zeros((tq * wp, c), jnp.float32)
                for qq in (0, 1):
                    kq = up_ref[2 * a + b, :, qq].reshape(2 * c, c)
                    acc = acc + jax.lax.dot_general(
                        za[a][b + qq:b + qq + tq * wp], kq,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                y = acc.reshape(tq, wp, c) * s_up + b_up
                phases.append(_glu_f32(y))
        y = jnp.stack(phases)                     # [4, tq, Wp, Ch] f32
        y = y.reshape(2, 2, tq, wp, ch)
        y = y.transpose(2, 0, 3, 1, 4)            # [tq, 2, Wp, 2, Ch]
        up = y.reshape(2 * tq, 2 * wp, ch)        # hi-res; col 0 = -2(q-1)

        out_idx = widx + (1 if with_rgb else 0)
        if want_h:
            r0h = 2 * (q - 1)                     # crop to [2r0, 2r0+2t)
            refs[out_idx][0] = up[r0h:r0h + 2 * t,
                                  r0h:r0h + 2 * w, :].astype(dtype)
            out_idx += 1
        if with_rgb:
            rgb_ref = refs[widx]
            # up's halo (outside the image) is nonzero after the affine +
            # GLU — the RGB conv's zero padding must see zeros there, and
            # the full-width conv's wrap garbage dies with the same mask.
            up_m = _mask_outside(up, 2 * (r0 - (q - 1)), -2 * (q - 1),
                                 2 * h, 2 * w).astype(dtype)
            rgb = _conv3_flat(up_m[1:1 + 2 * t + 2, :, :], rgb_ref, 3)
            refs[out_idx][0] = jnp.tanh(
                rgb[:, 1:1 + 2 * w, :]).astype(dtype)

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

    # Tile width is CONSTANT through the chain and padded to a multiple of
    # 16 so every (rows, cols) flatten is a layout no-op (see _conv3_flat).
    wp = _round_up16(w + 2 * p)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, wp - w - p), (0, 0)))
    const = lambda *shape: pl.BlockSpec(           # noqa: E731
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM,
        pipeline_mode=pl.Buffered(1))

    operands: List[Array] = [xp]
    in_specs = [
        # single-buffered revisited image block: fetched once per batch
        # image, shared by every row-chunk program of that image.
        pl.BlockSpec((1, h + 2 * p, wp, c), lambda i, j: (i, 0, 0, 0),
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
