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


# ---------------------------------------------------------------------------
# Paired-pixel variant: the C=64 production head (VERDICT r2 #3)
# ---------------------------------------------------------------------------
#
# The docstring's fix idea, built: pack TWO adjacent pixels per 128-lane row
# (C=64 channels each -> lanes [0,64) even pixel, [64,128) odd pixel), so the
# HBM->VMEM DMA is lane-aligned WITHOUT padding channels 64->128.  The packed
# view is a free reshape of the NHWC tensor ([B,H,W,64] -> [B,H,W/2,128]);
# no host-side pad copies at all — the vertical conv halo is fetched by
# per-block row DMAs and the out-of-image edge rows are zeroed in VMEM.
#
# One flat 2-D dot per row block: Kp [56,128] @ X^T [128,(t+2)*P2] with 54
# used rows = 3 RGB x 9 taps x 2 lane-halves; a tap's coefficient sits on the
# low or high 64 lanes according to which pixel of the pair it multiplies.
# With out[x] = sum_dx K[dx] . in[x+dx-1] (padding=1):
#   even x=2j reads in[2j-1] (pair j-1 HIGH), in[2j] (pair j LOW),
#              in[2j+1] (pair j HIGH);
#   odd  x=2j+1 reads in[2j] (pair j LOW), in[2j+1] (pair j HIGH),
#              in[2j+2] (pair j+1 LOW).
# So each parity needs two same-pair plane sums plus ONE neighbour-pair sum,
# realized as a single f32 lane-roll (32-bit roll is Mosaic-supported; the
# wrapped lane is re-zeroed by an f32 mask multiply, which is exactly the
# conv's zero padding at x=-1 / x=W).


def _plane(p, dy: int, dx: int, half: int, t: int):
    """[3, t, P2] f32 view of the tap plane (dy, dx, half) over the t output
    rows.  Plane rows are ordered m = ((dy*3+dx)*2+half)*3+rgb; output row y
    needs chunk-local input row y+dy (the DMA put image row i*t-1 at local
    row 0)."""
    k = ((dy * 3 + dx) * 2 + half) * 3
    return p[k:k + 3, dy:dy + t, :]


def _make_paired_kernel(t: int, h: int, p2: int, n_i: int):
    """x_hbm: [B, H, P2, 128] packed pairs; k_ref: [56, 128]; out block
    [1, 3, 2, t, P2] (parity-planar; the caller interleaves).  n_i = H // t
    row blocks per image."""

    def kernel(x_hbm, k_ref, out_ref, xs_ref, sem0, sem1, sem2):
        b_idx = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * t
        # Interior rows (always valid): image rows [r0, r0+t) -> xs[1:t+1].
        main = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(r0, t)], xs_ref.at[pl.ds(1, t)], sem0)
        main.start()
        # Halo rows: image row r0-1 -> xs[0], r0+t -> xs[t+1]; out-of-image
        # rows fetch a clamped in-bounds row and are zeroed below.
        top = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
            xs_ref.at[pl.ds(0, 1)], sem1)
        top.start()
        bot = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(jnp.minimum(r0 + t, h - 1), 1)],
            xs_ref.at[pl.ds(t + 1, 1)], sem2)
        bot.start()
        main.wait()
        top.wait()
        bot.wait()
        top_valid = (i > 0).astype(xs_ref.dtype)
        bot_valid = (i < n_i - 1).astype(xs_ref.dtype)
        xs_ref[0:1] = xs_ref[0:1] * top_valid
        xs_ref[t + 1:t + 2] = xs_ref[t + 1:t + 2] * bot_valid

        xsf = xs_ref[:].reshape((t + 2) * p2, 128)  # free: p2 % 16 == 0
        p = jax.lax.dot_general(
            k_ref[:], xsf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [56, (t+2)*P2]
        p = p.reshape(56, t + 2, p2)                 # free: p2 % 128 == 0

        lanes = jax.lax.broadcasted_iota(jnp.int32, (3, t, p2), 2)
        # even parity: pair j-1 HIGH of dx=0 rolls right (zero at j=0).
        re = sum(_plane(p, dy, 0, 1, t) for dy in range(3))
        re = pltpu.roll(re, 1, 2) * (lanes > 0).astype(jnp.float32)
        pe = re + sum(_plane(p, dy, 1, 0, t) + _plane(p, dy, 2, 1, t)
                      for dy in range(3))
        # odd parity: pair j+1 LOW of dx=2 rolls left (zero at j=P2-1).
        ro = sum(_plane(p, dy, 2, 0, t) for dy in range(3))
        ro = pltpu.roll(ro, p2 - 1, 2) * (lanes < p2 - 1).astype(jnp.float32)
        po = ro + sum(_plane(p, dy, 0, 0, t) + _plane(p, dy, 1, 1, t)
                      for dy in range(3))
        out_ref[0, :, 0] = jnp.tanh(pe).astype(out_ref.dtype)
        out_ref[0, :, 1] = jnp.tanh(po).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def to_rgb_paired(x: jnp.ndarray, kernel: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """``tanh(conv3x3(x, kernel, padding=1))`` for 2*C == 128 inputs.

    Args: x: [B, H, W, C] with C == 64, W even, (W//2) % 128 == 0;
    kernel: [3, 3, C, 3].  Returns [B, H, W, 3].  Differentiable via
    XLA recompute (same contract as :func:`to_rgb_fused`)."""
    return _paired_forward(x, kernel, interpret)


def _paired_fwd(x, kernel, interpret):
    return _paired_forward(x, kernel, interpret), (x, kernel)


def _paired_bwd(interpret, residuals, g):
    x, kernel = residuals
    _, vjp = jax.vjp(_naive, x, kernel)
    return vjp(g)


def _paired_forward(x: jnp.ndarray, kernel: jnp.ndarray,
                    interpret: bool) -> jnp.ndarray:
    b, h, w, c = x.shape
    if 2 * c != 128 or w % 2 or (w // 2) % 128:
        raise ValueError(f"to_rgb_paired needs C=64 and W/2 % 128 == 0, "
                         f"got {x.shape}")
    p2 = w // 2
    t = 64
    while h % t:
        t //= 2

    xp = x.reshape(b, h, p2, 2 * c)
    # Kp rows m = ((dy*3+dx)*2 + half)*3 + rgb; channel c of the tap sits at
    # lane c (half=0, even pixel of the pair) or 64+c (half=1, odd pixel).
    k = kernel.astype(x.dtype)                       # [3, 3, C, 3]
    kp = jnp.zeros((56, 128), x.dtype)
    rows = k.transpose(0, 1, 3, 2).reshape(27, c)    # (dy, dx, rgb) major
    idx = jnp.arange(27)
    for half in (0, 1):
        m = ((idx // 3) * 2 + half) * 3 + (idx % 3)
        kp = kp.at[m, half * c:(half + 1) * c].set(rows)

    out = pl.pallas_call(
        _make_paired_kernel(t, h, p2, h // t),
        out_shape=jax.ShapeDtypeStruct((b, 3, 2, h, p2), x.dtype),
        grid=(b, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((56, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, 3, 2, t, p2), lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t + 2, p2, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * p2 * 56 * 128,
            bytes_accessed=2 * b * h * w * c + b * h * w * 3 * 2,
            transcendentals=b * h * w * 3),
        interpret=interpret,
    )(xp, kp)
    # [B, 3, 2, H, P2] -> [B, H, P2, 2, 3] -> [B, H, W, 3]: W index = 2j+p.
    return out.transpose(0, 3, 4, 2, 1).reshape(b, h, w, 3)


to_rgb_paired.defvjp(_paired_fwd, _paired_bwd)


# ---------------------------------------------------------------------------
# GLU-fused variant: consumes the PRE-GLU [B, H, W, 2C] stage output
# ---------------------------------------------------------------------------
#
# The trace decode (docs/PERFORMANCE.md round 3) shows XLA fusing the GLU
# into the RGB conv's fetch — the pre-GLU 2C=128 tensor is what actually
# lives in HBM.  This variant reads THAT tensor (lanes already 128-aligned,
# no pixel pairing needed) and computes GLU + conv3x3 + tanh in VMEM:
# glu(x) = x[..., :C] * sigmoid(x[..., C:]), realized as one f32 lane-roll
# (sigmoid of the rolled tensor multiplies the low half; the kernel rows
# are zero over the high half, so its garbage never reaches the output).
# Tap combination mirrors the paired kernel: one flat 2-D dot against a
# 32-row packed kernel, sublane-offset row slices, two lane-rolls for the
# dx=0/2 taps.  Whether this beats variant A depends on which producer
# fusion XLA builds — measured at the full-graph level, not predicted.


def _make_glu_kernel(t: int, h: int, w: int, c: int, n_i: int):
    """x_hbm: [B, H, W, 2C] pre-GLU; k_ref: [32, 2C] (high-half zeros);
    out block [1, 3, t, W]."""

    def kernel(x_hbm, k_ref, out_ref, xs_ref, sem0, sem1, sem2):
        b_idx = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * t
        main = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(r0, t)], xs_ref.at[pl.ds(1, t)], sem0)
        main.start()
        top = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
            xs_ref.at[pl.ds(0, 1)], sem1)
        top.start()
        bot = pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(jnp.minimum(r0 + t, h - 1), 1)],
            xs_ref.at[pl.ds(t + 1, 1)], sem2)
        bot.start()
        main.wait()
        top.wait()
        bot.wait()
        top_valid = (i > 0).astype(xs_ref.dtype)
        bot_valid = (i < n_i - 1).astype(xs_ref.dtype)
        xs_ref[0:1] = xs_ref[0:1] * top_valid
        xs_ref[t + 1:t + 2] = xs_ref[t + 1:t + 2] * bot_valid

        # GLU: low lanes gated by sigmoid of the high lanes (roll brings
        # lane C+j onto lane j; the rolled low half is garbage on the high
        # lanes, killed by the kernel's zero rows there).
        xf = xs_ref[:].astype(jnp.float32)
        gated = xf * jax.nn.sigmoid(pltpu.roll(xf, c, 2))
        g = gated.astype(xs_ref.dtype).reshape((t + 2) * w, 2 * c)
        p = jax.lax.dot_general(
            k_ref[:], g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [32, (t+2)*W]
        p = p.reshape(32, t + 2, w)                      # free: w % 128 == 0

        lanes = jax.lax.broadcasted_iota(jnp.int32, (3, t, w), 2)

        def plane(dy, dx):
            k = (dy * 3 + dx) * 3
            return p[k:k + 3, dy:dy + t, :]

        mid = sum(plane(dy, 1) for dy in range(3))
        re = sum(plane(dy, 0) for dy in range(3))
        re = pltpu.roll(re, 1, 2) * (lanes > 0).astype(jnp.float32)
        ro = sum(plane(dy, 2) for dy in range(3))
        ro = pltpu.roll(ro, w - 1, 2) * (lanes < w - 1).astype(jnp.float32)
        out_ref[0] = jnp.tanh(mid + re + ro).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def to_rgb_glu(x: jnp.ndarray, kernel: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """``tanh(conv3x3(glu(x), kernel, padding=1))`` over pre-GLU input.

    Args: x: [B, H, W, 2C] with 2C == 128, W % 128 == 0; glu splits the
    channel dim in half (value, gate); kernel: [3, 3, C, 3].
    Returns [B, H, W, 3].  Differentiable via XLA recompute."""
    return _glu_forward(x, kernel, interpret)


def _naive_glu(x, kernel):
    c = x.shape[-1] // 2
    g = x[..., :c] * jax.nn.sigmoid(x[..., c:].astype(jnp.float32)
                                    ).astype(x.dtype)
    return _naive(g, kernel)


def _glu_fwd(x, kernel, interpret):
    return _glu_forward(x, kernel, interpret), (x, kernel)


def _glu_bwd(interpret, residuals, g):
    x, kernel = residuals
    _, vjp = jax.vjp(_naive_glu, x, kernel)
    return vjp(g)


def _glu_forward(x: jnp.ndarray, kernel: jnp.ndarray,
                 interpret: bool) -> jnp.ndarray:
    b, h, w, c2 = x.shape
    c = c2 // 2
    if c2 != 128 or w % 128:
        raise ValueError(f"to_rgb_glu needs 2C=128 and W % 128 == 0, "
                         f"got {x.shape}")
    t = 32
    while h % t:
        t //= 2

    # Rows m = (dy*3+dx)*3 + rgb over the LOW half lanes; high half zero.
    k = kernel.astype(x.dtype)                           # [3, 3, C, 3]
    kp = jnp.zeros((32, 128), x.dtype)
    kp = kp.at[:27, :c].set(k.transpose(0, 1, 3, 2).reshape(27, c))

    out = pl.pallas_call(
        _make_glu_kernel(t, h, w, c, h // t),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, w), x.dtype),
        grid=(b, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((32, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM,
                         pipeline_mode=pl.Buffered(1)),
        ],
        out_specs=pl.BlockSpec((1, 3, t, w), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t + 2, w, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 32 * 128,
            bytes_accessed=2 * b * h * w * c2 + b * h * w * 3 * 2,
            transcendentals=b * h * w * (3 + c)),
        interpret=interpret,
    )(x, kp)
    return out.transpose(0, 2, 3, 1)


to_rgb_glu.defvjp(_glu_fwd, _glu_bwd)


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
