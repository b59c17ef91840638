"""On-device image ops: upsampling, resizing, normalization.

The reference does all of this with torch/torchvision host-side helpers
(``nn.Upsample`` model.py:106, ``F.interpolate`` losses.py:348,
``transforms.Normalize`` datasets.py:403-406); here they are pure jnp ops that
fuse into the surrounding XLA graphs.  NHWC layout throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# CLIP preprocessing constants (datasets.py:405-406).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (``nn.Upsample(scale_factor=2,
    mode='nearest')``, model.py:106) for NHWC tensors.

    Implemented with reshape+broadcast instead of a gather so XLA lowers it
    to a pure data-movement op that fuses with the following convolution.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# Phase-combination matrix for conv3x3-over-nearest-2x-upsample: entry
# [a, p, u] is 1 iff, for output phase ``a`` (high-res row 2i+a), kernel tap
# ``u`` (high-res input row 2i+a+u-1) floors to the p-th distinct low-res
# row of the window.  Phase 0 reads low-res rows (i-1, i) with weights
# (K0, K1+K2); phase 1 reads rows (i, i+1) with weights (K0+K1, K2).
_UP2X_PHASE = (
    ((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),  # a=0: [K0, K1+K2]
    ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)),  # a=1: [K0+K1, K2]
)


def conv3x3_on_up2x(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3(upsample_nearest_2x(x), kernel, padding=1)`` computed as a
    four-phase 2x2 subpixel convolution at LOW resolution.

    Because nearest-2x duplicates every input pixel into a 2x2 block, each
    high-res output pixel's 3x3 window covers only a 2x2 block of *distinct*
    low-res pixels; which kernel taps share a pixel depends only on the
    output parity (phase).  Summing the shared taps gives four 2x2 kernels,
    one per phase — the same arithmetic (up to float reassociation) at 16/36
    of the FLOPs, and the 4x-larger upsampled tensor never exists in HBM.
    The reference computes the naive form (``upBlock``, model.py:104-110);
    this rewrite is output-equivalent.  NOTE: measured SLOWER than the
    naive form on TPU v5e (gen-only batch 128 bf16: 830 vs 1590 imgs/sec)
    because XLA already fuses the broadcast-based upsample into the conv's
    input fetch while the rewrite introduces odd (H+1, W+1) conv shapes and
    a phase interleave; kept (off by default, ``T2IGAN_UPBLOCK=subpixel``)
    as a documented negative result and for A/B on other backends.  The
    production default is :func:`conv3x3_on_up2x_dilated` below.

    x: [B, H, W, Cin]; kernel: [3, 3, Cin, Cout] (the plain conv3x3 kernel —
    checkpoints stay layout-compatible).  Returns [B, 2H, 2W, Cout].
    """
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    m = jnp.asarray(_UP2X_PHASE, dtype=kernel.dtype)  # [2(a), 2(p), 3(u)]
    # [2,2,Cin, a,b,Cout] -> 2x2 kernel with the 4 phases stacked on Cout.
    k2 = jnp.einsum("apu,bqv,uvio->pqiabo", m, m, kernel)
    k2 = k2.reshape(2, 2, kernel.shape[2], 4 * cout)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xpad, k2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H+1, W+1, 4Cout]
    y = y.reshape(b, h + 1, w + 1, 2, 2, cout)
    # out[2i+a, 2j+b] = y[i+a, j+b, a, b] — slice the phase grids and
    # interleave them back to high resolution.
    rows = [[y[:, a:a + h, bb:bb + w, a, bb] for bb in (0, 1)]
            for a in (0, 1)]
    out = jnp.stack([jnp.stack(r, axis=3) for r in rows], axis=2)
    return out.reshape(b, 2 * h, 2 * w, cout)  # [B,H,2,W,2,C] -> interleaved


# Tap sets for the input-dilated equivalent of conv3x3-over-nearest-2x:
# with lhs_dilation=2 and padding (2, 2), out[o] = sum_t K4[t]*dil[o+t-2]
# where dil[2j] = x[j]; even outputs hit only taps {0, 2}, odd outputs only
# {1, 3}, and matching the naive weights gives, per axis,
# K4 = [K3[0], K3[0]+K3[1], K3[1]+K3[2], K3[2]].
_UP2X_DILATED_TAPS = ((0,), (0, 1), (1, 2), (2,))


def conv3x3_on_up2x_dilated(x: jnp.ndarray,
                            kernel: jnp.ndarray) -> jnp.ndarray:
    """``conv3x3(upsample_nearest_2x(x), kernel, padding=1)`` as ONE
    input-dilated convolution with a derived 4x4 kernel.

    Same arithmetic as the naive pair (up to float reassociation where the
    upsample duplicates a pixel under two kernel taps), but measured ~1.9x
    faster on the v5e chip (13.8 vs 26.7 ms for the 128^2->256^2 stage-3
    conv at batch 128 bf16, tools/upblock_variants.py): the TPU conv
    emitter's native input-dilation phase decomposition beats both the
    broadcast-upsample-then-conv graph and the explicit subpixel rewrite.

    x: [B, H, W, Cin]; kernel: [3, 3, Cin, Cout] (plain conv3x3 layout —
    checkpoints unchanged).  Returns [B, 2H, 2W, Cout].
    """
    rows = [sum(kernel[u] for u in us) for us in _UP2X_DILATED_TAPS]
    k4 = jnp.stack([jnp.stack([sum(r[v] for v in vs)
                               for vs in _UP2X_DILATED_TAPS])
                    for r in rows])
    return jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), (1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


# Row-tap map for a conv3x3 computed in 2x2 subpixel PHASE space: entry
# [alpha, p, a, u] is 1 iff, for output phase ``alpha`` (hi-res row 2i+alpha),
# kernel tap ``u`` (hi-res row 2i+alpha+u-1) lands on input phase ``a`` at the
# p-th row of the phase tensor's 2-row window [i, i+1].  (Phase-tensor row t
# carries phase-``a`` values of hi-res row 2(t-a)+a, i.e. hi-res row r of
# parity a lives at phase-tensor row (r-a)/2 + a.)
_UP2X_RGB_PHASE = (
    # alpha=0: window row p=0 reads a=0 via K3[1] and a=1 via K3[0];
    #          window row p=1 reads a=1 via K3[2].
    (((0.0, 1.0, 0.0), (1.0, 0.0, 0.0)),
     ((0.0, 0.0, 0.0), (0.0, 0.0, 1.0))),
    # alpha=1: window row p=0 reads a=0 via K3[0];
    #          window row p=1 reads a=0 via K3[2] and a=1 via K3[1].
    (((1.0, 0.0, 0.0), (0.0, 0.0, 0.0)),
     ((0.0, 0.0, 1.0), (0.0, 1.0, 0.0))),
)


@jax.custom_vjp
def _phase_conv2x2(x: jnp.ndarray, k2: jnp.ndarray) -> jnp.ndarray:
    """2x2 conv with SAME-1 padding ([B, H, W, Cin] -> [B, H+1, W+1, Co])
    whose backward is hand-written with KERNEL-side spatial flips.

    Why a custom VJP for a plain conv: XLA's autodiff emission for this
    conv's gradients reverses the [B, H+1, W+1, Co] COTANGENT (`reverse`
    over dims {1,2} — a full 0.8 ms HBM pass per caption view at the
    train tail's production shape, trace .profiles/train_r5_pt).  The
    same math with the flip moved onto the [2, 2, Cin, Co] kernel is
    free.  Forward is byte-identical (same conv op); backward values are
    identical convolutions (oracle-pinned in tests/test_phase_ops.py).

    HONEST TPU OUTCOME (trace .profiles/train_r5b): the input gradient
    lowers cleanly, but the TPU backend's canonicalization of the
    FILTER-gradient conv (rhs = the [B, H+1, W+1, Co] cotangent)
    re-introduces its own activation reverse — that 0.82 ms/view pass is
    backend-imposed and survives this rewrite.  Kept because the dx path
    and non-TPU backends do lower reverse-free, and the VJP is exact.
    """
    return jax.lax.conv_general_dilated(
        x, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_conv2x2_fwd(x, k2):
    return _phase_conv2x2(x, k2), (x, k2)


def _phase_conv2x2_bwd(res, dy):
    x, k2 = res
    # dx[t] = sum_p dy[t + 1 - p] k[p]: VALID correlation of dy with the
    # spatially flipped, io-transposed kernel (sizes: (H+1) - 2 + 1 = H).
    kt = jnp.flip(k2, (0, 1)).transpose(0, 1, 3, 2)  # [2, 2, Co, Cin]
    dx = jax.lax.conv_general_dilated(
        dy, kt, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dw[p,q,ci,co] = sum_{n,i,j} xpad[n,i+p,j+q,ci] dy[n,i,j,co]: a VALID
    # conv contracting the batch dim — expressed via dimension_numbers
    # (batch<->feature swap on the lhs) so no physical transpose is paid.
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xpad, dy, (1, 1), "VALID",
        dimension_numbers=("CHWN", "IHWO", "NHWC"))  # [Cin, 2, 2, Co]
    return dx, dw.transpose(1, 2, 0, 3)


_phase_conv2x2.defvjp(_phase_conv2x2_fwd, _phase_conv2x2_bwd)


def up2x_phase_conv(x: jnp.ndarray, k_up: jnp.ndarray,
                    scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """The UpBlock conv (conv3x3 over nearest-2x, model.py:104-107) as ONE
    folded 2x2 conv in subpixel phase space: output channels ordered
    (GLU half h, row phase a, col phase b, feature r) so downstream affine
    and GLU stay flat rank-4 channel ops (fusion-critical — see
    :func:`up2x_bn_glu_rgb_phased`).  Returns [B, H+1, W+1, 8F]; halo
    entries (hi-res rows -1 / 2H) not yet discarded.

    ``scale`` (the eval path) folds a per-hi-res-channel BN scale into the
    kernel columns before the conv; the train path omits it (batch stats
    are computed from the RAW conv output first)."""
    b, h, w, cin = x.shape
    f2 = k_up.shape[-1]
    f = f2 // 2
    m = jnp.asarray(_UP2X_PHASE, k_up.dtype)
    k5 = k_up.reshape(3, 3, cin, 2, f)  # split Cout into (GLU half, feature)
    k2 = jnp.einsum("apu,bqv,uvihr->pqihabr", m, m, k5)
    if scale is not None:
        # broadcast (h, r) over the (a, b) phases
        k2 = k2 * scale.astype(k2.dtype).reshape(2, 1, 1, f)
    k2 = k2.reshape(2, 2, cin, 4 * f2).astype(x.dtype)
    return _phase_conv2x2(x, k2)  # [B, H+1, W+1, (h, a, b, r)]


def _up2x_glu_phase_tensor(x: jnp.ndarray, k_up: jnp.ndarray,
                           scale: jnp.ndarray,
                           shift: jnp.ndarray) -> jnp.ndarray:
    """Core of the phase-space eval tail: conv3x3-over-nearest-2x + folded
    eval-BN + GLU computed at LOW resolution, returning the phase tensor
    [B, H+1, W+1, (a, b, f)] (halo entries NOT yet discarded).
    Fusion-critical structure documented in :func:`up2x_bn_glu_rgb_phased`.
    (A mid-stage form that interleaved this tensor back to hi-res measured
    a full-graph LOSS and was deleted — docs/PERFORMANCE.md round 4,
    queue R4m.)"""
    f = k_up.shape[-1] // 2
    y = up2x_phase_conv(x, k_up, scale)
    sh = jnp.broadcast_to(shift.astype(x.dtype).reshape(2, 1, f),
                          (2, 4, f)).reshape(8 * f)
    y = y + sh
    return y[..., :4 * f] * jax.nn.sigmoid(y[..., 4 * f:])  # GLU -> (a, b, r)


def _phase_halo_masks(h: int, w: int):
    """Row/col validity factors of the phase grid: entry [t, p] is 0 iff
    phase-tensor row t at row-phase p maps outside the hi-res image (row
    -1 for odd phases at t=0, row 2H for even phases at t=H).  Shared by
    the halo zeroing and the phase-space batch statistics."""
    rm = np.ones((h + 1, 2), np.float32)
    rm[0, 1] = 0.0
    rm[h, 0] = 0.0
    cm = np.ones((w + 1, 2), np.float32)
    cm[0, 1] = 0.0
    cm[w, 0] = 0.0
    return rm, cm


def phase_batch_stats(y: jnp.ndarray):
    """Batch statistics of the hi-res pre-GLU UpBlock output, computed
    from its phase form ``y`` [B, H+1, W+1, (h, a, b, r)] — mean/var per
    hi-res channel (h, r) over (N, 2H, 2W), i.e. over the four phase
    slices restricted to their valid windows (each hi-res element appears
    in the phase grid exactly once; halo entries are masked out).

    Mirrors ``flax.linen.normalization._compute_stats``: f32 reductions,
    fast variance ``max(0, E[x^2] - E[x]^2)``.  Returns (mean, var), each
    f32 [2F] in the conv output's channel order.

    FUSION-CRITICAL FORM: the first implementation masked the halo with a
    ``einsum("nRChabr,Ra,Cb->hr", ...)``, which XLA lowered as multiple
    full f32[H+1, W+1, 8F] intermediates (a partial batch-only reduce, a
    reshape sea, and — in the BACKWARD — materialized f32 mask-product
    passes feeding the dy of every consumer; ~4-5 ms/step of the phased
    train tail's 16.4 ms at production shape, trace
    .profiles/train_r5_pt).  This form instead takes ONE clean full
    reduce over the raw tensor and SUBTRACTS the four invalid boundary
    lines (inclusion-exclusion adds the doubly-removed corners back):
    the full reduce's backward is a broadcast constant and the line
    corrections' backwards are pads of thin slices — no masked full-size
    pass anywhere."""
    b, r_, c_, c8 = y.shape
    h, w = r_ - 1, c_ - 1
    f = c8 // 8
    count = b * 2 * h * 2 * w

    def ch(t):
        # channel split [..., 8F] -> [..., (h, a, b, r)]
        return t.reshape(t.shape[:-1] + (2, 2, 2, f))

    def sums(t, axes):
        tf = t.astype(jnp.float32)
        return jnp.sum(tf, axes), jnp.sum(jnp.square(tf), axes)

    # one full reduce over the raw conv output (fuses with its producer)
    s1_all, s2_all = sums(y, (0, 1, 2))                       # [8F]
    # boundary lines (thin slices; their backwards are pads, not masks):
    # phase row 0 is invalid at row-phase a=1, row H at a=0; col 0 at
    # col-phase b=1, col W at b=0.
    r0_1, r0_2 = sums(ch(y[:, 0]), (0, 1))                    # [2,2,2,f]
    rh_1, rh_2 = sums(ch(y[:, h]), (0, 1))
    c0_1, c0_2 = sums(ch(y[:, :, 0]), (0, 1))
    cw_1, cw_2 = sums(ch(y[:, :, w]), (0, 1))
    # corners, doubly removed by the row+col subtractions
    c00_1, c00_2 = sums(ch(y[:, 0, 0]), (0,))
    c0w_1, c0w_2 = sums(ch(y[:, 0, w]), (0,))
    ch0_1, ch0_2 = sums(ch(y[:, h, 0]), (0,))
    chw_1, chw_2 = sums(ch(y[:, h, w]), (0,))

    def valid(s_all, r0, rh, c0, cw, c00, c0w, ch0, chw):
        s = ch(s_all)                                        # [2,2,2,f]
        row_sub = jnp.stack([rh[:, 0], r0[:, 1]], axis=1)    # a=0 <- row H
        col_sub = jnp.stack([cw[:, :, 0], c0[:, :, 1]], axis=2)
        corner = jnp.stack([
            jnp.stack([chw[:, 0, 0], ch0[:, 0, 1]], axis=1),  # a=0: b=0,1
            jnp.stack([c0w[:, 1, 0], c00[:, 1, 1]], axis=1),  # a=1: b=0,1
        ], axis=1)                                           # [2,2,2,f]
        v = s - row_sub - col_sub + corner
        return jnp.sum(v, axis=(1, 2)).reshape(2 * f)        # over (a, b)

    s1 = valid(s1_all, r0_1, rh_1, c0_1, cw_1,
               c00_1, c0w_1, ch0_1, chw_1) / count
    s2 = valid(s2_all, r0_2, rh_2, c0_2, cw_2,
               c00_2, c0w_2, ch0_2, chw_2) / count
    var = jnp.maximum(0.0, s2 - jnp.square(s1))
    return s1, var


def up2x_bn_glu_rgb_phased(x: jnp.ndarray, k_up: jnp.ndarray,
                           scale: jnp.ndarray, shift: jnp.ndarray,
                           k_rgb: jnp.ndarray) -> jnp.ndarray:
    """The generator's FINAL eval tail — ``UpBlock`` (conv3x3 over a
    nearest-2x upsample + eval-BN + GLU, model.py:104-110) followed by the
    RGB head (conv3x3 -> 3 + tanh, model.py:536-547) — computed entirely in
    2x2 subpixel phase space.

    Why: the production default used to run the upconv as ONE input-dilated
    4x4 conv (:func:`conv3x3_on_up2x_dilated`); the round-4 device trace
    shows the TPU conv emitter executes that form DENSE — 21.0 ms/batch at
    batch 128 bf16 for the 128^2 -> 256^2 stage, which is ~100% MXU
    occupancy on 4x the necessary FLOPs (the dilation zeros are multiplied,
    not skipped).  In phase space the same arithmetic is one 2x2 conv at
    LOW resolution with the four phase kernels folded onto the output
    channel axis (4x fewer FLOPs, MXU-perfect Cin/Cout), and because the
    only consumer of the 2x-resolution tensor is the RGB head, the head is
    ALSO computed in phase space (a second folded 2x2 conv), so no
    2x-resolution feature tensor ever exists in HBM (the phase-space
    pre-GLU tensor is the same bytes as the hi-res one, but it is a plain
    conv output whose BN epilogue and GLU consumer fuse — see the
    FUSION-CRITICAL note below).  Only the [B, H, W, 12] phase RGB output
    (48 MB) is interleaved back to [B, 2H, 2W, 3].

    Exactness: same arithmetic as the module chain up to float
    reassociation (shared-tap sums and the conv accumulation order);
    equivalence is pinned in tests/test_models_gan.py.

    Boundary handling: the phase tensor's halo rows/cols (index 0 for
    odd phases, index H for even phases) correspond to hi-res rows -1 and
    2H, which the hi-res RGB conv's zero padding would supply as zeros —
    they are masked to zero between the GLU and the phase RGB conv.

    x: [B, H, W, Cin] stage features (post-ResBlock); k_up: [3, 3, Cin, 2F]
    the UpBlock conv kernel; scale/shift: [2F] the folded eval-BN affine;
    k_rgb: [3, 3, F, 3] the RGB head kernel.  Returns [B, 2H, 2W, 3] in
    [-1, 1].
    """
    b, h, w, cin = x.shape
    f2 = k_up.shape[-1]
    f = f2 // 2
    # Upconv: fold the four 2x2 phase kernels onto Cout (see
    # :func:`conv3x3_on_up2x`); phase (a, c) of hi-res row/col (2i+a, 2j+c)
    # lives at [i+a, j+c, (a, c)] of the conv output.
    #
    # FUSION-CRITICAL STRUCTURE (trace .profiles/geneval_r4_phased): the
    # first form of this op reshaped the conv output to rank-5
    # [B, H+1, W+1, 4, 2F] for the BN/GLU, which blocked XLA's conv
    # epilogue fusion — the affine and the GLU each became a separate full
    # pass over the ~2.2 GB phase tensor (6.5 + 4.7 ms/batch at b128,
    # erasing the conv's own 21.0 -> 6.7 ms win).  Everything below
    # therefore stays rank-4 on the conv's own output shape:
    #  * the eval-BN SCALE is folded into the conv kernel columns and the
    #    SHIFT is a flat [8F] bias add (a standard fusable conv epilogue);
    #  * the folded kernel's output channels are ordered
    #    (GLU half, row phase a, col phase b, feature) so the GLU is a
    #    flat channel split;
    #  * the halo mask is two rank-2 row/col broadcast factors.
    g = _up2x_glu_phase_tensor(x, k_up, scale, shift)  # [B, H+1, W+1, (a,b,r)]
    return _phase_rgb_tail(g, k_rgb)


def _phase_rgb_tail(g: jnp.ndarray, k_rgb: jnp.ndarray) -> jnp.ndarray:
    """Back half of the phased tail: halo zeroing + RGB head + tanh +
    interleave on the post-GLU phase tensor ``g`` [B, H+1, W+1, (a,b,r)].
    Returns [B, 2H, 2W, 3] in [-1, 1]."""
    b, r_, c_, c4 = g.shape
    h, w = r_ - 1, c_ - 1
    f = c4 // 4
    # Zero the out-of-image halo entries (hi-res rows -1 and 2H): row factor
    # depends on (row, a), col factor on (col, b), broadcast over features.
    rm, cm = _phase_halo_masks(h, w)
    rowm = np.broadcast_to(rm[:, :, None],
                           (h + 1, 2, 2 * f)).reshape(h + 1, 4 * f)
    colm = np.broadcast_to(cm[:, None, :, None],
                           (w + 1, 2, 2, f)).reshape(w + 1, 4 * f)
    g = g * jnp.asarray(rowm, g.dtype)[None, :, None, :]
    g = g * jnp.asarray(colm, g.dtype)[None, None, :, :]
    # RGB head in phase space: output phase (alpha, gamma) at (i, j) reads
    # the four input phases over the 2x2 window [i, i+1] x [j, j+1] with
    # the K3 taps routed by _UP2X_RGB_PHASE.
    r = jnp.asarray(_UP2X_RGB_PHASE, k_rgb.dtype)
    kr = jnp.einsum("apxu,gqcv,uvfo->pqxcfago", r, r, k_rgb)
    kr = kr.reshape(2, 2, 4 * f, 12).astype(g.dtype)
    rgb = jax.lax.conv_general_dilated(
        g, kr, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H, W, (a, c, 3)]
    rgb = jnp.tanh(rgb).reshape(b, h, w, 2, 2, 3)
    return rgb.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, 3)


def phase_bn_glu_rgb_train(y: jnp.ndarray, mean: jnp.ndarray,
                           var: jnp.ndarray, scale: jnp.ndarray,
                           bias: jnp.ndarray, k_rgb: jnp.ndarray,
                           epsilon: float = 1e-5) -> jnp.ndarray:
    """TRAIN-mode back half of the phased tail: batch-stat BatchNorm + GLU
    + RGB head + tanh + interleave on the RAW pre-BN phase tensor ``y``
    (:func:`up2x_phase_conv` output, [B, H+1, W+1, (h, a, b, r)]).

    Unlike the eval form the BN affine cannot fold into the conv kernel
    (the statistics come from the conv output itself), so normalization is
    one per-channel multiply-add epilogue on the conv's own rank-4 shape —
    an XLA-fusable elementwise pass, exactly what the module chain pays
    for its BN apply.  The savings vs the module chain are the 4x conv
    FLOPs (forward AND both gradients — the train step runs this stage
    twice per iteration, once per caption view) and the hi-res feature
    tensor's HBM round-trips, including the [B, 2H, 2W, 2F] activation
    `reverse` passes XLA emits for the dilated form's input gradient.

    mean/var: f32 [2F] batch stats (:func:`phase_batch_stats`);
    scale/bias: the BatchNorm affine params [2F].  Math mirrors
    ``flax.linen.normalization._normalize`` (f32 affine, cast to y.dtype)
    followed by GLU.  Returns [B, 2H, 2W, 3] in [-1, 1]."""
    c8 = y.shape[-1]
    f = c8 // 8
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(var + epsilon)  # [2F]
    t = bias.astype(jnp.float32) - mean * s
    # broadcast hi-res channels (h, r) over the (a, b) phases, flat rank-4;
    # affine in f32 then cast (flax _normalize order), GLU in y.dtype —
    # all one fusable elementwise pass (converts are register-level).
    s_full = jnp.broadcast_to(s.reshape(2, 1, 1, f), (2, 2, 2, f)).reshape(c8)
    t_full = jnp.broadcast_to(t.reshape(2, 1, 1, f), (2, 2, 2, f)).reshape(c8)
    g = (y * s_full + t_full).astype(y.dtype)
    g = g[..., :4 * f] * jax.nn.sigmoid(g[..., 4 * f:])  # GLU -> (a, b, r)
    return _phase_rgb_tail(g, k_rgb)


def resize_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest resize to (size, size) — semantics of
    ``F.interpolate(img, size=...)`` whose default mode is nearest
    (losses.py:348, trainer.py:579)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="nearest")


def resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


# ---------------------------------------------------------------------------
# torch-exact bilinear resize (no antialias)
# ---------------------------------------------------------------------------
#
# ``jax.image.resize(method="bilinear")`` antialiases on downscale (TF2
# semantics); torch's ``F.interpolate(mode='bilinear',
# align_corners=False)`` — the resize inside pytorch-fid's InceptionV3
# (reference inception.py:143-147) and the IS script's ``nn.Upsample``
# (inception_score.py:74) — does not.  For eval-metric bit-fidelity we
# implement the torch kernel exactly: half-pixel source mapping
# ``src = (i + 0.5) * in/out - 0.5`` clamped at 0, two-tap lerp.  Because
# each output row/col is a fixed 2-tap linear combination of input
# rows/cols, the whole resize is two small matmuls — which XLA maps
# straight onto the MXU, faster than a gather-based lowering.

def _linear_resize_matrix(in_size: int, out_size: int):
    """[out, in] f32 interpolation matrix for torch bilinear
    (align_corners=False), exact for up- and downscaling."""
    import numpy as np

    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    # torch clamps the source index at 0 (area_pixel_compute_source_index)
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), (1.0 - frac).astype(np.float32))
    np.add.at(m, (rows, i1), frac.astype(np.float32))
    return m


def resize_bilinear_torch(x: jnp.ndarray, out_h: int,
                          out_w: int) -> jnp.ndarray:
    """NHWC resize matching ``F.interpolate(x, (out_h, out_w),
    mode='bilinear', align_corners=False)`` exactly (no antialias)."""
    _, h, w, _ = x.shape
    mh = jnp.asarray(_linear_resize_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_linear_resize_matrix(w, out_w), dtype=x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("pw,bowc->bopc", mw, y)


def resize_bilinear_torch_np(img, out_h: int, out_w: int):
    """Host (numpy) twin of :func:`resize_bilinear_torch` for a single HWC
    image — used by the eval input pipelines to bring arbitrary native
    resolutions to one static device shape with the same arithmetic."""
    import numpy as np

    h, w = img.shape[:2]
    c = img.shape[2]
    mh = _linear_resize_matrix(h, out_h)
    mw = _linear_resize_matrix(w, out_w)
    # Two sequential matmuls, NOT one three-operand einsum: without a forced
    # contraction order numpy may lower "oh,hwc,pw->opc" as the naive
    # five-index loop — O(out_h*h*w*c*out_w), ~70 s for one 256->299 image.
    tmp = (mh @ img.astype(np.float32).reshape(h, w * c)).reshape(
        out_h, w, c)                                     # rows:   [O, w, c]
    out = mw @ tmp.transpose(1, 0, 2).reshape(w, out_h * c)  # cols
    return out.reshape(out_w, out_h, c).transpose(1, 0, 2)


def clip_normalize(x01: jnp.ndarray) -> jnp.ndarray:
    """Normalize [0,1] RGB to CLIP statistics (datasets.py:403-406)."""
    mean = jnp.asarray(CLIP_MEAN, dtype=x01.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x01.dtype)
    return (x01 - mean) / std


def tanh_to_clip(img: jnp.ndarray) -> jnp.ndarray:
    """Map generator output in [-1, 1] to CLIP-normalized space.

    NOTE (reference fidelity): the reference feeds the raw [-1, 1] generator
    output straight into CLIP after a nearest resize (losses.py:348-349,
    trainer.py:579-584) — without re-normalizing to CLIP statistics.  Real
    images, by contrast, reach CLIP via ``transforms.Normalize`` with the
    CLIP mean/std.  We reproduce that behavior exactly (identity here apart
    from the resize) so the DAMSM ranking-loss distribution matches; this
    helper exists for the *corrected* pipeline variant.
    """
    x01 = (img + 1.0) * 0.5
    return clip_normalize(x01)


def uint8_from_tanh(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> [0,255] uint8 (trainer.py:566-567)."""
    return jnp.clip((img + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
