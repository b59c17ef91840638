"""Fused DAMSM word-region matching-score kernel (Pallas/TPU).

Computes the full (text i, image j) attention-driven matching matrix R[i, j]
of :func:`t2igan.losses.damsm.attention_match_scores` — the hot loop of the
reference (losses.py:219-272, a per-sample Python loop of batch-broadcast
bmms) — in a single pallas_call over a (B_text, B_img) grid.

Why a kernel: the XLA path materializes the [B, B, L, D] region-context
tensor in HBM (~130 MB at the DAMSM batch of 48).  Each grid program here
holds one (words_i, regions_j) pair entirely in VMEM: similarity matmul,
both masked softmaxes, the context matmul, cosine relevance and the final
log-sum-exp never touch HBM.  Per-pair state is ~160 KB — far under the
16 MB VMEM budget.

The backward pass reuses the jnp reference implementation through
``jax.custom_vjp`` (recompute-based), so the kernel is a pure forward
accelerator with identical gradients.
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


def _kernel(words_ref, regions_ref, wmask_ref, lslot_ref, pslot_ref,
            out_ref, *, gamma1: float, gamma2: float):
    """One (i, j) pair.

    words_ref:   [1, L, D] l2-normalized words of text i (pad rows zero).
    regions_ref: [1, P, D] l2-normalized regions of image j (pad rows zero).
    wmask_ref:   [1, L] float 1/0 — real (non-padding) words of text i.
    lslot_ref:   [1, L] float 1/0 — slots present in the un-padded input
                 (the reference sums the R(Q,D) log-sum-exp over *all* its
                 word slots, padded ones included, losses.py:199-203; tile
                 padding added here must not contribute).
    pslot_ref:   [1, P] float 1/0 — real patch slots.
    out_ref:     [1, 1] R[i, j].
    """
    words = words_ref[0]                       # [L, D]
    regions = regions_ref[0]                   # [P, D]
    wmask = wmask_ref[0]                       # [1, L]
    lslot = lslot_ref[0]                       # [1, L]
    pslot = pslot_ref[0]                       # [1, P]

    # Eq.(7): similarity of every (patch, word) pair.
    sim = jax.lax.dot_general(
        regions, words, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # [P, L]

    # per-patch softmax over words; padding words masked (losses.py:127-144)
    masked = jnp.where(wmask > 0, sim, NEG)    # [P, L] via broadcast
    masked = masked - jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked)
    sm = e / jnp.sum(e, axis=1, keepdims=True)           # [P, L]

    # gamma1-sharpened softmax over patches; tile-pad patches excluded
    pkeep = jnp.transpose(pslot)                          # [P, 1]
    a = jnp.where(pkeep > 0, gamma1 * sm, NEG)
    a = a - jnp.max(a, axis=0, keepdims=True)
    ea = jnp.exp(a)
    attn = ea / jnp.sum(ea, axis=0, keepdims=True)       # [P, L]

    # region-context vector per word (losses.py:176-182)
    rc = jax.lax.dot_general(
        attn, regions, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [L, D]

    # cosine relevance (losses.py:197-198)
    num = jnp.sum(rc * words, axis=1, keepdims=True)     # [L, 1]
    rc_n = jnp.sqrt(jnp.sum(rc * rc, axis=1, keepdims=True))
    w_n = jnp.sqrt(jnp.sum(words * words, axis=1, keepdims=True))
    cos = num / jnp.maximum(rc_n * w_n, 1e-6)            # [L, 1]

    # R(Q,D) = (1/g2) * logsumexp over the original word slots
    t = jnp.where(jnp.transpose(lslot) > 0, gamma2 * cos, NEG)  # [L, 1]
    m = jnp.max(t)
    lse = (m + jnp.log(jnp.sum(jnp.exp(t - m)))) / gamma2
    out_ref[0, 0] = lse.reshape(1, 1)


def _kernel_rows(words_ref, regions_ref, wmask_ref, lslot_ref, pslot_ref,
                 out_ref, *, gamma1: float, gamma2: float):
    """One text i against ALL images — row-tiled variant.

    The (i, j) grid version launches B^2 programs of tiny matmuls and loses
    to XLA on grid overhead; this one runs B programs whose similarity
    matmul is [B*P, D] x [D, L] (MXU-sized) with all regions resident in
    VMEM (~5.5 MB at the DAMSM batch).

    words_ref:   [1, L, D]; regions_ref: [B, P, D] (full);
    wmask/lslot: [1, 1, L]; pslot: [B, 1, P]; out_ref: [1, 1, B].
    """
    words = words_ref[0]                               # [L, D]
    bj, pp, d = regions_ref.shape
    regions_flat = regions_ref[:].reshape(bj * pp, d)
    wmask = wmask_ref[0]                               # [1, L]
    lslot = lslot_ref[0]                               # [1, L]

    sim = jax.lax.dot_general(
        regions_flat, words, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [B*P, L]

    masked = jnp.where(wmask > 0, sim, NEG)
    masked = masked - jnp.max(masked, axis=1, keepdims=True)
    e = jnp.exp(masked)
    sm = e / jnp.sum(e, axis=1, keepdims=True)         # [B*P, L]

    sm3 = sm.reshape(bj, pp, -1)                       # [B, P, L]
    pkeep = jnp.transpose(pslot_ref[:], (0, 2, 1))     # [B, P, 1]
    a = jnp.where(pkeep > 0, gamma1 * sm3, NEG)
    a = a - jnp.max(a, axis=1, keepdims=True)
    ea = jnp.exp(a)
    attn = ea / jnp.sum(ea, axis=1, keepdims=True)     # [B, P, L]

    rc = jax.lax.dot_general(
        attn, regions_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [B, L, D]

    num = jnp.sum(rc * words[None], axis=2)            # [B, L]
    rc_n = jnp.sqrt(jnp.sum(rc * rc, axis=2))
    w_n = jnp.sqrt(jnp.sum(words * words, axis=1))     # [L]
    cos = num / jnp.maximum(rc_n * w_n[None, :], 1e-6)  # [B, L]

    t = jnp.where(lslot > 0, gamma2 * cos, NEG)        # [B, L]
    m = jnp.max(t, axis=1, keepdims=True)
    lse = (m[:, 0] + jnp.log(jnp.sum(jnp.exp(t - m), axis=1))) / gamma2
    out_ref[0] = lse.reshape(1, bj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_match_scores_fused(words, regions, word_mask,
                                 gamma1: float, gamma2: float,
                                 interpret: bool = False):
    """Drop-in fused version of
    :func:`t2igan.losses.damsm.attention_match_scores`.

    Args:
      words:   [B, L, D] word embeddings (unnormalized).
      regions: [B, P, D] region embeddings (unnormalized).
      word_mask: [B, L] bool/int, True at real tokens; or None.
      interpret: run the kernel in interpreter mode (CPU tests).
    Returns: [B_text, B_img] matching-score matrix.
    """
    from t2igan.ops.attention import l2_normalize

    wn = l2_normalize(words).astype(jnp.float32)
    rn = l2_normalize(regions).astype(jnp.float32)
    return _forward(wn, rn, word_mask, gamma1, gamma2, interpret)


def _l2norm_vjp(x, dx_normed, eps=1e-8):
    """VJP of ops.attention.l2_normalize: x -> x / (|x| + eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    denom = norm + eps
    xn = x / denom
    inner = jnp.sum(xn * dx_normed, axis=-1, keepdims=True)
    return (dx_normed - xn * inner * (norm / denom)) / denom


def _pad_operands(wn, rn, word_mask):
    """Pad words/regions/masks to tile multiples; returns padded arrays and
    the slot masks (see _kernel_rows docstring for mask semantics)."""
    b, l, d = wn.shape
    _, p, _ = rn.shape
    lp = _round_up(l, 8)
    pp = _round_up(p, 8)
    wn = jnp.pad(wn.astype(jnp.float32), ((0, 0), (0, lp - l), (0, 0)))
    rn = jnp.pad(rn.astype(jnp.float32), ((0, 0), (0, pp - p), (0, 0)))
    if word_mask is None:
        wm = jnp.ones((b, l), jnp.float32)
    else:
        wm = word_mask.astype(jnp.float32)
    # Masks carry a unit row axis so each block's trailing two dims equal the
    # overall array dims — a Mosaic lowering requirement for sub-(8,128)
    # blocks; same for the scalar output tile.
    wm = jnp.pad(wm, ((0, 0), (0, lp - l)))[:, None, :]          # [B,1,L]
    lslot = jnp.pad(jnp.ones((b, l), jnp.float32),
                    ((0, 0), (0, lp - l)))[:, None, :]
    pslot = jnp.pad(jnp.ones((b, p), jnp.float32),
                    ((0, 0), (0, pp - p)))[:, None, :]
    return wn, rn, wm, lslot, pslot, lp, pp


def _forward(wn, rn, word_mask, gamma1, gamma2, interpret):
    b, l, d = wn.shape
    wn, rn, wm, lslot, pslot, lp, pp = _pad_operands(wn, rn, word_mask)

    kernel = functools.partial(_kernel_rows, gamma1=float(gamma1),
                               gamma2=float(gamma2))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, b), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, pp, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1, pp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * b * (lp * pp * d * 2),
            bytes_accessed=b * (lp + b * pp) * d * 4,
            transcendentals=b * b * (lp * pp + lp)),
        interpret=interpret,
    )(wn, rn, wm, lslot, pslot)
    return out.reshape(b, b)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------
#
# The whole chain per (text i, image j), in normalized space, is
#   S = R Wᵀ; A = softmax_L(S | wmask); B = softmax_P(γ1 A | pslot);
#   C = Bᵀ R; cos = <C, W> / max(|C||W|, ε); out = LSE_L(γ2 cos | lslot)/γ2.
# Given the upstream dO[i, j], two kernels recompute the chain per pair and
# accumulate dW (grid over texts, image-chunks minor, accumulation directly
# into the revisited output block) and dR (grid over images, text-chunks
# minor).  Nothing of the [B, B, ...] intermediate family ever reaches HBM.


def _chain_grads(W, Rc, wmask, lslot, pslot, dO, gamma1, gamma2,
                 per_i_masks: bool):
    """Shared per-pair gradient math, vectorized over a chunk of size n.

    W: [L, D] (kernel A) or [n, L, D] (kernel B, per_i_masks=True).
    Rc: [n, P, D] (kernel A) or [P, D] broadcast (kernel B passes [n, P, D]
        by broadcasting the fixed region set).
    wmask/lslot: [1, L] or [n, 1, L]; pslot: [1, P]; dO: [n] upstream.
    Returns (dW_contrib, dR_contrib): [L, D] summed over n, and [n, P, D].
    """
    n = Rc.shape[0]
    W3 = W if W.ndim == 3 else jnp.broadcast_to(W[None], (n,) + W.shape)
    wm = wmask if per_i_masks else jnp.broadcast_to(
        wmask[None], (n, 1, wmask.shape[-1]))
    ls = lslot if per_i_masks else jnp.broadcast_to(
        lslot[None], (n, 1, lslot.shape[-1]))

    # ---- recompute the forward chain ----
    S = jax.lax.dot_general(Rc, W3, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [n, P, L]
    Sm = jnp.where(wm > 0, S, NEG)
    Sm = Sm - jnp.max(Sm, axis=2, keepdims=True)
    eA = jnp.exp(Sm)
    A = eA / jnp.sum(eA, axis=2, keepdims=True)                  # [n, P, L]

    pk = jnp.transpose(pslot)[None]                              # [1, P, 1]
    Z = jnp.where(pk > 0, gamma1 * A, NEG)
    Z = Z - jnp.max(Z, axis=1, keepdims=True)
    eB = jnp.exp(Z)
    Bm = eB / jnp.sum(eB, axis=1, keepdims=True)                 # [n, P, L]

    C = jax.lax.dot_general(Bm, Rc, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # [n, L, D]
    num = jnp.sum(C * W3, axis=2)                                # [n, L]
    r = jnp.sqrt(jnp.sum(C * C, axis=2))
    w = jnp.sqrt(jnp.sum(W3 * W3, axis=2))
    prod = r * w
    den = jnp.maximum(prod, 1e-6)
    cos = num / den
    t = jnp.where(ls[:, 0, :] > 0, gamma2 * cos, NEG)            # [n, L]
    tm = t - jnp.max(t, axis=1, keepdims=True)
    et = jnp.exp(tm)
    soft_t = et / jnp.sum(et, axis=1, keepdims=True)

    # ---- backward ----
    dcos = soft_t * dO[:, None]                                  # [n, L]
    dnum = dcos / den
    dden = jnp.where(prod > 1e-6, -dcos * num / (den * den), 0.0)
    r_safe = jnp.maximum(r, 1e-20)
    w_safe = jnp.maximum(w, 1e-20)
    dr = dden * w
    dnw = dden * r                                               # [n, L]

    dC = (dnum[:, :, None] * W3 +
          (dr / r_safe)[:, :, None] * C)                         # [n, L, D]
    dW = (dnum[:, :, None] * C +
          (dnw / w_safe)[:, :, None] * W3)                       # [n, L, D]

    dBm = jax.lax.dot_general(Rc, dC, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)  # [n,P,L]
    dR = jax.lax.dot_general(Bm, dC, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [n, P, D]

    dZ = Bm * (dBm - jnp.sum(Bm * dBm, axis=1, keepdims=True))
    dA = gamma1 * dZ
    dS = A * (dA - jnp.sum(A * dA, axis=2, keepdims=True))       # [n, P, L]

    dW = dW + jax.lax.dot_general(
        dS, Rc, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                      # [n, L, D]
    dR = dR + jax.lax.dot_general(
        dS, W3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                      # [n, P, D]

    return jnp.sum(dW, axis=0), dR


def _bwd_kernel_dw(wn_ref, rn_ref, wm_ref, ls_ref, ps_ref, do_ref,
                   dw_ref, *, gamma1, gamma2, chunk):
    """Grid (B_text, B_img/chunk): accumulate dW_i over image chunks."""
    jc = pl.program_id(1)
    W = wn_ref[0]                                   # [L, D]
    Rc = rn_ref[:]                                  # [chunk, P, D]
    dO = do_ref[0, 0, :, 0]                         # [chunk]
    dW, _ = _chain_grads(W, Rc, wm_ref[0], ls_ref[0], ps_ref[0], dO,
                         gamma1, gamma2, per_i_masks=False)

    @pl.when(jc == 0)
    def _():
        dw_ref[0] = jnp.zeros_like(dw_ref[0])

    dw_ref[0] += dW.astype(dw_ref.dtype)


def _bwd_kernel_dr(rn_ref, wn_ref, wm_ref, ls_ref, ps_ref, do_ref,
                   dr_ref, *, gamma1, gamma2, chunk):
    """Grid (B_img, B_text/chunk): accumulate dR_j over text chunks."""
    ic = pl.program_id(1)
    R = rn_ref[0]                                   # [P, D]
    Wc = wn_ref[:]                                  # [chunk, L, D]
    Rb = jnp.broadcast_to(R[None], (Wc.shape[0],) + R.shape)
    dO = do_ref[0, 0, :, 0]                         # [chunk] = dOᵀ[j, i]
    _, dR = _chain_grads(Wc, Rb, wm_ref[:], ls_ref[:], ps_ref[0], dO,
                         gamma1, gamma2, per_i_masks=True)

    @pl.when(ic == 0)
    def _():
        dr_ref[0] = jnp.zeros_like(dr_ref[0])

    dr_ref[0] += jnp.sum(dR, axis=0).astype(dr_ref.dtype)


def _backward(wn, rn, word_mask, gamma1, gamma2, interpret, g):
    b, l, d = wn.shape
    p = rn.shape[1]
    wn_p, rn_p, wm, lslot, pslot, lp, pp = _pad_operands(wn, rn, word_mask)
    chunk = 8
    bp = _round_up(b, chunk)
    padb = bp - b
    wn_p = jnp.pad(wn_p, ((0, padb), (0, 0), (0, 0)))
    rn_p = jnp.pad(rn_p, ((0, padb), (0, 0), (0, 0)))
    wm = jnp.pad(wm, ((0, padb), (0, 0), (0, 0)))
    lslot = jnp.pad(lslot, ((0, padb), (0, 0), (0, 0)))
    ps1 = pslot[:1]                                  # identical for all j
    gp = jnp.pad(g.astype(jnp.float32), ((0, padb), (0, padb)))
    # upstream grads per (row, chunk): the chunk axis is a block dimension so
    # the in-kernel load is a full aligned block, not a dynamic lane slice
    g_rows = gp.reshape(bp, 1, bp // chunk, chunk)[..., None]
    g_rows = jnp.transpose(g_rows, (0, 2, 1, 3, 4))[:, :, 0]  # [B, n_ch, ch, 1]
    g_cols = jnp.transpose(gp).reshape(bp, bp // chunk, chunk, 1)

    kw = functools.partial(_bwd_kernel_dw, gamma1=float(gamma1),
                           gamma2=float(gamma2), chunk=chunk)
    dw = pl.pallas_call(
        kw,
        out_shape=jax.ShapeDtypeStruct((bp, lp, d), jnp.float32),
        grid=(bp, bp // chunk),
        in_specs=[
            pl.BlockSpec((1, lp, d), lambda i, jc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, pp, d), lambda i, jc: (jc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i, jc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), lambda i, jc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pp), lambda i, jc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 1), lambda i, jc: (i, jc, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lp, d), lambda i, jc: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(wn_p, rn_p, wm, lslot, ps1, g_rows)

    kr = functools.partial(_bwd_kernel_dr, gamma1=float(gamma1),
                           gamma2=float(gamma2), chunk=chunk)
    dr = pl.pallas_call(
        kr,
        out_shape=jax.ShapeDtypeStruct((bp, pp, d), jnp.float32),
        grid=(bp, bp // chunk),
        in_specs=[
            pl.BlockSpec((1, pp, d), lambda j, ic: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, lp, d), lambda j, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, lp), lambda j, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, lp), lambda j, ic: (ic, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pp), lambda j, ic: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, 1), lambda j, ic: (j, ic, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pp, d), lambda j, ic: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rn_p, wn_p, wm, lslot, ps1, g_cols)

    return (dw[:b, :l].astype(wn.dtype), dr[:b, :p].astype(rn.dtype))


def _fwd(words, regions, word_mask, gamma1, gamma2, interpret):
    from t2igan.ops.attention import l2_normalize

    wn = l2_normalize(words).astype(jnp.float32)
    rn = l2_normalize(regions).astype(jnp.float32)
    out = _forward(wn, rn, word_mask, gamma1, gamma2, interpret)
    return out, (words, regions, word_mask)


def _bwd(gamma1, gamma2, interpret, residuals, g):
    """Backward dispatch.

    Default: recompute through the jnp reference and let XLA differentiate —
    measured FASTER at the train-step level than the native chunked Pallas
    backward at every batch size A/B'd on the v5e chip (bf16 DAMSM step,
    steps/sec jnp vs native: batch 16 73.0/51.5, batch 48 88.6/36.8, batch
    128 78.6/72.2 — round 2; round 1's batch-48 pair measured 197.8/84.6 on
    an idle host), because XLA overlaps the recompute with the surrounding
    CLIP backward.  The gap narrows as batch grows and the step turns
    HBM-bound; ``T2IGAN_DAMSM_NATIVE_BWD=1`` keeps the Pallas backward
    (exact to ~1e-6 of the XLA gradients) available for that regime.
    """
    import os

    words, regions, word_mask = residuals
    if os.environ.get("T2IGAN_DAMSM_NATIVE_BWD", "0") == "1" or interpret:
        from t2igan.ops.attention import l2_normalize

        wn = l2_normalize(words).astype(jnp.float32)
        rn = l2_normalize(regions).astype(jnp.float32)
        dwn, drn = _backward(wn, rn, word_mask, gamma1, gamma2, interpret, g)
        dw = _l2norm_vjp(words.astype(jnp.float32), dwn).astype(words.dtype)
        dr = _l2norm_vjp(regions.astype(jnp.float32), drn).astype(
            regions.dtype)
        return dw, dr, None

    from t2igan.losses.damsm import attention_match_scores

    _, vjp = jax.vjp(
        lambda w, r: attention_match_scores(w, r, word_mask, gamma1, gamma2),
        words, regions)
    dw, dr = vjp(g)
    return dw, dr, None


attention_match_scores_fused.defvjp(_fwd, _bwd)
