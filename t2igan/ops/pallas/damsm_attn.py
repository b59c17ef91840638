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
    return _forward(words, regions, word_mask, gamma1, gamma2, interpret)


def _forward(words, regions, word_mask, gamma1, gamma2, interpret):
    from t2igan.ops.attention import l2_normalize

    b, l, d = words.shape
    _, p, _ = regions.shape
    lp = _round_up(l, 8)
    pp = _round_up(p, 8)

    wn = l2_normalize(words).astype(jnp.float32)
    rn = l2_normalize(regions).astype(jnp.float32)
    wn = jnp.pad(wn, ((0, 0), (0, lp - l), (0, 0)))
    rn = jnp.pad(rn, ((0, 0), (0, pp - p), (0, 0)))
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


def _fwd(words, regions, word_mask, gamma1, gamma2, interpret):
    out = _forward(words, regions, word_mask, gamma1, gamma2, interpret)
    return out, (words, regions, word_mask)


def _bwd(gamma1, gamma2, interpret, residuals, g):
    from t2igan.losses.damsm import attention_match_scores

    words, regions, word_mask = residuals
    _, vjp = jax.vjp(
        lambda w, r: attention_match_scores(w, r, word_mask, gamma1, gamma2),
        words, regions)
    dw, dr = vjp(g)
    return dw, dr, None


attention_match_scores_fused.defvjp(_fwd, _bwd)
