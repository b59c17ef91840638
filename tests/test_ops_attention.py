"""Attention-op parity tests vs torch oracles.

Oracle mirrors ``func_attention`` (GlobalAttention.py:38-160) and the
intended ``Memory.forward`` semantics (model.py:406-452)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from t2igan.ops.attention import (l2_normalize, masked_softmax, memory_read,
                                  word_region_attention)

B, L, P, D = 3, 7, 16, 12


def _l2t(x, dim):
    return x / (x.pow(2).sum(dim=dim, keepdim=True).sqrt() + 1e-8)


def test_l2_normalize_matches_reference(rng):
    x = rng.standard_normal((4, 9)).astype(np.float32)
    ours = np.asarray(l2_normalize(jnp.asarray(x)))
    ref = _l2t(torch.from_numpy(x), 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_word_region_attention_matches_func_attention(rng):
    """func_attention semantics: normalized sim, pad-masked per-patch
    softmax over words, gamma1-softmax over patches, context from the
    normalized regions (GlobalAttention.py:38-160)."""
    words = rng.standard_normal((B, L, D)).astype(np.float32)
    regions = rng.standard_normal((B, P, D)).astype(np.float32)
    lens = rng.integers(2, L + 1, size=B)
    mask = np.arange(L)[None, :] < lens[:, None]
    g1 = 4.0

    ctx, attn = word_region_attention(jnp.asarray(words),
                                      jnp.asarray(regions),
                                      jnp.asarray(mask), g1)

    wn = _l2t(torch.from_numpy(words), 2)
    rn = _l2t(torch.from_numpy(regions), 2)
    sim = torch.bmm(rn, wn.transpose(1, 2))                 # [B, P, L]
    sim = sim.masked_fill(~torch.from_numpy(mask)[:, None, :],
                          -float("inf"))
    a = F.softmax(sim, dim=-1)                              # per patch
    a2 = F.softmax(g1 * a, dim=1)                           # over patches
    ref_ctx = torch.einsum("bpl,bpd->bld", a2, rn)

    np.testing.assert_allclose(np.asarray(attn), a.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctx), ref_ctx.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_memory_read_matches_oracle(rng):
    q = rng.standard_normal((B, 4, 4, D)).astype(np.float32)
    k = rng.standard_normal((B, L, D)).astype(np.float32)
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    lens = rng.integers(2, L + 1, size=B)
    pad = ~(np.arange(L)[None, :] < lens[:, None])

    read, attn = memory_read(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             jnp.asarray(pad))

    qt = torch.from_numpy(q.reshape(B, 16, D))
    logits = torch.bmm(qt, torch.from_numpy(k).transpose(1, 2))
    logits = logits.masked_fill(torch.from_numpy(pad)[:, None, :],
                                -float("inf"))
    a = F.softmax(logits, dim=-1)
    ref = torch.bmm(a, torch.from_numpy(v)).reshape(B, 4, 4, D)
    np.testing.assert_allclose(np.asarray(read), ref.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(attn).reshape(B, 16, L),
                               a.numpy(), rtol=1e-5, atol=1e-6)


def test_masked_softmax_fully_masked_row_is_uniform():
    logits = jnp.zeros((1, 3))
    mask = jnp.zeros((1, 3), bool)
    out = np.asarray(masked_softmax(logits, mask))
    np.testing.assert_allclose(out, np.full((1, 3), 1 / 3), rtol=1e-6)
