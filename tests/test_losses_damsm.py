"""DAMSM / NT-Xent / KL loss parity tests against a torch oracle.

The oracle re-implements the reference math (losses.py:51-272, nt_xent.py,
pretrain_DAMSM.py:58-79) directly with torch on CPU, per-sample loops and
all, and the vectorized JAX implementations must match to float32 tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2igan.losses import (attention_match_scores, kl_loss, nt_xent_loss,
                           sent_loss, strip_special_tokens, words_loss)

B, L, P, D = 6, 9, 49, 32
G1, G2, G3 = 4.0, 5.0, 10.0


def _l2norm_t(x, dim):
    return x / (x.pow(2).sum(dim=dim, keepdim=True).sqrt() + 1e-8)


def _oracle_similarity(word, context, wmask, g1, g2):
    """Reference similarity_text_image semantics (losses.py:95-216) for one
    caption broadcast over all images. word/context: [B, D, L]/[B, D, P]."""
    contextT = _l2norm_t(context.transpose(1, 2), dim=2)       # [B, P, D]
    queryT = _l2norm_t(word.transpose(1, 2), dim=2)            # [B, L, D]
    sim = torch.bmm(queryT, contextT.transpose(1, 2))          # [B, L, P]
    sim = sim.masked_fill(~wmask.unsqueeze(-1), -float("inf"))
    sim = sim.transpose(1, 2)                                  # [B, P, L]
    sm = F.softmax(sim, dim=-1)
    attn = F.softmax(g1 * sm, dim=1).permute(0, 2, 1)          # [B, L, P]
    rc = torch.bmm(attn, contextT)                             # [B, L, D]
    cos = F.cosine_similarity(rc, queryT, dim=2, eps=1e-6)     # [B, L]
    r = (g2 * cos).exp().sum(dim=1).pow(1.0 / g2).log()
    return r


def _oracle_words_loss(regions, words, class_ids, wmask, g1, g2, g3):
    """Reference words_loss loop (losses.py:219-272)."""
    b = regions.shape[0]
    sims = []
    for i in range(b):
        word = words[i].unsqueeze(0).repeat(b, 1, 1)
        wm = wmask[i].unsqueeze(0).repeat(b, 1)
        sims.append(_oracle_similarity(word, regions, wm, g1, g2))
    sims = torch.stack(sims) * g3                              # [B_text, B_img]
    mask = torch.from_numpy(
        (class_ids[:, None] == class_ids[None, :]) & ~np.eye(b, dtype=bool))
    sims = sims.masked_fill(mask, -float("inf"))
    labels = torch.arange(b)
    return (F.cross_entropy(sims, labels).item(),
            F.cross_entropy(sims.t(), labels).item())


@pytest.fixture
def data(rng):
    words = rng.standard_normal((B, L, D)).astype(np.float32)
    regions = rng.standard_normal((B, P, D)).astype(np.float32)
    lens = rng.integers(3, L + 1, size=B)
    wmask = (np.arange(L)[None, :] < lens[:, None])
    class_ids = rng.integers(0, 3, size=B)  # collisions on purpose
    return words, regions, wmask, class_ids


def test_words_loss_matches_torch_oracle(data):
    words, regions, wmask, class_ids = data
    # torch layout is [B, D, L] (channel-first)
    ref0, ref1 = _oracle_words_loss(
        torch.from_numpy(regions).transpose(1, 2).contiguous(),
        torch.from_numpy(words).transpose(1, 2).contiguous(),
        class_ids, torch.from_numpy(wmask), G1, G2, G3)
    l0, l1 = words_loss(jnp.asarray(regions), jnp.asarray(words),
                        jnp.asarray(class_ids), jnp.asarray(wmask),
                        G1, G2, G3)
    np.testing.assert_allclose(float(l0), ref0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), ref1, rtol=2e-5, atol=2e-5)


def test_words_loss_no_class_mask(data):
    words, regions, wmask, _ = data
    distinct = np.arange(B)
    ref0, ref1 = _oracle_words_loss(
        torch.from_numpy(regions).transpose(1, 2).contiguous(),
        torch.from_numpy(words).transpose(1, 2).contiguous(),
        distinct, torch.from_numpy(wmask), G1, G2, G3)
    l0, l1 = words_loss(jnp.asarray(regions), jnp.asarray(words),
                        jnp.asarray(distinct), jnp.asarray(wmask), G1, G2, G3)
    np.testing.assert_allclose(float(l0), ref0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), ref1, rtol=2e-5, atol=2e-5)


def test_pad_mask_invariant_attention(data):
    """Padded word slots are fully masked out of the attention path (the
    reference's inline 'TEST 1/2', losses.py:133-159): ANY perturbation of a
    padded word's embedding must leave ``word_region_attention``'s outputs
    unchanged — the per-patch softmax forces padded columns to ~0 weight and
    the per-word patch distribution/context depend only on those columns."""
    from t2igan.ops.attention import word_region_attention

    words, regions, wmask, _ = data
    assert (~wmask).any(), "fixture must contain padded slots"
    ctx_a, attn_a = word_region_attention(
        jnp.asarray(words), jnp.asarray(regions), jnp.asarray(wmask), G1)
    words2 = words.copy()
    words2[~wmask] = words2[~wmask] * -3.0 + 100.0  # arbitrary perturbation
    ctx_b, attn_b = word_region_attention(
        jnp.asarray(words2), jnp.asarray(regions), jnp.asarray(wmask), G1)
    np.testing.assert_allclose(np.asarray(attn_a), np.asarray(attn_b),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ctx_a), np.asarray(ctx_b),
                               rtol=1e-6, atol=1e-7)


def test_pad_mask_invariant_matching_scores(data):
    """R(Q,D) keeps the padded words' own (uniform-attention) cosine terms in
    its log-sum-exp — reference behavior, losses.py:199-203 — and those terms
    depend on the padded embedding only through its l2-normalized DIRECTION.
    So rescaling padded slots by a positive factor must leave the full
    matching-score matrix and the loss exactly invariant."""
    words, regions, wmask, class_ids = data
    assert (~wmask).any(), "fixture must contain padded slots"
    sims_a = attention_match_scores(jnp.asarray(words), jnp.asarray(regions),
                                    jnp.asarray(wmask), G1, G2)
    la0, la1 = words_loss(jnp.asarray(regions), jnp.asarray(words),
                          jnp.asarray(class_ids), jnp.asarray(wmask),
                          G1, G2, G3)
    words2 = words.copy()
    words2[~wmask] *= 7.25  # positive rescale: direction unchanged
    sims_b = attention_match_scores(jnp.asarray(words2), jnp.asarray(regions),
                                    jnp.asarray(wmask), G1, G2)
    lb0, lb1 = words_loss(jnp.asarray(regions), jnp.asarray(words2),
                          jnp.asarray(class_ids), jnp.asarray(wmask),
                          G1, G2, G3)
    np.testing.assert_allclose(np.asarray(sims_a), np.asarray(sims_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(la0), float(lb0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(la1), float(lb1), rtol=1e-5, atol=1e-6)
    # And a DIRECTION change at padded slots may move only the padded terms:
    # the real-word attention rows stay pinned (covered above), so the score
    # shift is bounded by the padded slots' worst-case logsumexp contribution.
    words3 = words.copy()
    words3[~wmask] = -words3[~wmask]
    sims_c = attention_match_scores(jnp.asarray(words3), jnp.asarray(regions),
                                    jnp.asarray(wmask), G1, G2)
    # |R_c - R_a| <= (1/g2) * log(1 + n_pad_i * exp(2*g2)) worst case; the
    # meaningful assertion is that scores with NO padded rows are untouched.
    full_rows = wmask.all(axis=1)
    if full_rows.any():
        np.testing.assert_allclose(np.asarray(sims_c)[full_rows],
                                   np.asarray(sims_a)[full_rows],
                                   rtol=1e-5, atol=1e-6)


def test_sent_loss_matches_torch_oracle(data):
    _, _, _, class_ids = data
    rng = np.random.default_rng(1)
    cnn = rng.standard_normal((B, D)).astype(np.float32)
    rnn = rng.standard_normal((B, D)).astype(np.float32)
    # torch oracle (losses.py:51-91)
    c, r = torch.from_numpy(cnn), torch.from_numpy(rnn)
    scores = (c @ r.t()) / (c.norm(dim=1, keepdim=True) @
                            r.norm(dim=1, keepdim=True).t()).clamp(min=1e-8)
    scores = scores * G3
    mask = torch.from_numpy(
        (class_ids[:, None] == class_ids[None, :]) & ~np.eye(B, dtype=bool))
    scores = scores.masked_fill(mask, -float("inf"))
    labels = torch.arange(B)
    ref0 = F.cross_entropy(scores, labels).item()
    ref1 = F.cross_entropy(scores.t(), labels).item()
    l0, l1 = sent_loss(jnp.asarray(cnn), jnp.asarray(rnn),
                       jnp.asarray(class_ids), G3)
    np.testing.assert_allclose(float(l0), ref0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(l1), ref1, rtol=2e-5, atol=2e-5)


def test_nt_xent_matches_torch_oracle(rng):
    b, d = 8, 16
    zi = rng.standard_normal((b, d)).astype(np.float32)
    zj = rng.standard_normal((b, d)).astype(np.float32)
    # torch oracle (nt_xent.py:16-35 with masks.py mask)
    t = 0.5
    z = torch.from_numpy(np.concatenate([zi, zj], 0))
    sim = F.cosine_similarity(z.unsqueeze(1), z.unsqueeze(0), dim=2) / t
    sim_ij = torch.diag(sim, b)
    sim_ji = torch.diag(sim, -b)
    pos = torch.cat([sim_ij, sim_ji]).reshape(2 * b, 1)
    mask = torch.ones((2 * b, 2 * b), dtype=bool).fill_diagonal_(0)
    for i in range(b):
        mask[i, b + i] = 0
        mask[b + i, i] = 0
    neg = sim[mask].reshape(2 * b, -1)
    logits = torch.cat([pos, neg], dim=1)
    ref = F.cross_entropy(logits, torch.zeros(2 * b, dtype=torch.long),
                          reduction="sum").item() / (2 * b)
    ours = float(nt_xent_loss(jnp.asarray(zi), jnp.asarray(zj), t))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_kl_loss_matches_reference_formula(rng):
    mu = rng.standard_normal((4, 16)).astype(np.float32)
    logvar = rng.standard_normal((4, 16)).astype(np.float32) * 0.1
    ref = -0.5 * np.mean(1 + logvar - mu ** 2 - np.exp(logvar))
    ours = float(kl_loss(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def _oracle_rm_special(mask, words):
    """Reference rm_special_token loop (pretrain_DAMSM.py:58-79)."""
    bsz, n, _ = words.shape
    out_w, out_m = [], []
    for i in range(bsz):
        if mask[i].sum() == n:
            out_w.append(words[i, 1:-1])
            out_m.append(mask[i, 1:-1])
        else:
            eos = int(torch.where(mask[i] == 0)[0].min())
            out_w.append(torch.cat([words[i, 1:eos - 1], words[i, eos:]], 0))
            out_m.append(torch.cat([mask[i, 1:eos - 1], mask[i, eos:]], 0))
    return torch.stack(out_w), torch.stack(out_m)


def test_strip_special_tokens_matches_oracle(rng):
    bsz, n, d = 5, 12, 8
    words = rng.standard_normal((bsz, n, d)).astype(np.float32)
    lens = np.array([12, 5, 3, 11, 7])  # n_real tokens incl. sos/eos
    mask = (np.arange(n)[None, :] < lens[:, None]).astype(np.int64)
    ref_w, ref_m = _oracle_rm_special(torch.from_numpy(mask),
                                      torch.from_numpy(words))
    w, m = strip_special_tokens(jnp.asarray(words), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m), ref_m.numpy().astype(bool))
