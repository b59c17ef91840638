"""Equivalence tests for the fused refinement-stage tail kernel
(ops/pallas/reschain.py) against its XLA reference, in Pallas interpret
mode on CPU.  Covers: R_NUM 1/2/3, multi-row-chunk grids (halo exchange),
image-boundary re-zeroing (the bn-shift-in-halo bug class), the fused RGB
head, and the want_h=False final-stage form.

Tolerances are f32-rounding-sized (1e-3): the kernel accumulates each conv
in a different summation order than XLA's conv, and the residual chain
amplifies the per-conv rounding multiplicatively (verified: errors scale
with chain depth and value magnitude, scattered — not clustered at tile or
image borders, which is the halo-bug signature and would be O(1)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.ops.pallas.reschain import (resblock_chain_up_fused,
                                        resblock_chain_up_reference)


def _params(rng, c, n_res, with_rgb):
    def t(*shape, scale=0.3):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * scale)

    rb = []
    for _ in range(n_res):
        rb.append((t(3, 3, c, 2 * c), t(2 * c) + 1.0, t(2 * c),
                   t(3, 3, c, c), t(c) + 1.0, t(c)))
    up_k, up_s, up_b = t(3, 3, c, c), t(c) + 1.0, t(c)
    rgb_k = t(3, 3, c // 2, 3) if with_rgb else None
    return rb, up_k, up_s, up_b, rgb_k


@pytest.mark.parametrize("n_res,with_rgb,want_h,chunks", [
    (1, False, True, 1),
    (2, False, True, 2),
    (2, True, True, 2),
    (2, True, False, 4),
    (3, False, True, 1),
])
def test_fused_matches_reference(n_res, with_rgb, want_h, chunks):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    rb, up_k, up_s, up_b, rgb_k = _params(rng, c, n_res, with_rgb)

    got = resblock_chain_up_fused(
        x, rb, up_k, up_s, up_b, rgb_kernel=rgb_k, want_h=want_h,
        row_chunk=h // chunks, interpret=True)
    want = resblock_chain_up_reference(
        x, rb, up_k, up_s, up_b, rgb_kernel=rgb_k, want_h=want_h)

    if with_rgb and want_h:
        np.testing.assert_allclose(got[0], want[0], atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(got[1], want[1], atol=1e-3, rtol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3, rtol=1e-3)


def test_boundary_rezeroing_matters():
    """With a nonzero bn shift, naive pad-once/valid-conv chaining differs
    from per-conv zero padding at the image border — verify the kernel
    handles it by checking border rows explicitly."""
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    rb, up_k, up_s, up_b, _ = _params(rng, c, 2, False)
    # exaggerate the shifts so a halo-zeroing bug is unmistakable
    rb = [(k1, s1, b1 + 3.0, k2, s2, b2 + 3.0)
          for (k1, s1, b1, k2, s2, b2) in rb]
    got = resblock_chain_up_fused(x, rb, up_k, up_s, up_b, row_chunk=4,
                                  interpret=True)
    want = resblock_chain_up_reference(x, rb, up_k, up_s, up_b)
    np.testing.assert_allclose(np.asarray(got)[:, :2], want[:, :2],
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got)[:, -2:], want[:, -2:],
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_reference_matches_module_chain():
    """The folded-weight XLA reference must equal the eval-mode module
    chain (ResBlock x R -> UpBlock) it replaces."""
    import flax.linen as nn

    from t2igan.models.generator import ResBlock, UpBlock

    class Tail(nn.Module):
        feats: int

        @nn.compact
        def __call__(self, x, train):
            x = ResBlock(self.feats)(x, train)
            x = ResBlock(self.feats)(x, train)
            return UpBlock(self.feats // 2, variant="naive")(x, train)

    rng = np.random.default_rng(2)
    b, h, w, c = 2, 8, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    tail = Tail(feats=c)
    variables = tail.init(jax.random.PRNGKey(0), x, True)
    # give running stats non-trivial values via a few train steps
    params, stats = variables["params"], variables["batch_stats"]
    for _ in range(3):
        _, mut = tail.apply({"params": params, "batch_stats": stats}, x,
                            True, mutable=["batch_stats"])
        stats = mut["batch_stats"]
    want = tail.apply({"params": params, "batch_stats": stats}, x, False)

    rb = []
    for name in ("ResBlock_0", "ResBlock_1"):
        k1 = params[name]["Conv_0"]["kernel"]
        k2 = params[name]["Conv_1"]["kernel"]
        s1, b1 = fold_bn_pair(params, stats, name, 0)
        s2, b2 = fold_bn_pair(params, stats, name, 1)
        rb.append((k1, s1, b1, k2, s2, b2))
    up_k = params["UpBlock_0"]["Conv_0"]["kernel"]
    us, ub = fold_bn_pair(params, stats, "UpBlock_0", 0)
    got = resblock_chain_up_reference(x, rb, up_k, us, ub)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def fold_bn_pair(params, stats, scope, idx):
    bn = f"BatchNorm_{idx}"
    st = stats[scope][bn]["BatchNorm_0"]
    pr = params[scope][bn]["BatchNorm_0"]
    inv = 1.0 / np.sqrt(np.asarray(st["var"]) + 1e-5)
    scale = np.asarray(pr["scale"]) * inv
    shift = np.asarray(pr["bias"]) - np.asarray(st["mean"]) * scale
    return jnp.asarray(scale), jnp.asarray(shift)


def test_nextstage_fused_tail_matches_module_chain():
    """NextStageG with the fused tail enabled (CPU -> folded-weight XLA
    reference path) must match the plain module chain in eval mode —
    verifies the fold branches declare identical params and the folded
    math is the module math."""
    from t2igan.models.generator import NextStageG

    rng = np.random.default_rng(3)
    b, hh, ww, ngf, nef, L = 2, 8, 8, 4, 16, 5
    h = jnp.asarray(rng.standard_normal((b, hh, ww, ngf)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, L, nef)).astype(np.float32))
    pad = jnp.zeros((b, L), bool)

    m_fused = NextStageG(ngf, nef, num_residual=2, upblock="naive",
                         fused_tail=True)
    m_plain = NextStageG(ngf, nef, num_residual=2, upblock="naive",
                         fused_tail=False)
    v = m_plain.init({"params": jax.random.PRNGKey(0)}, h, words, pad, True)
    # params created by the fold branch must be interchangeable
    v2 = m_fused.init({"params": jax.random.PRNGKey(0)}, h, words, pad, False)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(v2["params"])
    for a, c in zip(jax.tree.leaves(v["params"]),
                    jax.tree.leaves(v2["params"])):
        assert a.shape == c.shape

    out_p, attn_p = m_plain.apply(v, h, words, pad, False)
    out_f, attn_f = m_fused.apply(v, h, words, pad, False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_f), np.asarray(attn_p),
                               atol=1e-6, rtol=1e-6)
    # train mode is unchanged by the flag (module chain both ways)
    t_p = m_plain.apply(v, h, words, pad, True, mutable=["batch_stats"])
    t_f = m_fused.apply(v, h, words, pad, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t_f[0][0]), np.asarray(t_p[0][0]),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_gnet_fused_rgb_final_stage_matches_plain():
    """Full GNet: with the fused tail + folded RGB head (CPU reference
    path) the param tree and every output image must match the plain
    module graph."""
    from t2igan.models.generator import GNet

    rng = np.random.default_rng(4)
    b, L = 2, 5
    z = jnp.asarray(rng.standard_normal((b, 100)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((b, 32)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((b, L, 32)).astype(np.float32))
    pad = jnp.zeros((b, L), bool)
    eps = jnp.zeros((b, 16))

    kw = dict(gf_dim=4, nef=32, condition_dim=16, branch_num=3,
              num_residual=2, upblock="naive")
    g_plain = GNet(fused_tail=False, **kw)
    g_fused = GNet(fused_tail=True, **kw)
    rngs = {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}
    v = g_plain.init(rngs, z, sent, words, pad, True, eps)
    v2 = g_fused.init(rngs, z, sent, words, pad, False, eps)
    assert jax.tree.structure(v["params"]) == jax.tree.structure(v2["params"])

    out_p = g_plain.apply(v, z, sent, words, pad, False, eps)
    out_f = g_fused.apply(v, z, sent, words, pad, False, eps)
    assert len(out_f[0]) == len(out_p[0]) == 3
    for img_f, img_p in zip(out_f[0], out_p[0]):
        assert img_f.shape == img_p.shape
        np.testing.assert_allclose(np.asarray(img_f), np.asarray(img_p),
                                   atol=1e-5, rtol=1e-5)
    for a_f, a_p in zip(out_f[1], out_p[1]):
        np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_p),
                                   atol=1e-6, rtol=1e-6)
