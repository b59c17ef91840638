"""Generator / discriminator structural and numerical tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from t2igan.models.discriminator import DNetWithHeads
from t2igan.models.factory import build_discriminators, build_generator
from t2igan.models.generator import GNet, glu
from t2igan.ops.image import upsample_nearest_2x
from t2igan.ops.spectral import SNConv

B, L = 2, 8
SMALL = dict(gf_dim=16, nef=24, condition_dim=20, branch_num=3,
             num_residual=2)


def _small_gen_inputs(rng):
    z = jnp.asarray(rng.standard_normal((B, 100)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((B, 24)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((B, L, 24)).astype(np.float32))
    pad = jnp.asarray(np.array([[False] * 5 + [True] * 3,
                                [False] * 7 + [True] * 1]))
    return z, sent, words, pad


def test_glu_matches_torch_semantics(rng):
    import torch
    x = rng.standard_normal((3, 10)).astype(np.float32)
    ours = np.asarray(glu(jnp.asarray(x)))
    t = torch.from_numpy(x)
    ref = (t[:, :5] * torch.sigmoid(t[:, 5:])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_upsample_nearest_2x(rng):
    x = rng.standard_normal((1, 3, 3, 2)).astype(np.float32)
    y = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    assert y.shape == (1, 6, 6, 2)
    np.testing.assert_array_equal(y[0, ::2, ::2], x[0])
    np.testing.assert_array_equal(y[0, 1::2, ::2], x[0])
    np.testing.assert_array_equal(y[0, ::2, 1::2], x[0])


def test_conv3x3_on_up2x_equals_naive(rng):
    """The subpixel rewrite is output-equivalent to conv3x3(nearest_up2(x))
    with padding=1 — the exact op pair the reference's upBlock computes
    (model.py:104-110)."""
    from t2igan.ops.image import conv3x3_on_up2x

    for h, w, cin, cout in ((5, 7, 3, 4), (4, 4, 8, 16), (1, 1, 2, 2)):
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
        naive = jax.lax.conv_general_dilated(
            upsample_nearest_2x(x), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fused = conv3x3_on_up2x(x, k)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                                   rtol=1e-5, atol=1e-5)


def test_conv3x3_on_up2x_dilated_equals_naive(rng):
    """The input-dilated form (the production default) is output-equivalent
    to conv3x3(nearest_up2(x)) with padding=1."""
    from t2igan.ops.image import conv3x3_on_up2x_dilated

    for h, w, cin, cout in ((5, 7, 3, 4), (4, 4, 8, 16), (1, 1, 2, 2)):
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32))
        naive = jax.lax.conv_general_dilated(
            upsample_nearest_2x(x), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fused = conv3x3_on_up2x_dilated(x, k)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("variant", ["subpixel", "dilated"])
def test_upblock_variant_equivalence(rng, monkeypatch, variant):
    """UpBlock's T2IGAN_UPBLOCK variants share one param tree and produce
    the same outputs as the reference-literal naive form."""
    from t2igan.models.generator import UpBlock

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    block = UpBlock(features=4)
    monkeypatch.setenv("T2IGAN_UPBLOCK", "naive")
    variables = block.init(jax.random.PRNGKey(0), x, False)
    naive = block.apply(variables, x, False)
    monkeypatch.setenv("T2IGAN_UPBLOCK", variant)
    fused = block.apply(variables, x, False)
    assert naive.shape == fused.shape == (2, 12, 12, 4)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


def test_up2x_bn_glu_rgb_phased_equals_chain(rng):
    """The phase-space eval tail (ops/image.py::up2x_bn_glu_rgb_phased) is
    output-equivalent to the module chain it replaces: conv3x3(nearest_up2)
    + eval-BN affine + GLU + conv3x3->3 + tanh (model.py:104-110 +
    536-547)."""
    from t2igan.ops.image import up2x_bn_glu_rgb_phased

    def conv(x, k, pad):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for h, w, cin, f in ((5, 7, 3, 4), (8, 8, 6, 5), (1, 1, 2, 2)):
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
        k_up = jnp.asarray(
            rng.standard_normal((3, 3, cin, 2 * f)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(2 * f).astype(np.float32))
        shift = jnp.asarray(rng.standard_normal(2 * f).astype(np.float32))
        k_rgb = jnp.asarray(
            rng.standard_normal((3, 3, f, 3)).astype(np.float32))
        chain = jnp.tanh(conv(
            glu(conv(upsample_nearest_2x(x), k_up,
                     ((1, 1), (1, 1))) * scale + shift),
            k_rgb, ((1, 1), (1, 1))))
        phased = up2x_bn_glu_rgb_phased(x, k_up, scale, shift, k_rgb)
        # 1e-4: the BN scale is folded into the conv kernel (fusion-critical,
        # see the op docstring), which reassociates scale*sum(k*x) to
        # sum((scale*k)*x).
        np.testing.assert_allclose(np.asarray(phased), np.asarray(chain),
                                   rtol=1e-4, atol=1e-4)


def test_gnet_phased_tail_equivalence(rng, monkeypatch):
    """GAN.PHASED_TAIL shares the plain path's param tree and produces the
    same eval pyramid (up to float reassociation)."""
    z, sent, words, pad = _small_gen_inputs(rng)
    eps = jnp.zeros((B, 20))
    monkeypatch.delenv("T2IGAN_PHASED_TAIL", raising=False)
    plain = GNet(**SMALL)
    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, train=False, ca_eps=eps)
    imgs0, att0, _, _ = plain.apply(variables, z, sent, words, pad,
                                    train=False, ca_eps=eps)
    phased = GNet(**SMALL, phased_tail=True)
    imgs1, att1, _, _ = phased.apply(variables, z, sent, words, pad,
                                     train=False, ca_eps=eps)
    assert [i.shape for i in imgs0] == [i.shape for i in imgs1]
    for a, b in zip(imgs0, imgs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(att0, att1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_phase_batch_stats_matches_flax(rng):
    """phase_batch_stats computes EXACTLY the statistics flax's
    nn.BatchNorm would compute on the hi-res pre-GLU UpBlock output
    (mean/var per channel over (N, 2H, 2W)): halo-masked reduction over
    the phase tensor, f32, fast variance."""
    from flax.linen.normalization import _compute_stats
    from t2igan.ops.image import phase_batch_stats, up2x_phase_conv

    for h, w, cin, f in ((5, 7, 3, 4), (8, 8, 6, 5), (1, 1, 2, 2)):
        x = jnp.asarray(rng.standard_normal((3, h, w, cin)).astype(np.float32))
        k_up = jnp.asarray(
            rng.standard_normal((3, 3, cin, 2 * f)).astype(np.float32))
        hi = jax.lax.conv_general_dilated(
            upsample_nearest_2x(x), k_up, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref_mean, ref_var = _compute_stats(hi, (0, 1, 2), dtype=None)
        mean, var = phase_batch_stats(up2x_phase_conv(x, k_up))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                                   rtol=1e-4, atol=1e-5)


def test_phase_bn_glu_rgb_train_matches_chain(rng):
    """The train-mode phased tail (raw phase conv + halo-masked batch
    stats + phase_bn_glu_rgb_train) is output-equivalent to the module
    chain: conv3x3(nearest_up2) + batch-stat BN + GLU + conv3x3->3 + tanh
    (model.py:104-110 + 536-547)."""
    from t2igan.ops.image import (phase_batch_stats, phase_bn_glu_rgb_train,
                                  up2x_phase_conv)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for h, w, cin, f in ((5, 7, 3, 4), (8, 8, 6, 5), (1, 1, 2, 2)):
        x = jnp.asarray(rng.standard_normal((3, h, w, cin)).astype(np.float32))
        k_up = jnp.asarray(
            rng.standard_normal((3, 3, cin, 2 * f)).astype(np.float32))
        gamma = jnp.asarray(
            (1 + 0.1 * rng.standard_normal(2 * f)).astype(np.float32))
        beta = jnp.asarray(rng.standard_normal(2 * f).astype(np.float32))
        k_rgb = jnp.asarray(
            rng.standard_normal((3, 3, f, 3)).astype(np.float32))
        hi = conv(upsample_nearest_2x(x), k_up)
        mu = jnp.mean(hi, axis=(0, 1, 2))
        var_ref = jnp.mean(jnp.square(hi), axis=(0, 1, 2)) - jnp.square(mu)
        norm = (hi - mu) * jax.lax.rsqrt(var_ref + 1e-5) * gamma + beta
        chain = jnp.tanh(conv(glu(norm), k_rgb))
        y = up2x_phase_conv(x, k_up)
        mean, var = phase_batch_stats(y)
        phased = phase_bn_glu_rgb_train(y, mean, var, gamma, beta, k_rgb)
        np.testing.assert_allclose(np.asarray(phased), np.asarray(chain),
                                   rtol=1e-4, atol=1e-4)


def test_gnet_phased_tail_train_equivalence(rng, monkeypatch):
    """GAN.PHASED_TAIL_TRAIN shares the plain path's param tree and
    produces the same TRAIN-mode pyramid, the same updated running
    batch_stats, and the same parameter gradients (up to float
    reassociation)."""
    z, sent, words, pad = _small_gen_inputs(rng)
    eps = jnp.zeros((B, 20))
    monkeypatch.delenv("T2IGAN_PHASED_TAIL_TRAIN", raising=False)
    plain = GNet(**SMALL)
    variables = plain.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, train=True, ca_eps=eps)
    phased = GNet(**SMALL, phased_tail_train=True)

    def run(model):
        def loss_fn(params):
            (imgs, att, _, _), upd = model.apply(
                {**variables, "params": params}, z, sent, words, pad,
                train=True, ca_eps=eps, mutable=["batch_stats"])
            return sum(jnp.mean(jnp.square(i)) for i in imgs), (imgs, upd)
        (loss, (imgs, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        return loss, imgs, upd, grads

    loss0, imgs0, upd0, g0 = run(plain)
    loss1, imgs1, upd1, g1 = run(phased)
    assert [i.shape for i in imgs0] == [i.shape for i in imgs1]
    for a, b in zip(imgs0, imgs1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # identical running-stat updates (paths AND values)
    f0 = jax.tree_util.tree_leaves_with_path(upd0["batch_stats"])
    f1 = jax.tree_util.tree_leaves_with_path(upd1["batch_stats"])
    assert [p for p, _ in f0] == [p for p, _ in f1]
    for (_, a), (_, b) in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # identical parameter gradients through the phase-space tail
    np.testing.assert_allclose(loss0, loss1, rtol=1e-5)
    for (p0, a), (p1, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=str(p0))


@pytest.mark.slow
def test_generator_pyramid_shapes(rng):
    model = GNet(**SMALL)
    z, sent, words, pad = _small_gen_inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, train=True)
    (imgs, atts, mu, logvar), _ = model.apply(
        variables, z, sent, words, pad, train=True,
        rngs={"gaussian": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert [i.shape for i in imgs] == [(B, 64, 64, 3), (B, 128, 128, 3),
                                       (B, 256, 256, 3)]
    assert atts[0].shape == (B, 64, 64, L)
    assert atts[1].shape == (B, 128, 128, L)
    assert mu.shape == (B, 20) and logvar.shape == (B, 20)
    for img in imgs:
        v = np.asarray(img)
        assert v.min() >= -1.0 and v.max() <= 1.0
        assert np.isfinite(v).all()


@pytest.mark.slow  # full G forward with attention maps: ~30s compile
def test_generator_memory_attention_masks_padding(rng):
    """Padding word slots must receive ~zero memory attention."""
    model = GNet(**SMALL)
    z, sent, words, pad = _small_gen_inputs(rng)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, train=True)
    (_, atts, _, _), _ = model.apply(
        variables, z, sent, words, pad, train=True,
        rngs={"gaussian": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    for att in atts:
        a = np.asarray(att)  # [B, H, W, L]
        assert a[0, :, :, 5:].max() < 1e-6  # sample 0 has 3 pad slots
        assert a[1, :, :, 7:].max() < 1e-6
        # rows sum to one over words
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-5)


def test_generator_ca_eps_deterministic(rng):
    """Passing explicit CA noise makes the forward reproducible."""
    model = GNet(**SMALL)
    z, sent, words, pad = _small_gen_inputs(rng)
    eps = jnp.zeros((B, 20))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        z, sent, words, pad, train=False, ca_eps=eps)
    out1 = model.apply(variables, z, sent, words, pad, train=False, ca_eps=eps)
    out2 = model.apply(variables, z, sent, words, pad, train=False, ca_eps=eps)
    np.testing.assert_array_equal(np.asarray(out1[0][-1]),
                                  np.asarray(out2[0][-1]))


@pytest.mark.parametrize("size", [64, 128, 256])
def test_discriminator_shapes(rng, size):
    ndf, nef = 8, 24
    model = DNetWithHeads(ndf=ndf, nef=nef, img_size=size)
    x = jnp.asarray(rng.standard_normal((B, size, size, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B, nef)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, c)
    (h, cond, uncond), new_vars = model.apply(variables, x, c,
                                              mutable=["spectral"])
    assert h.shape == (B, 4, 4, ndf * 8)
    assert cond.shape == (B,) and uncond.shape == (B,)
    assert np.isfinite(np.asarray(cond)).all()
    assert "spectral" in new_vars


def test_spectral_norm_constrains_sigma(rng):
    """After repeated power iterations the effective top singular value of
    the normalized kernel approaches 1 (spectral.py:23-35 semantics)."""
    conv = SNConv(8, (3, 3))
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    variables = conv.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    spectral = variables["spectral"]
    for _ in range(30):
        _, upd = conv.apply({"params": params, "spectral": spectral}, x,
                            mutable=["spectral"])
        spectral = upd["spectral"]
    k = np.asarray(params["kernel"])
    w2d = k.transpose(3, 0, 1, 2).reshape(k.shape[3], -1)
    true_sigma = np.linalg.svd(w2d, compute_uv=False)[0]
    u = np.asarray(spectral["u"])
    v = np.asarray(spectral["v"])
    est = float(u @ w2d @ v)
    np.testing.assert_allclose(est, true_sigma, rtol=1e-3)


def test_factory_builds_from_config():
    cfg = cfg_replace(Config(), GAN={"GF_DIM": 64, "DF_DIM": 32})
    g = build_generator(cfg)
    assert g.gf_dim == 64 and g.branch_num == 3
    ds = build_discriminators(cfg)
    assert [d.img_size for d in ds] == [64, 128, 256]
    assert all(d.b_jcu for d in ds)


@pytest.mark.slow
def test_gdcgan_single_output(rng):
    """B_DCGAN variant: one RGB head at the final scale (model.py:601-641)."""
    from t2igan.models.generator import GDCGan

    m = GDCGan(gf_dim=8, nef=16, condition_dim=8, branch_num=2,
               num_residual=1)
    z = jnp.zeros((2, 16))
    sent = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    words = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    pad = jnp.zeros((2, 6), bool)
    eps = jnp.zeros((2, 8))
    v = m.init({"params": jax.random.PRNGKey(0),
                "gaussian": jax.random.PRNGKey(1)},
               z, sent, words, pad, False, eps)
    imgs, atts, mu, lv = m.apply(v, z, sent, words, pad, False, eps)
    assert len(imgs) == 1 and imgs[0].shape == (2, 128, 128, 3)
    assert len(atts) == 1
    imgs2, atts2, _, _ = m.apply(v, z, sent, words, pad, False, eps, False)
    assert len(atts2) == 0  # return_attn=False
    np.testing.assert_allclose(np.asarray(imgs[0]), np.asarray(imgs2[0]),
                               rtol=1e-5, atol=1e-6)


def test_discriminator_rejects_sub64_pyramid():
    """The D trunk downsamples 16x to a 4x4 code; a <64 branch must fail
    loudly at build time, not as a lax.concatenate shape error mid-trace."""
    cfg = cfg_replace(Config(), TREE={"BASE_SIZE": 16, "BRANCH_NUM": 3})
    with pytest.raises(ValueError, match="BASE_SIZE"):
        build_discriminators(cfg)


def test_dnet_rejects_mismatched_input_size():
    d = DNetWithHeads(ndf=8, nef=32, img_size=64)
    with pytest.raises(ValueError, match="D_NET64"):
        d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               method=DNetWithHeads.features)
