"""Evaluation stack tests: inception blocks vs torch functional oracles,
converter roundtrip, Fréchet distance vs scipy sqrtm, IS math, R-precision
plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from t2igan.evaluation.fid import frechet_distance
from t2igan.evaluation.inception_score import inception_score_from_preds
from t2igan.models.inception import (InceptionV3, _avg_pool3x3, _max_pool,
                                     convert_torch_inception_state,
                                     preprocess)


def test_avg_pool_count_include_pad(rng):
    x = rng.standard_normal((2, 7, 7, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for include in (True, False):
        ours = np.asarray(_avg_pool3x3(jnp.asarray(x), include))
        ref = F.avg_pool2d(xt, 3, 1, 1, count_include_pad=include)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ours = np.asarray(_max_pool(jnp.asarray(x), 3, 2))
    ref = F.max_pool2d(xt, 3, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    ours = np.asarray(_max_pool(jnp.asarray(x), 3, 1, 1))
    ref = F.max_pool2d(xt, 3, 1, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("variant,classes", [("fid", 1008),
                                             ("torchvision", 1000)])
def test_inception_forward_taps(variant, classes):
    model = InceptionV3(variant=variant, num_classes=classes)
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pool1"].shape[-1] == 64
    assert out["pool2"].shape[-1] == 192
    assert out["mixed6e"].shape[-1] == 768
    assert out["pool3"].shape == (1, 2048)
    assert out["logits"].shape == (1, classes)


def _flax_to_torch_sd(params, batch_stats):
    """Inverse of convert_torch_inception_state, used to synthesize a
    torch-named state dict from a flax init."""
    sd = {}

    def walk(node, stats, prefix):
        for k, v in node.items():
            path = prefix + [k]
            if k == "conv":
                sd[".".join(prefix) + ".conv.weight"] = np.transpose(
                    np.asarray(v["kernel"]), (3, 2, 0, 1))
            elif k == "bn":
                base = ".".join(prefix) + ".bn."
                sd[base + "weight"] = np.asarray(v["scale"])
                sd[base + "bias"] = np.asarray(v["bias"])
                st = stats
                for p in prefix:
                    st = st[p]
                sd[base + "running_mean"] = np.asarray(st["bn"]["mean"])
                sd[base + "running_var"] = np.asarray(st["bn"]["var"])
            elif k == "fc":
                sd["fc.weight"] = np.asarray(v["kernel"]).T
                sd["fc.bias"] = np.asarray(v["bias"])
            elif isinstance(v, dict):
                walk(v, stats, path)

    walk(params, batch_stats, [])
    return sd


@pytest.mark.slow
def test_converter_roundtrip():
    model = InceptionV3(variant="fid", num_classes=1008)
    x = jnp.zeros((1, 75, 75, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    # randomize batch stats so the roundtrip is nontrivial
    rngs = np.random.default_rng(0)
    bs = jax.tree.map(
        lambda a: jnp.asarray(
            np.abs(rngs.standard_normal(a.shape)).astype(np.float32)),
        variables["batch_stats"])
    sd = _flax_to_torch_sd(variables["params"], bs)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1,))  # must be ignored
    restored = convert_torch_inception_state(sd, num_classes=1008)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        {"params": variables["params"], "batch_stats": bs}, restored)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 75, 75, 3)).astype(np.float32))
    out1 = model.apply({"params": variables["params"], "batch_stats": bs},
                       preprocess(img, 150))
    out2 = model.apply(restored, preprocess(img, 150))
    np.testing.assert_allclose(np.asarray(out1["pool3"]),
                               np.asarray(out2["pool3"]), rtol=1e-5)


def test_frechet_distance_vs_scipy(rng):
    import scipy.linalg

    d = 16
    a = rng.standard_normal((100, d))
    b = rng.standard_normal((120, d)) * 1.5 + 0.3
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
    covmean = scipy.linalg.sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    ref = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
           - 2 * np.trace(covmean))
    ours = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_frechet_distance_identical_is_zero(rng):
    d = 8
    a = rng.standard_normal((50, d))
    mu, s = a.mean(0), np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_inception_score_math(rng):
    n, c = 200, 10
    logits = rng.standard_normal((n, c))
    preds = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    mean, std = inception_score_from_preds(preds, splits=10)
    # manual per-split computation
    scores = []
    for k in range(10):
        part = preds[k * 20:(k + 1) * 20]
        py = part.mean(0)
        kl = np.mean([np.sum(p * (np.log(p + 1e-16) - np.log(py + 1e-16)))
                      for p in part])
        scores.append(np.exp(kl))
    np.testing.assert_allclose(mean, np.mean(scores), rtol=1e-6)
    np.testing.assert_allclose(std, np.std(scores), rtol=1e-6)


@pytest.mark.slow  # jits the CLIP rank fn end-to-end: ~30s
def test_rprecision_plumbing(rng):
    from t2igan.evaluation.rprecision import (bootstrap_r_precision,
                                              make_rank_fn)
    from tests.test_train_steps import TINY_CLIP
    from t2igan.models.clip import ClipWithRegionHead

    model = ClipWithRegionHead(TINY_CLIP)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32))
    rank = make_rank_fn(model, variables)
    b, w, n_mis = 3, 16, 5
    imgs = jnp.asarray(rng.standard_normal((b, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 500, (b, w)), jnp.int32)
    mask = jnp.ones((b, w), jnp.int32)
    ids_m = jnp.asarray(rng.integers(0, 500, (b, n_mis, w)), jnp.int32)
    mask_m = jnp.ones((b, n_mis, w), jnp.int32)
    hits = rank(imgs, ids, mask, ids_m, mask_m)
    assert hits.shape == (b,) and hits.dtype == jnp.bool_

    # bootstrap math
    flags = np.zeros(30000)
    flags[:15000] = 1
    mean, std = bootstrap_r_precision(flags)
    assert 0.45 < mean < 0.55
    assert std < 0.05


def test_statistics_of_path_npz(tmp_path, rng):
    """Precomputed-stats path of the FID CLI (fid_score.py:191-203)."""
    from t2igan.evaluation.fid import frechet_distance, statistics_of_path

    d = 8
    a = rng.standard_normal((40, d))
    mu, sigma = a.mean(0), np.cov(a, rowvar=False)
    p = tmp_path / "stats.npz"
    np.savez(p, mu=mu, sigma=sigma)
    m2, s2 = statistics_of_path(str(p), activation_fn=None)
    np.testing.assert_allclose(m2, mu)
    assert abs(frechet_distance(mu, sigma, m2, s2)) < 1e-8


def test_list_images_and_batches(tmp_path, rng):
    from PIL import Image

    from t2igan.evaluation.fid import image_batches, list_images

    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    for i in range(5):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(sub / f"img{i}.png")
    (sub / "notes.txt").write_text("skip me")
    files = list_images(str(tmp_path))
    assert len(files) == 5
    batches = list(image_batches(files, batch_size=2, size=32))
    assert [b.shape for b in batches] == [(2, 32, 32, 3), (2, 32, 32, 3),
                                          (1, 32, 32, 3)]
    assert batches[0].max() <= 1.0 and batches[0].min() >= 0.0


@pytest.mark.parametrize("shape", [
    pytest.param((256, 256, 299, 299), marks=pytest.mark.slow),
    pytest.param((500, 375, 299, 299), marks=pytest.mark.slow),
    (32, 32, 299, 299), (64, 48, 32, 32)])
def test_resize_bilinear_torch_matches_interpolate(rng, shape):
    """resize_bilinear_torch == F.interpolate(bilinear, align_corners=False)
    — the kernel pytorch-fid resizes with (inception.py:143-147).  The
    residual is torch computing source coords in f32 vs our f64."""
    from t2igan.ops.image import resize_bilinear_torch, resize_bilinear_torch_np

    h, w, oh, ow = shape
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), (oh, ow),
                        mode="bilinear", align_corners=False)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear_torch(jnp.asarray(x), oh, ow))
    np.testing.assert_allclose(got, ref, atol=3e-4)
    got_np = np.stack([resize_bilinear_torch_np(im, oh, ow) for im in x])
    np.testing.assert_allclose(got_np, ref, atol=3e-4)


def test_resize_bilinear_torch_identity_at_same_size(rng):
    x = rng.standard_normal((1, 299, 299, 3)).astype(np.float32)
    from t2igan.ops.image import resize_bilinear_torch

    np.testing.assert_array_equal(
        np.asarray(resize_bilinear_torch(jnp.asarray(x), 299, 299)), x)


def test_mis_caption_bank_excludes_same_class():
    from t2igan.config import Config, cfg_replace
    from t2igan.data.synthetic import SyntheticDataset
    from t2igan.data.tokenizer import ClipTokenizer
    from t2igan.evaluation.rprecision import MisCaptionBank

    cfg = cfg_replace(Config(), TREE={"BASE_SIZE": 16, "BRANCH_NUM": 1})
    ds = SyntheticDataset(cfg, size=24, n_classes=4)
    bank = MisCaptionBank(ds, ClipTokenizer.fallback(), words_num=16)
    assert bank.ids.shape == (24, 16)
    class_ids = np.asarray([0, 1, 2, 3])
    ids, mask = bank.sample(class_ids, n_mis=7)
    assert ids.shape == (4, 7, 16) and mask.shape == (4, 7, 16)
    # every sampled row must come from a different class than the query:
    # recover source rows by matching token ids against the bank
    for i, cls in enumerate(class_ids):
        for j in range(7):
            src = np.flatnonzero((bank.ids == ids[i, j]).all(axis=1))
            # the sampled caption must be producible by some other-class row
            # (duplicate caption texts may also exist in the query class)
            assert (bank.cls[src] != cls).any()
    # eos-terminated masks align with ids
    assert ((mask == 1) | (mask == 0)).all()
