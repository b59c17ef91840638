"""Whole-network golden tests for the FID/IS Inception-v3 stack.

The reference vendors pytorch-fid's InceptionV3 (inception.py:16-322), which
builds on torchvision.  torchvision is not installed in this environment, so
the oracle here is a self-contained torch NCHW implementation of the same
topology — torchvision ``Inception3`` layer names + the pytorch-fid patches
(count_include_pad=False average pooling in InceptionA/C/E1, max-pooled
branch in E2, inception.py:205-322) — i.e. an independent implementation
whose state dict has exactly the key layout the converter consumes.

Covered end-to-end:
* pool3 (2048-d) golden ``<=1e-3`` between converted flax and the torch
  oracle, random weights + randomized BN stats;
* every ``--dims`` tap (64/192/768/2048) incl. the adaptive-avg-pool
  (fid_score.py:101-102);
* the in-model resize path: [0,1] native-resolution input -> torch
  ``F.interpolate`` bilinear (no antialias) + [-1,1] rescale
  (inception.py:143-150) vs :func:`t2igan.models.inception.preprocess`;
* FID end-to-end: PNG directories -> our CLI stack vs torch-oracle
  activations + the reference Fréchet math (scipy sqrtm route);
* IS end-to-end: the reference transform chain (inception_score.py:62-79)
  vs :mod:`t2igan.evaluation.inception_score`.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from t2igan.evaluation.fid import (calculate_fid_given_paths,
                                   make_activation_fn)
from t2igan.models.inception import InceptionV3, convert_torch_inception_state

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------------------
# torch oracle: torchvision Inception3 topology (+ pytorch-fid patches)
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class IncA(nn.Module):
    def __init__(self, cin, pool_features, fid):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=not self.fid)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b5, bd, bp], 1)


class IncB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class IncC(nn.Module):
    def __init__(self, cin, c7, fid):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=not self.fid)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b7, bd, bp], 1)


class IncD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class IncE(nn.Module):
    # pool: "avg" (torchvision) | "avg_nocount" (FID E1) | "max" (FID E2)
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)],
                       1)
        if self.pool == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                              count_include_pad=(self.pool == "avg"))
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInception(nn.Module):
    """torchvision ``Inception3(transform_input=False)`` forward with the
    pytorch-fid taps; ``fid=True`` applies the pooling patches and the
    1008-way head (inception.py:180-322)."""

    def __init__(self, fid=True, num_classes=None):
        super().__init__()
        nc = num_classes or (1008 if fid else 1000)
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32, fid)
        self.Mixed_5c = IncA(256, 64, fid)
        self.Mixed_5d = IncA(288, 64, fid)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128, fid)
        self.Mixed_6c = IncC(768, 160, fid)
        self.Mixed_6d = IncC(768, 160, fid)
        self.Mixed_6e = IncC(768, 192, fid)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg_nocount" if fid else "avg")
        self.Mixed_7c = IncE(2048, "max" if fid else "avg")
        self.fc = nn.Linear(2048, nc)

    def forward(self, x):
        out = {}
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        out["pool1"] = x
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        out["pool2"] = x
        x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
        x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(
            self.Mixed_6a(x)))))
        out["mixed6e"] = x
        x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
        out["pool3"] = x.mean(dim=(2, 3))
        out["logits"] = self.fc(out["pool3"])
        return out


def _randomize_bn(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.05, generator=g)
            m.running_var.uniform_(0.8, 1.2, generator=g)
            m.weight.data.uniform_(0.5, 1.5, generator=g)
            m.bias.data.normal_(0.0, 0.05, generator=g)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    net = TorchInception(fid=True)
    _randomize_bn(net)
    net.eval()
    variables = convert_torch_inception_state(net.state_dict())
    return net, variables


def test_fid_inception_whole_net_golden(oracle, rng):
    """Converted flax fid-variant matches the torch oracle at every tap."""
    net, variables = oracle
    x = rng.uniform(0.0, 1.0, (2, 299, 299, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)) * 2.0 - 1.0
    with torch.no_grad():
        ref = net(xt)

    model = InceptionV3(variant="fid", num_classes=1008)
    got = model.apply(variables, jnp.asarray(x) * 2.0 - 1.0)

    for tap in ("pool1", "pool2", "mixed6e"):
        r = ref[tap].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[tap]), r, atol=1e-3,
                                   err_msg=tap)
    np.testing.assert_allclose(np.asarray(got["pool3"]),
                               ref["pool3"].numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               ref["logits"].numpy(), atol=1e-2)


@pytest.mark.parametrize("dims", [64, 192, 768, 2048])
def test_activation_fn_matches_reference_protocol(oracle, rng, dims):
    """[0,1] native-res batch -> make_activation_fn == the reference's
    resize-inside-the-model protocol (inception.py:143-150 +
    fid_score.py:101-102) at every --dims tap."""
    net, variables = oracle
    x = rng.uniform(0.0, 1.0, (2, 256, 256, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        xt = F.interpolate(xt, (299, 299), mode="bilinear",
                           align_corners=False)
        ref = net(2.0 * xt - 1.0)
    tap = {64: "pool1", 192: "pool2", 768: "mixed6e", 2048: "pool3"}[dims]
    r = ref[tap].numpy()
    if r.ndim == 4:
        r = r.mean(axis=(2, 3))

    fn = make_activation_fn(variables, dims=dims)
    got = np.asarray(fn(jnp.asarray(x)))
    assert got.shape == (2, dims)
    np.testing.assert_allclose(got, r, atol=2e-3)


def _write_pngs(dirpath, images01):
    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    for i, im in enumerate(images01):
        Image.fromarray((im * 255).astype(np.uint8)).save(
            os.path.join(dirpath, f"{i:03d}.png"))


def test_fid_end_to_end_matches_torch_pipeline(oracle, rng, tmp_path):
    """PNG dirs -> our FID == torch-oracle activations + the reference
    Fréchet math (scipy sqrtm, fid_score.py:113-164)."""
    from scipy import linalg

    net, variables = oracle
    n = 12
    a = rng.uniform(0.0, 1.0, (n, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0.0, 0.25, a.shape), 0, 1).astype(np.float32)
    _write_pngs(tmp_path / "a", a)
    _write_pngs(tmp_path / "b", b)

    # torch side: decode the SAME pngs (quantization included)
    from t2igan.evaluation.fid import list_images

    def torch_stats(d):
        from PIL import Image

        acts = []
        for f in list_images(str(d)):
            arr = np.asarray(Image.open(f), np.float32) / 255.0
            xt = torch.from_numpy(arr.transpose(2, 0, 1))[None]
            with torch.no_grad():
                xt = F.interpolate(xt, (299, 299), mode="bilinear",
                                   align_corners=False)
                acts.append(net(2.0 * xt - 1.0)["pool3"].numpy())
        acts = np.concatenate(acts).astype(np.float64)
        return acts.mean(0), np.cov(acts, rowvar=False)

    m1, s1 = torch_stats(tmp_path / "a")
    m2, s2 = torch_stats(tmp_path / "b")
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = m1 - m2
    fid_ref = diff @ diff + np.trace(s1) + np.trace(s2) \
        - 2.0 * np.trace(covmean)

    fid_ours = calculate_fid_given_paths(
        [str(tmp_path / "a"), str(tmp_path / "b")],
        make_activation_fn(variables), batch_size=6)
    assert abs(fid_ours - fid_ref) <= max(1e-3 * abs(fid_ref), 1e-3), \
        (fid_ours, fid_ref)


def test_inception_score_end_to_end_matches_torch_chain(rng, tmp_path):
    """PNG dir -> our IS == the reference chain: PIL Scale(32) ->
    Normalize(.5) -> torch bilinear Upsample(299) -> torchvision-variant
    inception softmax -> split scores (inception_score.py:62-103)."""
    from PIL import Image

    from t2igan.evaluation.inception_score import (
        inception_score, inception_score_from_preds)

    torch.manual_seed(1)
    net = TorchInception(fid=False)
    _randomize_bn(net, seed=1)
    net.eval()
    variables = convert_torch_inception_state(net.state_dict(),
                                              num_classes=1000)

    n = 8
    imgs = rng.uniform(0.0, 1.0, (n, 256, 256, 3)).astype(np.float32)
    # the reference walks one directory level (inception_score.py:43-47)
    _write_pngs(tmp_path / "gen" / "cls0", imgs)

    from t2igan.evaluation.fid import list_images

    preds = []
    for f in list_images(str(tmp_path / "gen")):
        im = Image.open(f).resize((32, 32), Image.BILINEAR)
        x = np.asarray(im, np.float32) / 255.0
        xt = torch.from_numpy(x.transpose(2, 0, 1))[None] * 2.0 - 1.0
        with torch.no_grad():
            xt = F.interpolate(xt, (299, 299), mode="bilinear",
                               align_corners=False)
            preds.append(torch.softmax(net(xt)["logits"], dim=1).numpy())
    ref_mean, ref_std = inception_score_from_preds(np.concatenate(preds),
                                                   splits=2)

    got_mean, got_std = inception_score(str(tmp_path / "gen"), variables,
                                        batch_size=4, splits=2)
    assert abs(got_mean - ref_mean) < 1e-3, (got_mean, ref_mean)
    assert abs(got_std - ref_std) < 1e-3


def test_fid_bf16_feature_drift_bounded(rng):
    """The bf16 Inception feature path perturbs FID by <2% relative on a
    fixed image pair (measured 0.8-0.9% across harness seeds, round 4).

    Context: the *metric* protocol is exempt from this drift by
    construction — ``make_activation_fn`` builds an f32 net, so
    ``fid_score.py``/``tools/quality_parity.py`` report zero-bf16-drift
    FID; the bf16 Inception exists only in ``bench.py``'s gen+eval
    throughput headline.  This test bounds the drift so the bf16 headline
    remains an honest proxy for the metric sweep."""
    import jax

    from t2igan.evaluation.fid import compute_statistics, frechet_distance
    from t2igan.models.inception import preprocess

    n = 32
    a = rng.uniform(0, 1, (n, 64, 64, 3)).astype(np.float32)
    gy = np.linspace(0, 1, 64, dtype=np.float32)[None, :, None, None]
    b = np.clip(rng.uniform(0, 1, (n, 64, 64, 3)) ** 2 * 0.7 + 0.3 * gy,
                0, 1).astype(np.float32)

    f32 = InceptionV3(variant="fid", num_classes=1008)
    bf16 = InceptionV3(variant="fid", num_classes=1008, dtype=jnp.bfloat16)
    variables = f32.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))

    def act(model):
        @jax.jit
        def run(v, x01):
            feat = model.apply(v, preprocess(x01))["pool3"]
            return feat.astype(jnp.float32)
        return lambda x: run(variables, jnp.asarray(x))

    def fid(fn):
        m1, s1 = compute_statistics(fn, [a[:16], a[16:]])
        m2, s2 = compute_statistics(fn, [b[:16], b[16:]])
        return frechet_distance(m1, s1, m2, s2)

    fid_f32 = fid(act(f32))
    fid_bf16 = fid(act(bf16))
    rel = abs(fid_bf16 - fid_f32) / max(abs(fid_f32), 1e-12)
    assert rel < 0.02, (fid_f32, fid_bf16, rel)


def test_inception_bf16_mode_tracks_f32(rng):
    """dtype=bf16 must actually thread into every block's convs (the bench's
    bf16 gen+eval mode depends on it — a round-2 trace showed the blocks
    silently staying f32) and stay numerically close to the f32 net."""
    import jax

    f32 = InceptionV3(variant="fid", num_classes=1008)
    bf16 = InceptionV3(variant="fid", num_classes=1008, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32))
    variables = f32.init(jax.random.PRNGKey(0), x)
    a = np.asarray(f32.apply(variables, x)["pool3"], np.float32)
    b = np.asarray(bf16.apply(variables, x)["pool3"], np.float32)
    # correlation, not elementwise: bf16 drift accumulates over ~30 convs
    ca = a - a.mean()
    cb = b - b.mean()
    corr = float((ca * cb).sum() /
                 (np.linalg.norm(ca) * np.linalg.norm(cb) + 1e-12))
    assert corr > 0.995, corr
    assert np.isfinite(b).all()
