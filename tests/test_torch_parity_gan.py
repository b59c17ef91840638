"""Numerical forward parity of GNet / DNet against the torch reference.

These tests import the mounted reference source
(``/root/reference/DMGAN+CLIP/code/model.py``) as a *test oracle only*:
random-initialized reference modules are converted through
:mod:`t2igan.models.convert` and forward outputs are compared ``<= 1e-4``.
This is what makes "same generator" a measurement rather than an assertion,
and proves the converters can ingest the reference's ``netG_epoch_*.pth`` /
``netD*.pth`` deliverables (trainer.py:189-200).

Mask semantics note: the reference ``Memory`` mask path is buggy (queryL-
tiling misaligns samples, model.py:438) so parity is asserted with no padding
mask — the configuration the reference itself effectively trains in when all
captions fill the window; the *intended* masked behavior is covered by
tests/test_ops_attention.py.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _EDict(dict):
    """Minimal easydict stand-in (attribute-style dict) so the reference's
    ``miscc/config.py`` imports in this easydict-free environment."""

    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EDict):
            v = _EDict(v)
        super().__setitem__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


sys.modules.setdefault("easydict", types.SimpleNamespace(EasyDict=_EDict))
# torchvision is only needed by the reference's legacy CNN_ENCODER class
# body (model.py:5, :236), never touched by G_NET/D_NET — stub its import
# with a real ModuleType so importlib.util.find_spec (used by transformers'
# feature probing) still works.
if "torchvision" not in sys.modules:
    import importlib.machinery

    _tv = types.ModuleType("torchvision")
    _tv.models = types.ModuleType("torchvision.models")
    # A real (loader-less) spec keeps importlib.util.find_spec happy;
    # transformers' version probe then correctly reports torchvision absent
    # (no dist metadata) instead of crashing.
    _tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    sys.modules["torchvision"] = _tv

import jax
import jax.numpy as jnp

from t2igan.models.convert import (convert_torch_discriminator_state,
                                   convert_torch_generator_state)
from t2igan.models.discriminator import DNetWithHeads
from t2igan.models.generator import GDCGan, GNet

REF = "/root/reference/DMGAN+CLIP/code"

# Small-but-nontrivial dims; Z/EMB/COND chosen unequal to catch transposes.
GF, DF, Z, NEF, NCF, R_NUM, L, B = 16, 8, 24, 48, 32, 2, 7, 3

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    """Import the reference model module with a stubbed cfg (oracle only)."""
    sys.path.insert(0, REF)
    try:
        from miscc.config import cfg as ref_cfg
        ref_cfg.CUDA = False
        ref_cfg.GAN.GF_DIM = GF
        ref_cfg.GAN.DF_DIM = DF
        ref_cfg.GAN.Z_DIM = Z
        ref_cfg.GAN.CONDITION_DIM = NCF
        ref_cfg.GAN.R_NUM = R_NUM
        ref_cfg.TEXT.EMBEDDING_DIM = NEF
        ref_cfg.TREE.BRANCH_NUM = 3
        import model as ref_model
        return ref_model
    finally:
        sys.path.remove(REF)


def _randomize_bn_stats(module, seed=0):
    """Give BatchNorm running stats non-trivial values so the eval-mode
    comparison actually exercises the converted ``batch_stats``."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.1, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


def _inputs(rng):
    z = rng.standard_normal((B, Z)).astype(np.float32)
    sent = rng.standard_normal((B, NEF)).astype(np.float32)
    words = rng.standard_normal((B, L, NEF)).astype(np.float32)
    eps = rng.standard_normal((B, NCF)).astype(np.float32)
    return z, sent, words, eps


def _run_torch_g(gnet_t, z, sent, words, eps):
    gnet_t.ca_net.reparametrize = (
        lambda mu, logvar: mu + (0.5 * logvar).exp() * torch.from_numpy(eps))
    with torch.no_grad():
        return gnet_t(torch.from_numpy(z), torch.from_numpy(sent),
                      torch.from_numpy(words).transpose(1, 2).contiguous(),
                      None, None)


# The eval-mode case stays in the fast tier so the default run keeps one
# full-generator torch-oracle check (ADVICE r3); only the train-mode case
# (batch-stats mutation doubles the work) is slow.
@pytest.mark.parametrize(
    "train_mode",
    [pytest.param(True, marks=pytest.mark.slow), False])
def test_generator_forward_parity(ref, rng, train_mode):
    torch.manual_seed(0)
    gnet_t = ref.G_NET()
    _randomize_bn_stats(gnet_t)
    gnet_t.train(train_mode)

    z, sent, words, eps = _inputs(rng)
    fakes_t, atts_t, mu_t, logvar_t = _run_torch_g(gnet_t, z, sent, words, eps)

    variables = convert_torch_generator_state(gnet_t.state_dict())
    gnet_j = GNet(gf_dim=GF, nef=NEF, condition_dim=NCF, branch_num=3,
                  num_residual=R_NUM)
    (fakes_j, atts_j, mu_j, logvar_j), _ = gnet_j.apply(
        variables, jnp.asarray(z), jnp.asarray(sent), jnp.asarray(words),
        None, train=train_mode, ca_eps=jnp.asarray(eps),
        mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                               atol=ATOL)
    assert len(fakes_j) == len(fakes_t) == 3
    for s, (fj, ft) in enumerate(zip(fakes_j, fakes_t)):
        # NHWC vs NCHW
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1), atol=ATOL,
            err_msg=f"scale {s} ({64 * 2 ** s}px, train={train_mode})")
    assert len(atts_j) == len(atts_t) == 2
    for aj, at in zip(atts_j, atts_t):
        # ours [B, H, W, L]; torch [B, L, H, W] (model.py:450)
        np.testing.assert_allclose(
            np.asarray(aj), at.numpy().transpose(0, 2, 3, 1), atol=ATOL)


def test_gdcgan_forward_parity(ref, rng):
    # The reference G_DCGAN is un-instantiable as written: model.py:614/616
    # call NEXT_STAGE_G without the required ``size`` arg, and its forward
    # calls the stages with the wrong arity (model.py:632).  Assemble the
    # *intended* oracle from the reference's own sub-modules (SURVEY §7:
    # implement intended behavior, not the bug).
    torch.manual_seed(1)

    class RefGDCGan(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ca_net = ref.CA_NET()
            self.h_net1 = ref.INIT_STAGE_G(GF * 16, NCF)
            self.h_net2 = ref.NEXT_STAGE_G(GF, NEF, NCF, 64)
            self.h_net3 = ref.NEXT_STAGE_G(GF, NEF, NCF, 128)
            self.img_net = ref.GET_IMAGE_G(GF)

        def forward(self, z, sent, words, mask):
            c_code, mu, logvar = self.ca_net(sent)
            h = self.h_net1(z, c_code)
            h, _ = self.h_net2(h, c_code, words, mask, None)
            h, _ = self.h_net3(h, c_code, words, mask, None)
            return [self.img_net(h)], [], mu, logvar

    gnet_t = RefGDCGan()
    _randomize_bn_stats(gnet_t, seed=1)
    gnet_t.eval()

    z, sent, words, eps = _inputs(rng)
    gnet_t.ca_net.reparametrize = (
        lambda mu, logvar: mu + (0.5 * logvar).exp() * torch.from_numpy(eps))
    with torch.no_grad():
        fakes_t, _, mu_t, _ = gnet_t(
            torch.from_numpy(z), torch.from_numpy(sent),
            torch.from_numpy(words).transpose(1, 2).contiguous(), None)

    variables = convert_torch_generator_state(gnet_t.state_dict(), dcgan=True)
    gnet_j = GDCGan(gf_dim=GF, nef=NEF, condition_dim=NCF, branch_num=3,
                    num_residual=R_NUM)
    (fakes_j, _, mu_j, _), _ = gnet_j.apply(
        variables, jnp.asarray(z), jnp.asarray(sent), jnp.asarray(words),
        None, train=False, ca_eps=jnp.asarray(eps), mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=ATOL)
    assert len(fakes_j) == len(fakes_t) == 1
    np.testing.assert_allclose(
        np.asarray(fakes_j[0]), fakes_t[0].numpy().transpose(0, 2, 3, 1),
        atol=ATOL)


@pytest.mark.parametrize("size,cls_name", [(64, "D_NET64"), (128, "D_NET128"),
                                           (256, "D_NET256")])
def test_discriminator_forward_parity(ref, rng, size, cls_name):
    torch.manual_seed(size)
    dnet_t = getattr(ref, cls_name)(b_jcu=True)
    dnet_t.eval()

    # Convert BEFORE the oracle forward: the reference SpectralNorm mutates
    # its u/v buffers in-place per forward (spectral.py:30-31), so both
    # sides must start the power iteration from the same u.
    variables = convert_torch_discriminator_state(dnet_t.state_dict(),
                                                  img_size=size)

    x = rng.standard_normal((B, 3, size, size)).astype(np.float32)
    c = rng.standard_normal((B, NEF)).astype(np.float32)
    with torch.no_grad():
        h_t = dnet_t(torch.from_numpy(x))
        cond_t = dnet_t.COND_DNET(h_t, torch.from_numpy(c))
        uncond_t = dnet_t.UNCOND_DNET(h_t)
    dnet_j = DNetWithHeads(ndf=DF, nef=NEF, img_size=size, b_jcu=True)
    (h_j, cond_j, uncond_j), _ = dnet_j.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(c),
        mutable=["spectral"])

    np.testing.assert_allclose(
        np.asarray(h_j), h_t.numpy().transpose(0, 2, 3, 1), atol=ATOL)
    # reference heads apply sigmoid inside the module (model.py:686); ours
    # emit logits for a fused stable BCE.
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(cond_j)),
                               cond_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(uncond_j)),
                               uncond_t.numpy(), atol=ATOL)


def test_torch_pth_checkpoint_roundtrip(ref, rng, tmp_path):
    """The reference's deliverable files (netG_epoch_*.pth / netD*.pth,
    trainer.py:189-200) load through the checkpoint helpers and drive the
    flax forward to the same outputs."""
    from t2igan.train.checkpoint import (load_torch_discriminator,
                                         load_torch_generator)

    torch.manual_seed(7)
    gnet_t = ref.G_NET()
    gnet_t.eval()
    g_path = tmp_path / "netG_epoch_5.pth"
    torch.save(gnet_t.state_dict(), g_path)

    variables = load_torch_generator(str(g_path), branch_num=3,
                                     num_residual=R_NUM)
    z, sent, words, eps = _inputs(rng)
    fakes_t, _, _, _ = _run_torch_g(gnet_t, z, sent, words, eps)
    gnet_j = GNet(gf_dim=GF, nef=NEF, condition_dim=NCF, branch_num=3,
                  num_residual=R_NUM)
    (fakes_j, _, _, _), _ = gnet_j.apply(
        variables, jnp.asarray(z), jnp.asarray(sent), jnp.asarray(words),
        None, train=False, ca_eps=jnp.asarray(eps), mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(fakes_j[-1]), fakes_t[-1].numpy().transpose(0, 2, 3, 1),
        atol=ATOL)

    dnet_t = ref.D_NET64(b_jcu=True)
    d_path = tmp_path / "netD0.pth"
    torch.save(dnet_t.state_dict(), d_path)
    dv = load_torch_discriminator(str(d_path), img_size=64)
    x = rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        h_t = dnet_t(torch.from_numpy(x))
    dnet_j = DNetWithHeads(ndf=DF, nef=NEF, img_size=64, b_jcu=True)
    h_j, _ = dnet_j.apply(dv, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          method=lambda m, xx: m.features(xx),
                          mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(h_j),
                               h_t.numpy().transpose(0, 2, 3, 1), atol=ATOL)


def test_generator_converter_rejects_mismatched_branch(ref):
    """A BRANCH_NUM-2 checkpoint lacks h_net3; asking for 3 branches must
    fail loudly, not silently produce a half-initialized tree."""
    torch.manual_seed(3)
    gnet_t = ref.G_NET()
    sd = {k: v for k, v in gnet_t.state_dict().items()
          if not k.startswith(("h_net3", "img_net3"))}
    with pytest.raises(KeyError):
        convert_torch_generator_state(sd, branch_num=3)


# ---------------------------------------------------------------------------
# Legacy RNN_ENCODER parity (model.py:140-221): the packed-sequence final
# hidden state convention (final fwd state + first bwd state) is exactly the
# kind of semantics that silently diverges — pin it with converted weights.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_rnn_encoder_parity(ref, rng, rnn_type):
    from t2igan.models.convert import convert_torch_rnn_encoder_state
    from t2igan.models.legacy import RnnEncoder

    ref.cfg.RNN_TYPE = rnn_type        # undefined in config defaults
    ref.cfg.TEXT.WORDS_NUM = 9
    ntoken, ninput, nhidden, t = 50, 20, 16, 9

    torch.manual_seed(3)
    enc_t = ref.RNN_ENCODER(ntoken, ninput=ninput, nhidden=nhidden)
    enc_t.eval()

    caps = rng.integers(1, ntoken, size=(B, t)).astype(np.int64)
    lens = np.sort(rng.integers(3, t + 1, size=B))[::-1].copy()  # pack wants desc
    with torch.no_grad():
        hidden = enc_t.init_hidden(B)
        words_t, sent_t = enc_t(torch.from_numpy(caps),
                                torch.from_numpy(lens), hidden)
    # pad_packed truncates to the longest length in the batch
    t_out = int(lens[0])
    words_t = words_t.numpy().transpose(0, 2, 1)     # [B, T', 2h]

    variables = convert_torch_rnn_encoder_state(enc_t.state_dict(), rnn_type)
    enc_j = RnnEncoder(ntoken=ntoken, ninput=ninput, nhidden=nhidden,
                       rnn_type=rnn_type)
    words_j, sent_j = enc_j.apply(variables, jnp.asarray(caps),
                                  jnp.asarray(lens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(words_j)[:, :t_out], words_t,
                               rtol=ATOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(sent_j), sent_t.numpy(),
                               rtol=ATOL, atol=ATOL)
    # beyond each caption's length our output is exact zero, like pad_packed
    mask = np.arange(t)[None, :] >= lens[:, None]
    assert np.all(np.asarray(words_j)[mask] == 0.0)
