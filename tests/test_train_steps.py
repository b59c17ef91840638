"""End-to-end train-step tests on tiny model configs (CPU), including the
data-parallel sharded path on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Compile-heavy jitted train steps: slow tier (the fast tier stays <5 min).
pytestmark = pytest.mark.slow

from t2igan.config import Config, cfg_replace
from t2igan.models.clip import ClipConfig, ClipTowerConfig, ClipWithRegionHead
from t2igan.models.factory import build_discriminators, build_generator
from t2igan.parallel.mesh import make_mesh, replicate, shard_batch
from t2igan.train.state import (damsm_optimizer, gan_optimizers,
                                init_damsm_state, init_gan_state)
from t2igan.train.steps import make_damsm_step, make_gan_step

TINY_CLIP = ClipConfig(
    vocab_size=512, max_positions=16, eos_token_id=511, projection_dim=32,
    image_size=32, patch_size=16, region_dim=32,
    text=ClipTowerConfig(32, 2, 2, 64),
    vision=ClipTowerConfig(48, 2, 2, 96))

CFG = cfg_replace(
    Config(),
    TREE={"BASE_SIZE": 64, "BRANCH_NUM": 2},
    GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
         "R_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16},
    TRAIN={"BATCH_SIZE": 4})


def _caption_batch(rng, b, l, vocab=512, eos=511):
    ids = np.zeros((b, l), dtype=np.int32)
    mask = np.zeros((b, l), dtype=np.int32)
    lens = rng.integers(4, l + 1, size=b)
    for i, n in enumerate(lens):
        ids[i, 0] = vocab - 2
        ids[i, 1:n - 1] = rng.integers(1, 400, n - 2)
        ids[i, n - 1] = eos
        ids[i, n:] = eos
        mask[i, :n] = 1
    return ids, mask


def _gan_batch(rng, b=4, l=16):
    ids, mask = _caption_batch(rng, b, l)
    ids2, mask2 = _caption_batch(rng, b, l)
    return {
        "images": [rng.standard_normal((b, s, s, 3)).astype(np.float32) * 0.3
                   for s in (64, 128)],
        "ids": ids, "mask": mask, "ids_2": ids2, "mask_2": mask2,
        "class_ids": np.asarray(rng.integers(0, 3, b), np.int32),
    }


@pytest.fixture(scope="module")
def clip_setup():
    model = ClipWithRegionHead(TINY_CLIP)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32))
    return model, variables


def test_damsm_step_trains(clip_setup):
    model, variables = clip_setup
    tx = damsm_optimizer(CFG, steps_per_epoch=10)
    state = init_damsm_state(CFG, variables, tx)
    step = jax.jit(make_damsm_step(CFG, model, tx))

    rng = np.random.default_rng(0)
    ids, mask = _caption_batch(rng, 4, 16)
    ids2, mask2 = _caption_batch(rng, 4, 16)
    batch = {
        "images": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
        "ids": ids, "mask": mask, "ids_2": ids2, "mask_2": mask2,
        "class_ids": np.asarray([0, 1, 2, 3], np.int32),
    }
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    for k in ("loss", "w_loss", "s_loss", "contrastive", "grad_norm"):
        assert np.isfinite(float(metrics[k])), k
    # both parameter groups moved
    d_lin = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                         state.clip_params["linear_subr"],
                         state2.clip_params["linear_subr"])
    assert max(jax.tree.leaves(d_lin)) > 0
    d_bb = np.abs(np.asarray(
        state.clip_params["text_projection"]["kernel"] -
        state2.clip_params["text_projection"]["kernel"])).max()
    assert d_bb > 0
    # second step runs from the updated state
    state3, metrics3 = step(state2, batch)
    assert int(state3.step) == 2
    assert np.isfinite(float(metrics3["loss"]))


@pytest.fixture(scope="module")
def gan_setup(clip_setup):
    clip_model, clip_vars = clip_setup
    gen = build_generator(CFG)
    ds = build_discriminators(CFG)
    g_tx, d_tx = gan_optimizers(CFG)
    state = init_gan_state(CFG, gen, ds, jax.random.PRNGKey(1))
    step = make_gan_step(CFG, clip_model, gen, ds, g_tx, d_tx)
    return clip_model, clip_vars, gen, ds, state, jax.jit(step)


def test_gan_step_trains(gan_setup):
    _, clip_vars, _, _, state, step = gan_setup
    batch = _gan_batch(np.random.default_rng(1))
    state2, metrics = step(state, clip_vars["params"], batch,
                           jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    for k in ("g_loss", "g_adv", "w_loss", "s_loss", "kl_loss",
              "contrastive", "d_loss0", "d_loss1"):
        assert np.isfinite(float(metrics[k])), k
    # G moved, EMA lags behind G
    moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                         state.g_params, state2.g_params)
    assert max(jax.tree.leaves(moved)) > 0
    ema_gap = jax.tree.map(lambda e, p: np.abs(np.asarray(e - p)).max(),
                           state2.g_ema_params, state2.g_params)
    assert max(jax.tree.leaves(ema_gap)) > 0
    # EMA is a 0.999 mix of old and new parameters
    k = ("CANet_0", "Dense_0", "kernel")
    old = np.asarray(state.g_params[k[0]][k[1]][k[2]])
    new = np.asarray(state2.g_params[k[0]][k[1]][k[2]])
    ema = np.asarray(state2.g_ema_params[k[0]][k[1]][k[2]])
    np.testing.assert_allclose(ema, 0.999 * old + 0.001 * new,
                               rtol=1e-5, atol=1e-7)
    # discriminators and their spectral states advanced
    for i in range(2):
        dm = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                          state.d_params[i], state2.d_params[i])
        assert max(jax.tree.leaves(dm)) > 0
        sm = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                          state.d_spectral[i], state2.d_spectral[i])
        assert max(jax.tree.leaves(sm)) > 0


def test_gan_step_phased_tail_train_matches_default(gan_setup, monkeypatch):
    """The full adversarial step with GAN.PHASED_TAIL_TRAIN produces the
    same metrics and the same updated state as the module-chain graph (up
    to float reassociation in the phase-space tail)."""
    clip_model, clip_vars, gen, ds, state, step = gan_setup
    batch = _gan_batch(np.random.default_rng(3))
    key = jax.random.PRNGKey(4)
    s0, m0 = step(state, clip_vars["params"], batch, key)
    monkeypatch.setenv("T2IGAN_PHASED_TAIL_TRAIN", "1")
    g_tx, d_tx = gan_optimizers(CFG)
    step1 = jax.jit(make_gan_step(CFG, clip_model, gen, ds, g_tx, d_tx))
    s1, m1 = step1(state, clip_vars["params"], batch, key)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=k)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.g_params),
            jax.tree_util.tree_leaves_with_path(s1.g_params)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5, err_msg=str(p0))
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(s0.g_batch_stats),
            jax.tree_util.tree_leaves_with_path(s1.g_batch_stats)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p0))


def test_gan_step_data_parallel(gan_setup):
    """The same step under a Mesh('data') with the batch sharded 8-ways."""
    _, clip_vars, _, _, state, step = gan_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch = _gan_batch(np.random.default_rng(2), b=8)
    sharded = dict(batch)
    sharded["images"] = [jnp.asarray(x) for x in batch["images"]]
    sharded = shard_batch(mesh, sharded)
    state_r = replicate(mesh, state)
    clip_r = replicate(mesh, clip_vars["params"])
    state2, metrics = step(state_r, clip_r, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(state2.step) == 1
    # the result must equal the unsharded computation
    state2u, metricsu = step(state, clip_vars["params"], batch,
                             jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(metrics["g_loss"]),
                               float(metricsu["g_loss"]),
                               rtol=2e-4, atol=2e-4)


def test_sampler_data_parallel_matches_single(gan_setup):
    """The eval-sweep sampler under a Mesh('data') (sampling()'s DP path,
    reference analogue: DataParallel-wrapped netG/CLIP at eval,
    trainer.py:255-265) must reproduce the single-device pyramid."""
    from t2igan.train.steps import make_sampler

    clip_model, clip_vars, gen, _, state, _ = gan_setup
    mesh = make_mesh()
    single = make_sampler(CFG, clip_model, gen)
    sharded = make_sampler(CFG, clip_model, gen, mesh=mesh)
    rng = np.random.default_rng(5)
    ids, mask = _caption_batch(rng, 8, 16)
    z = rng.standard_normal((8, CFG.GAN.Z_DIM)).astype(np.float32)
    eps = rng.standard_normal((8, CFG.GAN.CONDITION_DIM)).astype(np.float32)
    args = (clip_vars["params"], state.g_params, state.g_batch_stats,
            jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(z),
            jnp.asarray(eps))
    fakes_s, _ = single(*args)
    fakes_m, _ = sharded(*args)
    assert len(fakes_m) == CFG.TREE.BRANCH_NUM
    for a, b in zip(fakes_s, fakes_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_rank_fn_data_parallel_matches_single(clip_setup):
    """R-precision ranking under the data mesh equals the single-device
    ranking bit-for-bit in hit flags."""
    from t2igan.evaluation.rprecision import make_rank_fn

    clip_model, clip_vars = clip_setup
    mesh = make_mesh()
    single = make_rank_fn(clip_model, clip_vars)
    sharded = make_rank_fn(clip_model, clip_vars, mesh=mesh)
    rng = np.random.default_rng(7)
    b, n_mis, w = 8, 5, 16
    images = rng.standard_normal((b, 32, 32, 3)).astype(np.float32) * 0.3
    ids, mask = _caption_batch(rng, b, w)
    ids_mis = np.stack([_caption_batch(rng, n_mis, w)[0] for _ in range(b)])
    mask_mis = np.ones_like(ids_mis)
    args = (jnp.asarray(images), jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(ids_mis), jnp.asarray(mask_mis))
    np.testing.assert_array_equal(np.asarray(single(*args)),
                                  np.asarray(sharded(*args)))


def test_gan_step_bf16_models(clip_setup):
    """Mixed-precision step: bf16 compute, f32 params — losses stay finite
    and parameters update."""
    clip_model_f32, clip_vars = clip_setup
    from t2igan.models.clip import ClipWithRegionHead

    clip_model = ClipWithRegionHead(TINY_CLIP, dtype=jnp.bfloat16)
    gen = build_generator(CFG, dtype=jnp.bfloat16)
    ds = build_discriminators(CFG, dtype=jnp.bfloat16)
    g_tx, d_tx = gan_optimizers(CFG)
    state = init_gan_state(CFG, gen, ds, jax.random.PRNGKey(1))
    step = jax.jit(make_gan_step(CFG, clip_model, gen, ds, g_tx, d_tx))
    batch = _gan_batch(np.random.default_rng(5))
    state2, metrics = step(state, clip_vars["params"], batch,
                           jax.random.PRNGKey(2))
    for k in ("g_loss", "d_loss0", "d_loss1", "kl_loss"):
        assert np.isfinite(float(metrics[k])), k
    # params remain f32
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(state2.g_params))
    moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                         state.g_params, state2.g_params)
    assert max(jax.tree.leaves(moved)) > 0


def test_damsm_step_data_parallel(clip_setup):
    """DAMSM step under Mesh('data'): sharded result equals single-device."""
    model, variables = clip_setup
    tx = damsm_optimizer(CFG, steps_per_epoch=10)
    state = init_damsm_state(CFG, variables, tx)
    step = jax.jit(make_damsm_step(CFG, model, tx))

    rng = np.random.default_rng(3)
    b = 8
    ids, mask = _caption_batch(rng, b, 16)
    ids2, mask2 = _caption_batch(rng, b, 16)
    batch = {
        "images": rng.standard_normal((b, 32, 32, 3)).astype(np.float32),
        "ids": ids, "mask": mask, "ids_2": ids2, "mask_2": mask2,
        "class_ids": np.arange(b, dtype=np.int32),
    }
    _, ref = step(state, batch)

    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    state_r = replicate(mesh, state)
    _, out = step(state_r, sharded)
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]),
                               rtol=2e-4, atol=2e-4)


def test_gan_step_matches_two_phase_oracle(gan_setup):
    """The production step folds the D updates inside the differentiated G
    function so each caption view pays ONE generator forward.  This oracle
    re-implements the step in the naive two-phase form (separate stop-grad
    G forward for the D updates, regeneration inside the G loss — exactly
    what the fold must be equivalent to) and pins parameter-level agreement;
    a regression in the fold's AD structure (e.g. tangents leaking through
    the D update, or the D step seeing different fakes than the G loss
    differentiates) shows up here as a parameter mismatch."""
    from t2igan.losses import (discriminator_loss, generator_adv_loss,
                               kl_loss, nt_xent_loss, sent_loss, words_loss,
                               wrong_pair)
    from t2igan.ops.image import resize_nearest
    from t2igan.train.state import ema_update
    import optax

    clip_model, clip_vars, gen, ds, state, step = gan_setup
    g_tx, d_tx = gan_optimizers(CFG)
    cfgs = CFG.TRAIN.SMOOTH
    g1, g2, g3, lam = cfgs.GAMMA1, cfgs.GAMMA2, cfgs.GAMMA3, cfgs.LAMBDA

    def _l2n(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    def encode_text(ids, mask):
        words, sent = clip_model.apply(
            {"params": clip_vars["params"]}, ids, mask,
            method=type(clip_model).encode_text_verbose)
        return jax.lax.stop_gradient(words), jax.lax.stop_gradient(sent)

    def generate(gp, stats, z, sent, words, pad, eps):
        (fakes, _, mu, logvar), upd = gen.apply(
            {"params": gp, "batch_stats": stats},
            z, sent, words, pad, True, eps, False,
            mutable=["batch_stats"])
        return fakes, mu, logvar, upd["batch_stats"]

    def oracle(state, batch, rng):
        b = batch["ids"].shape[0]
        rng_z, rng_e1, rng_e2 = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z, (b, CFG.GAN.Z_DIM))
        eps1 = jax.random.normal(rng_e1, (b, CFG.GAN.CONDITION_DIM))
        eps2 = jax.random.normal(rng_e2, (b, CFG.GAN.CONDITION_DIM))
        words1, sent1 = encode_text(batch["ids"], batch["mask"])
        words2, sent2 = encode_text(batch["ids_2"], batch["mask_2"])
        pad1, pad2 = batch["mask"] == 0, batch["mask_2"] == 0

        # phase 1: stop-grad G forward, D updates
        fakes1, *_ , bs1 = generate(state.g_params, state.g_batch_stats,
                                    z, sent1, words1, pad1, eps1)
        fakes2, *_ , _ = generate(state.g_params, bs1,
                                  z, sent2, words2, pad2, eps2)
        fakes1 = [jax.lax.stop_gradient(f) for f in fakes1]
        fakes2 = [jax.lax.stop_gradient(f) for f in fakes2]
        new_dp, new_dspec, new_dopt = [], [], []
        for i, model in enumerate(ds):
            real = batch["images"][i]

            def d_loss_fn(dp):
                x = jnp.concatenate([real, fakes1[i], fakes2[i]], axis=0)
                h, upd = model.apply(
                    {"params": dp, "spectral": state.d_spectral[i]},
                    x, method=model.features, mutable=["spectral"])
                h_r, h_f1, h_f2 = jnp.split(h, 3, axis=0)

                def head(hc, c):
                    return model.apply(
                        {"params": dp, "spectral": upd["spectral"]},
                        hc, c, method=model.cond)

                def uhead(hc):
                    return model.apply(
                        {"params": dp, "spectral": upd["spectral"]},
                        hc, method=model.uncond)

                l1, _ = discriminator_loss(
                    head(h_r, sent1), head(h_f1, sent1),
                    head(h_r, wrong_pair(sent1)), uhead(h_r), uhead(h_f1))
                l2, _ = discriminator_loss(
                    head(h_r, sent2), head(h_f2, sent2),
                    head(h_r, wrong_pair(sent2)), uhead(h_r), uhead(h_f2))
                return l1 + l2, upd["spectral"]

            (_, spec), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params[i])
            upds, nopt = d_tx.update(grads, state.d_opt_states[i],
                                     state.d_params[i])
            new_dp.append(optax.apply_updates(state.d_params[i], upds))
            new_dspec.append(spec)
            new_dopt.append(nopt)

        # phase 2: regenerate inside the G loss, vs the updated Ds
        def g_loss_fn(gp):
            f1, mu1, lv1, b1 = generate(gp, state.g_batch_stats, z, sent1,
                                        words1, pad1, eps1)
            f2, mu2, lv2, b2 = generate(gp, b1, z, sent2, words2, pad2, eps2)
            adv = 0.0
            for i, model in enumerate(ds):
                for fakes, sent in ((f1, sent1), (f2, sent2)):
                    dv = {"params": new_dp[i], "spectral": new_dspec[i]}
                    h = model.apply(dv, fakes[i], method=model.features)
                    adv = adv + generator_adv_loss(
                        model.apply(dv, h, sent, method=model.cond),
                        model.apply(dv, h, method=model.uncond))
            cls = batch["class_ids"]

            def damsm_terms(fakes, words, mask, sent):
                resized = resize_nearest(fakes[-1],
                                         clip_model.cfg.image_size)
                subr, img_code = clip_model.apply(
                    {"params": clip_vars["params"]}, resized,
                    method=type(clip_model).encode_image_verbose)
                wl0, wl1 = words_loss(subr[:, 1:, :], words, cls,
                                      mask > 0, g1, g2, g3)
                sl0, sl1 = sent_loss(img_code, sent, cls, g3)
                return (wl0 + wl1) * lam, (sl0 + sl1) * lam, img_code

            w_a, s_a, c1 = damsm_terms(f1, words1, batch["mask"], sent1)
            w_b, s_b, c2 = damsm_terms(f2, words2, batch["mask_2"], sent2)
            kl = kl_loss(mu1, lv1) + kl_loss(mu2, lv2)
            contrast = 0.2 * nt_xent_loss(_l2n(c1), _l2n(c2), 0.5)
            return (adv + w_a + w_b + s_a + s_b + kl + contrast,
                    {"batch_stats": b2})

        (g_loss, aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_upds, g_opt = g_tx.update(g_grads, state.g_opt_state,
                                    state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upds)
        return state.replace(
            step=state.step + 1, g_params=g_params,
            g_batch_stats=aux["batch_stats"],
            g_ema_params=ema_update(state.g_ema_params, g_params, 0.999),
            g_opt_state=g_opt, d_params=new_dp, d_spectral=new_dspec,
            d_opt_states=new_dopt)

    batch = _gan_batch(np.random.default_rng(7))
    rng = jax.random.PRNGKey(11)
    got, _ = step(state, clip_vars["params"], batch, rng)
    want = jax.jit(oracle)(state, batch, rng)

    for name in ("g_params", "g_ema_params", "g_batch_stats"):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4),
            getattr(got, name), getattr(want, name))
    for i in range(len(ds)):
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4),
            got.d_params[i], want.d_params[i])
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4),
            got.d_spectral[i], want.d_spectral[i])
