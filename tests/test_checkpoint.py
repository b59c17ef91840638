"""Checkpoint save/restore roundtrip tests, including restore across a
device-count (topology) change — the elastic-recovery story a TPU
framework needs (SURVEY §5; reference resume: trainer.py:127-154 only ever
reloads onto the same DataParallel device set)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from t2igan.models.clip import ClipConfig, ClipTowerConfig, ClipWithRegionHead
from t2igan.models.factory import build_discriminators, build_generator
from t2igan.parallel.mesh import make_mesh, replicate, shard_batch
from t2igan.train.checkpoint import CheckpointManager, parse_epoch_from_path
from t2igan.train.state import gan_optimizers, init_gan_state
from t2igan.train.steps import make_gan_step

CFG = cfg_replace(
    Config(),
    TREE={"BASE_SIZE": 64, "BRANCH_NUM": 1},
    GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
         "R_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16})


@pytest.mark.slow
def test_roundtrip(tmp_path):
    gen = build_generator(CFG)
    ds = build_discriminators(CFG)
    state = init_gan_state(CFG, gen, ds, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, wait=True)
    assert mgr.latest_step() == 3
    template = jax.tree.map(np.zeros_like, state)
    restored, step = mgr.restore(template)
    assert step == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state, restored)
    mgr.close()


def test_restore_empty_dir(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "none"))
    out, step = mgr.restore({"x": np.zeros(2)})
    assert out is None and step is None
    mgr.close()


def test_parse_epoch():
    assert parse_epoch_from_path("models/netG_epoch_550.pth") == 550
    assert parse_epoch_from_path("Model/clip45.pth") == 45
    assert parse_epoch_from_path("weird") == 0


# ---------------------------------------------------------------------------
# topology-change restore (mesh 8 -> 4 -> 1 -> 8)
# ---------------------------------------------------------------------------

_TINY_CLIP = ClipConfig(
    vocab_size=512, max_positions=16, eos_token_id=511, projection_dim=32,
    image_size=32, patch_size=16, region_dim=32,
    text=ClipTowerConfig(32, 2, 2, 64),
    vision=ClipTowerConfig(48, 2, 2, 96))

_TOPO_CFG = cfg_replace(
    Config(),
    TREE={"BASE_SIZE": 64, "BRANCH_NUM": 2},
    GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
         "R_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16},
    TRAIN={"BATCH_SIZE": 8})


def _topo_batch(seed, b=8, l=16):
    rng = np.random.default_rng(seed)
    def captions():
        ids = np.full((b, l), 511, dtype=np.int32)
        mask = np.zeros((b, l), dtype=np.int32)
        lens = rng.integers(4, l + 1, size=b)
        for i, n in enumerate(lens):
            ids[i, 0] = 510
            ids[i, 1:n - 1] = rng.integers(1, 400, n - 2)
            mask[i, :n] = 1
        return ids, mask
    ids, mask = captions()
    ids2, mask2 = captions()
    return {
        "images": [rng.standard_normal((b, s, s, 3)).astype(np.float32) * 0.3
                   for s in (64, 128)],
        "ids": ids, "mask": mask, "ids_2": ids2, "mask_2": mask2,
        "class_ids": np.asarray(rng.integers(0, 3, b), np.int32),
    }


@pytest.mark.slow
def test_restore_across_device_counts(tmp_path):
    """A state saved under the 8-device data mesh must restore and train
    under 4 devices, 1 device, and (after a further save from the 1-device
    continuation) back under 8 — with every continuation's metrics and
    parameters matching the unsharded oracle.  Pure DP keeps the whole
    state replicated, so a topology change is a restore + re-placement; a
    framework bug anywhere in that chain (orbax layout capture, template
    mismatch, sharding leak into the saved arrays) fails this test."""
    clip_model = ClipWithRegionHead(_TINY_CLIP)
    clip_vars = clip_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), jnp.int32))
    gen = build_generator(_TOPO_CFG)
    ds = build_discriminators(_TOPO_CFG)
    g_tx, d_tx = gan_optimizers(_TOPO_CFG)
    state0 = init_gan_state(_TOPO_CFG, gen, ds, jax.random.PRNGKey(1))
    step = jax.jit(make_gan_step(_TOPO_CFG, clip_model, gen, ds, g_tx, d_tx))

    batch1, batch2, batch3 = _topo_batch(1), _topo_batch(2), _topo_batch(3)
    k1, k2, k3 = (jax.random.PRNGKey(i) for i in (11, 12, 13))

    # ---- unsharded oracle: three consecutive steps on one device
    o1, _ = step(state0, clip_vars["params"], batch1, k1)
    o2, om2 = step(o1, clip_vars["params"], batch2, k2)
    o3, om3 = step(o2, clip_vars["params"], batch3, k3)

    # ---- step 1 under the full 8-device mesh, then save
    mesh8 = make_mesh()
    assert mesh8.devices.size == 8
    s1, _ = step(replicate(mesh8, state0),
                 replicate(mesh8, clip_vars["params"]),
                 shard_batch(mesh8, batch1), k1)
    mgr = CheckpointManager(str(tmp_path / "topo"))
    mgr.save(1, s1, wait=True)

    template = jax.tree.map(
        lambda x: np.zeros(x.shape, x.dtype), jax.device_get(state0))

    def continue_under(n_dev, restored, batch, key):
        mesh = make_mesh(jax.devices()[:n_dev])
        st = replicate(mesh, restored)
        cp = replicate(mesh, clip_vars["params"])
        return step(st, cp, shard_batch(mesh, batch), key)

    def assert_matches(state, metrics, oracle_state, oracle_metrics):
        np.testing.assert_allclose(float(metrics["g_loss"]),
                                   float(oracle_metrics["g_loss"]),
                                   rtol=2e-4, atol=2e-4)
        for (p0, a), (p1, b) in zip(
                jax.tree_util.tree_leaves_with_path(oracle_state.g_params),
                jax.tree_util.tree_leaves_with_path(state.g_params)):
            assert p0 == p1
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=str(p0))

    # ---- restore under 4 devices and under 1 device; one more step each
    restored4, at = mgr.restore(template)
    assert at == 1
    s2_4, m2_4 = continue_under(4, restored4, batch2, k2)
    assert_matches(s2_4, m2_4, o2, om2)

    restored1, _ = mgr.restore(template)
    s2_1, m2_1 = continue_under(1, restored1, batch2, k2)
    assert_matches(s2_1, m2_1, o2, om2)

    # ---- the reverse: save the 1-device continuation, restore under 8
    mgr.save(2, s2_1, wait=True)
    restored8, at = mgr.restore(template)
    assert at == 2
    s3_8, m3_8 = continue_under(8, restored8, batch3, k3)
    assert_matches(s3_8, m3_8, o3, om3)
    mgr.close()
