"""Checkpoint save/restore roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from t2igan.models.factory import build_discriminators, build_generator
from t2igan.train.checkpoint import CheckpointManager, parse_epoch_from_path
from t2igan.train.state import gan_optimizers, init_gan_state

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
