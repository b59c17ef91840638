"""End-to-end trainer smoke tests on tiny configs with synthetic data:
DAMSM epoch, GAN epoch, sampling sweep with R-precision, gen_example."""

import glob
import os

import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from tests.test_train_steps import TINY_CLIP

pytestmark = pytest.mark.slow


DAMSM_CFG = cfg_replace(
    Config(),
    DATA_DIR="",  # forces synthetic
    WORKERS=1,
    TREE={"BASE_SIZE": 32, "BRANCH_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16, "CAPTIONS_PER_IMAGE": 2},
    TRAIN={"BATCH_SIZE": 4, "MAX_EPOCH": 1, "SNAPSHOT_INTERVAL": 1})

GAN_CFG = cfg_replace(
    Config(),
    DATA_DIR="",
    WORKERS=1,
    TREE={"BASE_SIZE": 64, "BRANCH_NUM": 2},
    GAN={"GF_DIM": 8, "DF_DIM": 4, "Z_DIM": 16, "CONDITION_DIM": 16,
         "R_NUM": 1},
    TEXT={"EMBEDDING_DIM": 32, "WORDS_NUM": 16, "CAPTIONS_PER_IMAGE": 2},
    TRAIN={"BATCH_SIZE": 4, "MAX_EPOCH": 1, "SNAPSHOT_INTERVAL": 1,
           "CLIP_MODEL_CHECKPOINT": ""})


def _shrink_loader(trainer, n_batches=2):
    """Trim synthetic datasets so an epoch is only a couple of steps."""
    trainer.loader.dataset.n = n_batches * trainer.loader.batch_size
    trainer.loader.dataset.class_id = \
        trainer.loader.dataset.class_id[:trainer.loader.dataset.n]


def test_damsm_trainer_epoch(tmp_path):
    from t2igan.train.pretrain_damsm import DamsmTrainer

    trainer = DamsmTrainer(DAMSM_CFG, str(tmp_path / "out"),
                           clip_cfg=TINY_CLIP, words_num=16)
    trainer.train_loader.dataset.n = 8
    trainer.train_loader.dataset.class_id = \
        trainer.train_loader.dataset.class_id[:8]
    trainer.val_loader.dataset.n = 8
    trainer.val_loader.dataset.class_id = \
        trainer.val_loader.dataset.class_id[:8]
    state = trainer.train(max_epochs=1)
    assert int(state.step) == 2  # 8 samples / batch 4
    assert os.path.isfile(os.path.join(str(tmp_path / "out"),
                                       "metrics.jsonl"))
    figs = glob.glob(os.path.join(str(tmp_path / "out"), "Image", "*.png"))
    assert figs, "attention figure not written"


def test_gan_trainer_epoch_sampling_and_example(tmp_path):
    from t2igan.train.train_gan import CondGanTrainer

    out = str(tmp_path / "gan")
    trainer = CondGanTrainer(GAN_CFG, out, clip_cfg=TINY_CLIP)
    _shrink_loader(trainer)
    state = trainer.train(max_epochs=1)
    assert int(state.step) == 2
    assert glob.glob(os.path.join(out, "Image", "G_*.png"))
    # training snapshots include the attention-map overlay sheet
    # (save_img_results role, trainer.py:207-247)
    assert glob.glob(os.path.join(out, "Image", "G_*_attn.png"))

    # sampling: tiny sweep with 5 mis-captions and an 8-query target
    mean, std = trainer.sampling("valid", num_rounds=1, r_target=8,
                                 n_mis=5)
    assert 0.0 <= mean <= 1.0
    singles = glob.glob(os.path.join(out, "valid", "single", "**", "*.png"),
                        recursive=True)
    assert len(singles) >= 8

    # gen_example renders stage images + attention grids
    trainer.gen_example({"demo": ["a bird with red wings",
                                  "a small blue bird"]})
    outs = glob.glob(os.path.join(out, "demo", "*.png"))
    assert any("_g0" in p for p in outs)
    assert any("_g1" in p for p in outs)
    assert any("_a0" in p for p in outs)


def test_gan_trainer_seed_threads_into_init(tmp_path):
    """--manualSeed must control the JAX init draws (reference parity:
    main.py:109-116 seeds torch globally before model construction).
    Same seed => identical params; different seed => different params."""
    import jax
    from t2igan.train.train_gan import CondGanTrainer

    def leaves(trainer):
        return [np.asarray(x) for x in
                jax.tree_util.tree_leaves(trainer.state.g_params)]

    a = leaves(CondGanTrainer(GAN_CFG, str(tmp_path / "a"),
                              clip_cfg=TINY_CLIP, seed=7))
    b = leaves(CondGanTrainer(GAN_CFG, str(tmp_path / "b"),
                              clip_cfg=TINY_CLIP, seed=7))
    c = leaves(CondGanTrainer(GAN_CFG, str(tmp_path / "c"),
                              clip_cfg=TINY_CLIP, seed=8))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_gan_trainer_resume(tmp_path):
    from t2igan.train.train_gan import CondGanTrainer

    out = str(tmp_path / "resume")
    t1 = CondGanTrainer(GAN_CFG, out, clip_cfg=TINY_CLIP)
    _shrink_loader(t1, 1)
    t1.train(max_epochs=1)
    step1 = int(t1.state.step)
    t2 = CondGanTrainer(GAN_CFG, out, clip_cfg=TINY_CLIP)
    assert int(t2.state.step) == step1
