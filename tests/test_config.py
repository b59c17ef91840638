"""Config system tests: default parity + merge validation semantics.

Mirrors the behaviors of the reference's miscc/config.py (defaults at
config.py:13-78, merge validation at :81-112).
"""

import os

import pytest

from t2igan.config import Config, cfg_from_dict, cfg_from_file, cfg_replace

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "t2igan", "configs")


def test_defaults_match_reference():
    cfg = Config()
    # Spot-check reference defaults (miscc/config.py:13-78).
    assert cfg.DATASET_NAME == "birds"
    assert cfg.WORKERS == 6
    assert cfg.TREE.BRANCH_NUM == 3
    assert cfg.TREE.BASE_SIZE == 64
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.TRAIN.MAX_EPOCH == 600
    assert cfg.TRAIN.DISCRIMINATOR_LR == 2e-4
    assert cfg.TRAIN.GENERATOR_LR == 2e-4
    assert cfg.TRAIN.BACKBONE_LR == 2e-5
    assert cfg.TRAIN.LINEAR_LR == 2e-3
    assert cfg.TRAIN.RNN_GRAD_CLIP == 0.25
    assert cfg.TRAIN.SMOOTH.GAMMA1 == 5.0
    assert cfg.TRAIN.SMOOTH.GAMMA3 == 10.0
    assert cfg.GAN.GF_DIM == 128
    assert cfg.GAN.DF_DIM == 64
    assert cfg.GAN.Z_DIM == 100
    assert cfg.GAN.CONDITION_DIM == 512
    assert cfg.TEXT.EMBEDDING_DIM == 512
    assert cfg.TEXT.WORDS_NUM == 77


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        cfg_from_dict({"NOT_A_KEY": 1})
    with pytest.raises(KeyError):
        cfg_from_dict({"TRAIN": {"NOPE": 2}})


def test_type_mismatch_rejected():
    with pytest.raises(ValueError):
        cfg_from_dict({"DATASET_NAME": 3})
    with pytest.raises(ValueError):
        cfg_from_dict({"TRAIN": {"FLAG": "yes"}})


def test_int_for_float_accepted():
    cfg = cfg_from_dict({"TRAIN": {"SMOOTH": {"LAMBDA": 5}}})
    assert cfg.TRAIN.SMOOTH.LAMBDA == 5.0
    assert isinstance(cfg.TRAIN.SMOOTH.LAMBDA, float)


def test_immutable():
    cfg = Config()
    with pytest.raises(Exception):
        cfg.DATASET_NAME = "flowers"


@pytest.mark.parametrize("name", [
    "clip_bird_dmgan.yml", "clip_coco_dmgan.yml",
    "eval_clip_bird.yml", "eval_clip_coco.yml",
    "bird_dmgan.yml", "coco_dmgan.yml",
    "damsm/bird.yml", "damsm/coco.yml",
])
def test_shipped_yamls_parse(name):
    cfg = cfg_from_file(os.path.join(CONFIG_DIR, name))
    assert cfg.CONFIG_NAME in ("DMGAN", "DAMSM_CLIP")


def test_shipped_bird_gan_values():
    cfg = cfg_from_file(os.path.join(CONFIG_DIR, "clip_bird_dmgan.yml"))
    # Reference clip_bird_DMGAN.yml values.
    assert cfg.GAN.GF_DIM == 64 and cfg.GAN.DF_DIM == 32
    assert cfg.GAN.R_NUM == 2
    assert cfg.TRAIN.BATCH_SIZE == 4
    assert cfg.TRAIN.SMOOTH.LAMBDA == 10.0
    assert cfg.branch_sizes == (64, 128, 256)
    assert cfg.final_size == 256


def test_shipped_damsm_values():
    cfg = cfg_from_file(os.path.join(CONFIG_DIR, "damsm", "bird.yml"))
    assert cfg.TREE.BASE_SIZE == 224 and cfg.TREE.BRANCH_NUM == 1
    assert cfg.TRAIN.BATCH_SIZE == 48
    assert cfg.TRAIN.BACKBONE_LR == 2e-5
    assert cfg.final_size == 224


def test_reference_yamls_parse_if_present():
    """The same YAML files the reference ships must parse unchanged."""
    ref_dir = "/root/reference/DMGAN+CLIP/code/cfg"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference not mounted")
    for root, _, names in os.walk(ref_dir):
        for n in names:
            if n.endswith(".yml"):
                cfg_from_file(os.path.join(root, n))


def test_cfg_replace():
    cfg = Config()
    cfg2 = cfg_replace(cfg, TRAIN={"BATCH_SIZE": 8})
    assert cfg2.TRAIN.BATCH_SIZE == 8
    assert cfg.TRAIN.BATCH_SIZE == 64


def test_coco_config_drives_model_shapes():
    """COCO run config wires R_NUM=3 and 5 captions/image into the models
    (cfg/clip_coco_DMGAN.yml values)."""
    from t2igan.models.factory import build_discriminators, build_generator

    cfg = cfg_from_file(os.path.join(CONFIG_DIR, "clip_coco_dmgan.yml"))
    g = build_generator(cfg)
    assert g.num_residual == 3
    assert g.gf_dim == 64 and g.nef == 512
    ds = build_discriminators(cfg)
    assert [d.img_size for d in ds] == [64, 128, 256]
    assert cfg.TEXT.CAPTIONS_PER_IMAGE == 5


def test_reference_yaml_drives_factory_if_present():
    """The reference's own YAML must produce the same model family."""
    ref = "/root/reference/DMGAN+CLIP/code/cfg/clip_bird_DMGAN.yml"
    if not os.path.isfile(ref):
        pytest.skip("reference not mounted")
    from t2igan.models.factory import build_generator

    cfg = cfg_from_file(ref)
    g = build_generator(cfg)
    assert g.gf_dim == 64 and g.num_residual == 2 and g.branch_num == 3
