"""Model builders wired to the Config.

Mirrors the construction sites in the reference: ``condGANTrainer.build_models``
(trainer.py:73-160) picks G_NET/G_DCGAN and one discriminator per branch;
here the same selection is a pure function of the config.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp

from t2igan.config import Config
from t2igan.models.discriminator import DNetWithHeads
from t2igan.models.generator import GDCGan, GNet


def build_generator(cfg: Config, dtype: Any = jnp.float32):
    import logging
    import os

    cls = GDCGan if cfg.GAN.B_DCGAN else GNet
    env = os.environ.get("T2IGAN_UPBLOCK")
    if env is not None and env != cfg.GAN.UPBLOCK:
        logging.getLogger("t2igan").warning(
            "UpBlock variant overridden by T2IGAN_UPBLOCK=%s "
            "(config GAN.UPBLOCK=%s)", env, cfg.GAN.UPBLOCK)
    env = os.environ.get("T2IGAN_PHASED_TAIL")
    if env is not None and (env == "1") != cfg.GAN.PHASED_TAIL:
        logging.getLogger("t2igan").warning(
            "Phased eval tail overridden by T2IGAN_PHASED_TAIL=%s "
            "(config GAN.PHASED_TAIL=%s)", env, cfg.GAN.PHASED_TAIL)
    env = os.environ.get("T2IGAN_PHASED_TAIL_TRAIN")
    if env is not None and (env == "1") != cfg.GAN.PHASED_TAIL_TRAIN:
        logging.getLogger("t2igan").warning(
            "Phased train tail overridden by T2IGAN_PHASED_TAIL_TRAIN=%s "
            "(config GAN.PHASED_TAIL_TRAIN=%s)", env,
            cfg.GAN.PHASED_TAIL_TRAIN)
    return cls(
        gf_dim=cfg.GAN.GF_DIM,
        nef=cfg.TEXT.EMBEDDING_DIM,
        condition_dim=cfg.GAN.CONDITION_DIM,
        branch_num=cfg.TREE.BRANCH_NUM,
        num_residual=cfg.GAN.R_NUM,
        dtype=dtype,
        upblock=cfg.GAN.UPBLOCK,
        fused_tail=cfg.GAN.FUSED_TAIL,
        phased_tail=cfg.GAN.PHASED_TAIL,
        phased_tail_train=cfg.GAN.PHASED_TAIL_TRAIN,
    )


def build_discriminators(cfg: Config, dtype: Any = jnp.float32
                         ) -> List[DNetWithHeads]:
    """One discriminator per pyramid branch (trainer.py:104-111); under
    B_DCGAN only the finest-scale D with no unconditional head
    (trainer.py:93-102)."""
    if min(cfg.branch_sizes) < 64:
        raise ValueError(
            f"discriminators need >=64^2 inputs (trunk downsamples 16x to "
            f"a 4x4 code, model.py:654-701) but the pyramid is "
            f"{cfg.branch_sizes}; raise TREE.BASE_SIZE to at least 64")
    if cfg.GAN.B_DCGAN:
        return [DNetWithHeads(ndf=cfg.GAN.DF_DIM, nef=cfg.TEXT.EMBEDDING_DIM,
                              img_size=cfg.final_size, b_jcu=False,
                              dtype=dtype)]
    return [
        DNetWithHeads(ndf=cfg.GAN.DF_DIM, nef=cfg.TEXT.EMBEDDING_DIM,
                      img_size=size, b_jcu=True, dtype=dtype)
        for size in cfg.branch_sizes
    ]
