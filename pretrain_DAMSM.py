#!/usr/bin/env python
"""CLI: fine-tune CLIP with DAMSM + contrastive losses.

Mirrors the reference entry ``python pretrain_DAMSM.py --cfg
cfg/DAMSM/bird.yml --gpu 0`` (pretrain_DAMSM.py:47-56, README.md:36-44).
The ``--gpu`` flag is accepted for CLI parity and ignored on TPU.
"""

import argparse
import os
import pprint
import random

import numpy as np

from t2igan.config import cfg_from_file


def parse_args():
    p = argparse.ArgumentParser(description="Train a DAMSM network (TPU)")
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="t2igan/configs/damsm/bird.yml")
    p.add_argument("--gpu", dest="gpu_id", type=int, default=0)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--manualSeed", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override TRAIN.MAX_EPOCH (smoke runs)")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="model computation dtype (params stay f32)")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = cfg_from_file(args.cfg_file)
    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.data_dir:
        from t2igan.config import cfg_replace
        cfg = cfg_replace(cfg, DATA_DIR=args.data_dir)
    print("Using config:")
    pprint.pprint(cfg)

    seed = args.manualSeed
    if not cfg.TRAIN.FLAG:
        seed = 100          # eval pins the seed (pretrain_DAMSM.py:391-392)
    elif seed is None:
        seed = random.randint(1, 10000)
    random.seed(seed)
    np.random.seed(seed)
    print(f"Seed: {seed}")

    output_dir = args.output_dir or \
        f"./output/{cfg.DATASET_NAME}_{cfg.CONFIG_NAME}/"
    from t2igan.train.pretrain_damsm import DamsmTrainer
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    trainer = DamsmTrainer(cfg, output_dir, dtype=dtype)
    trainer.train(max_epochs=args.max_epochs)


if __name__ == "__main__":
    main()
