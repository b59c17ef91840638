#!/usr/bin/env python
"""CLI: adversarial training / evaluation of the DM-GAN.

Mirrors the reference entry ``python main.py --cfg cfg/clip_bird_DMGAN.yml
--gpu 0`` (main.py:39-49, README.md:46-53): TRAIN.FLAG=True trains;
otherwise B_VALIDATION=True runs the generation + R-precision sweep, else
captions from ``example_filenames.txt`` are rendered (main.py:185-195).
"""

import argparse
import datetime
import os
import pprint
import random

import numpy as np

from t2igan.config import cfg_from_file, cfg_replace


def parse_args():
    p = argparse.ArgumentParser(description="Train a DM-GAN network (TPU)")
    p.add_argument("--cfg", dest="cfg_file", type=str,
                   default="t2igan/configs/clip_bird_dmgan.yml")
    p.add_argument("--gpu", dest="gpu_id", type=int, default=-1)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--NET_G", type=str, default="")
    p.add_argument("--manualSeed", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override TRAIN.MAX_EPOCH (smoke runs)")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="model computation dtype (params stay f32)")
    return p.parse_args()


def load_example_captions(data_dir):
    """Read example_filenames.txt -> {name: [caption, ...]}
    (main.py:51-98, without the legacy vocabulary round-trip)."""
    path = os.path.join(data_dir, "example_filenames.txt")
    out = {}
    with open(path) as f:
        names = [n for n in f.read().split("\n") if n]
    for name in names:
        with open(os.path.join(data_dir, name + ".txt")) as f:
            sentences = [s for s in f.read().split("\n") if s]
        out[name[name.rfind("/") + 1:]] = sentences
    return out


def main():
    args = parse_args()
    cfg = cfg_from_file(args.cfg_file)
    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.NET_G:
        cfg = cfg_replace(cfg, TRAIN={"NET_G": args.NET_G})
    if args.data_dir:
        cfg = cfg_replace(cfg, DATA_DIR=args.data_dir)
    print("Using config:")
    pprint.pprint(cfg)

    seed = args.manualSeed
    if not cfg.TRAIN.FLAG:
        seed = 100
    elif seed is None:
        seed = random.randint(1, 10000)
    random.seed(seed)
    np.random.seed(seed)
    print(f"Seed: {seed}")

    timestamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    output_dir = args.output_dir or \
        f"./output/{cfg.DATASET_NAME}_{cfg.CONFIG_NAME}_{timestamp}"

    from t2igan.train.train_gan import CondGanTrainer
    split = "train" if cfg.TRAIN.FLAG else "test"
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    trainer = CondGanTrainer(cfg, output_dir, split=split, dtype=dtype,
                             seed=seed)
    if cfg.TRAIN.FLAG:
        trainer.train(max_epochs=args.max_epochs)
    elif cfg.B_VALIDATION:
        trainer.sampling("valid")
    else:
        trainer.gen_example(load_example_captions(cfg.DATA_DIR))


if __name__ == "__main__":
    main()
