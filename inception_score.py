#!/usr/bin/env python
"""CLI: Inception Score over a directory of generated images.

Mirrors the reference ``python inception_score.py --data bird``
(inception_score.py:105-118, README.md:60-62).  Weights load from a local
torchvision inception checkpoint (``--inception_ckpt`` or
$T2IGAN_IS_INCEPTION_CKPT); without one, a random backbone is used with a
loud warning (pipeline smoke only).
"""

import argparse
import os

import jax


def parse_args():
    p = argparse.ArgumentParser(description="Inception Score (TPU)")
    p.add_argument("--data", type=str, default=None,
                   choices=[None, "bird", "coco"])
    p.add_argument("--path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--inception_ckpt", type=str,
                   default=os.environ.get("T2IGAN_IS_INCEPTION_CKPT", ""))
    return p.parse_args()


def main():
    args = parse_args()
    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()
    path = args.path
    if path is None:
        if args.data == "bird":
            path = "models/netG_bird/valid/single"
        elif args.data == "coco":
            path = "models/netG_coco/valid/single"
        else:
            raise SystemExit("pass --data {bird,coco} or --path DIR")

    from t2igan.models.inception import (InceptionV3,
                                         convert_torch_inception_state)
    if args.inception_ckpt and os.path.isfile(args.inception_ckpt):
        import torch
        sd = torch.load(args.inception_ckpt, map_location="cpu",
                        weights_only=True)
        variables = convert_torch_inception_state(sd, num_classes=1000)
        print(f"Loaded inception weights: {args.inception_ckpt}")
    else:
        print("WARNING: no inception checkpoint found — using random "
              "weights; scores are NOT comparable to the reference.")
        import jax.numpy as jnp
        model = InceptionV3(variant="torchvision", num_classes=1000)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 299, 299, 3)))

    from t2igan.evaluation.inception_score import inception_score
    mean, std = inception_score(path, variables, args.batch_size,
                                args.splits)
    print(f"IS mean: {mean:.4f} std: {std:.4f}")


if __name__ == "__main__":
    main()
