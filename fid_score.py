#!/usr/bin/env python
"""CLI: FID between generated and real image directories.

Mirrors the reference ``python fid_score.py --data bird --dims 2048
--batch_size 50`` (fid_score.py:21-34, README.md:55-58), including the
per-dataset path presets (fid_score.py:238-241); explicit ``--path`` pairs
are also accepted.  Inception weights load from a local torch checkpoint
(``--inception_ckpt`` or $T2IGAN_INCEPTION_CKPT) — zero-egress environments
cannot download them; without weights the score is computed with a fresh
random backbone and a loud warning (useful only for pipeline smoke tests).
"""

import argparse
import os

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="FID (TPU)")
    p.add_argument("--data", type=str, default=None,
                   choices=[None, "bird", "coco"])
    p.add_argument("--path", type=str, nargs=2, default=None,
                   help="generated-dir real-dir (overrides --data presets)")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--dims", type=int, default=2048,
                   choices=[64, 192, 768, 2048],
                   help="feature tap: 64/192/768/2048 map to the same "
                        "blocks as pytorch-fid (inception.py:24-29)")
    p.add_argument("--inception_ckpt", type=str,
                   default=os.environ.get("T2IGAN_INCEPTION_CKPT", ""))
    return p.parse_args()


def load_inception_variables(ckpt_path):
    from t2igan.models.inception import (InceptionV3,
                                         convert_torch_inception_state)
    if ckpt_path and os.path.isfile(ckpt_path):
        import torch
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        print(f"Loaded FID inception weights: {ckpt_path}")
        return convert_torch_inception_state(sd)
    print("WARNING: no FID inception checkpoint found — using random "
          "weights; scores are NOT comparable to the reference.")
    model = InceptionV3(variant="fid", num_classes=1008)
    import jax.numpy as jnp
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))


def main():
    args = parse_args()
    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.path:
        paths = args.path
    elif args.data == "bird":
        paths = ["models/netG_bird/valid/single", "data/birds/CUB_200_2011/images"]
    elif args.data == "coco":
        paths = ["models/netG_coco/valid/single", "data/coco/val2014"]
    else:
        raise SystemExit("pass --data {bird,coco} or --path GEN REAL")

    from t2igan.evaluation.fid import (calculate_fid_given_paths,
                                       make_activation_fn)
    variables = load_inception_variables(args.inception_ckpt)
    fid = calculate_fid_given_paths(
        paths, make_activation_fn(variables, dims=args.dims),
        args.batch_size)
    print("FID: ", fid)


if __name__ == "__main__":
    main()
