#!/usr/bin/env python
"""One-command quality-parity runbook: checkpoints in, BASELINE.md rows out.

The sealed build environment has no CUB/COCO and no pretrained weights, so
the reference's headline quality metrics (FID / IS / R-precision; protocol
trainer.py:485-613, fid_score.py:206-241, inception_score.py:35-103) cannot
be measured here.  This script makes parity a single command the moment the
artifacts exist:

    python tools/quality_parity.py \
        --cfg t2igan/configs/eval_clip_bird.yml \
        --data_dir data/birds \
        --clip_ckpt output/pretrained/clip350.pth \
        --net_g models/netG_bird/netG_epoch_600.pth \
        --fid_inception_ckpt weights/pt_inception-2015-12-05.pth \
        --is_inception_ckpt weights/inception_v3_torchvision.pth

It runs: tokenizer load -> torch-checkpoint converters (all proven <=1e-4
in tests/test_torch_parity_gan.py / test_clip.py / test_inception_golden.py)
-> generation + R-precision sweep -> FID(generated, real) -> IS(generated)
-> appends a dated result block to BASELINE.md.

``--dry_run`` exercises the full pipeline end-to-end on the synthetic
dataset with random weights and a tiny sweep (no artifacts needed) — the
numbers are meaningless but every wire is pulled; BASELINE.md is left
untouched unless ``--write_baseline`` is passed explicitly.
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--cfg", default="t2igan/configs/eval_clip_bird.yml")
    p.add_argument("--data_dir", default="")
    p.add_argument("--clip_ckpt", default="",
                   help="clip*.pth from DAMSM pretraining")
    p.add_argument("--net_g", default="",
                   help="netG_epoch_*.pth (reference torch) or .npz export")
    p.add_argument("--fid_inception_ckpt",
                   default=os.environ.get("T2IGAN_INCEPTION_CKPT", ""),
                   help="pt_inception-2015-12-05 weights (pytorch-fid)")
    p.add_argument("--is_inception_ckpt",
                   default=os.environ.get("T2IGAN_IS_INCEPTION_CKPT", ""),
                   help="torchvision inception_v3 weights")
    p.add_argument("--real_dir", default="",
                   help="real-image dir for FID; defaults per dataset "
                        "(fid_score.py:238-241)")
    p.add_argument("--output_dir", default="")
    p.add_argument("--r_target", type=int, default=30000,
                   help="R-precision query count (trainer.py:605)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="override TRAIN.BATCH_SIZE")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--dry_run", action="store_true",
                   help="synthetic data + random weights + tiny sweep; "
                        "validates the pipeline, not the scores")
    p.add_argument("--platform", default=None, choices=[None, "cpu"],
                   help="force the CPU backend (the image's sitecustomize "
                        "latches JAX_PLATFORMS, so the switch must happen "
                        "in-process before any computation)")
    p.add_argument("--write_baseline", action="store_true", default=None,
                   help="append results to BASELINE.md (default: yes, "
                        "unless --dry_run)")
    p.add_argument("--baseline_md",
                   default=os.path.join(os.path.dirname(
                       os.path.dirname(os.path.abspath(__file__))),
                       "BASELINE.md"))
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from t2igan.config import cfg_from_file, cfg_replace

    cfg = cfg_from_file(args.cfg)
    over = {"B_VALIDATION": True}
    train_over = {"FLAG": False}
    if args.data_dir:
        over["DATA_DIR"] = args.data_dir
    if args.dry_run:
        over["DATA_DIR"] = ""          # synthetic fallback dataset
        train_over["BATCH_SIZE"] = 8
        args.r_target = min(args.r_target, 64)
    if args.net_g:
        train_over["NET_G"] = args.net_g
    if args.clip_ckpt:
        train_over["CLIP_MODEL_CHECKPOINT"] = args.clip_ckpt
    if args.batch_size:
        train_over["BATCH_SIZE"] = args.batch_size
    cfg = cfg_replace(cfg, TRAIN=train_over, **over)

    stamp = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    output_dir = args.output_dir or f"./output/quality_parity_{stamp}"
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    results = {"config": args.cfg, "dataset": cfg.DATASET_NAME,
               "net_g": args.net_g or "(random init)",
               "clip": args.clip_ckpt or "(random init)",
               "dry_run": bool(args.dry_run)}

    import time as _time

    def _phase(name, t0=[None]):
        now = _time.perf_counter()
        if t0[0] is not None:
            print(f"[quality_parity] ...done in {now - t0[0]:.1f}s",
                  flush=True)
        t0[0] = now
        if name:
            print(f"[quality_parity] {name}", flush=True)

    # ---- 1. generation sweep + R-precision (trainer.py:485-613) ----
    from t2igan.train.train_gan import CondGanTrainer

    _phase("building models (init on host)")
    trainer = CondGanTrainer(cfg, output_dir, split="test", dtype=dtype)
    num_rounds = 1 if args.dry_run else 11
    # dry_run: skip the data-parallel eval path — compiling the GSPMD-
    # sharded full-size sampler on the virtual 8-CPU mesh costs many extra
    # minutes for no coverage (DP-vs-single equivalence is pinned at model
    # scale in test_train_steps.py).
    _phase("generation sweep + R-precision (compiles sampler + rank_fn)")
    r_mean, r_std = trainer.sampling("valid", num_rounds=num_rounds,
                                     r_target=args.r_target,
                                     data_parallel=not args.dry_run)
    results["r_precision_mean"] = r_mean
    results["r_precision_std"] = r_std
    gen_dir = os.path.join(output_dir, "valid", "single")

    # ---- 2. FID (fid_score.py:206-241) ----
    real_dir = args.real_dir
    if not real_dir and not args.dry_run:
        preset = {"birds": "CUB_200_2011/images", "coco": "val2014"}
        real_dir = os.path.join(cfg.DATA_DIR,
                                preset.get(cfg.DATASET_NAME, ""))
    if args.dry_run:
        real_dir = gen_dir  # FID(X, X) == 0: exactness smoke
    from fid_score import load_inception_variables

    from t2igan.evaluation.fid import (calculate_fid_given_paths,
                                       make_activation_fn)
    _phase("FID")
    inc_vars = load_inception_variables(args.fid_inception_ckpt)
    act_fn = make_activation_fn(inc_vars, dims=2048)
    fid = calculate_fid_given_paths([gen_dir, real_dir], act_fn,
                                    batch_size=50)
    results["fid"] = float(fid)

    # ---- 3. Inception Score (inception_score.py:35-103) ----
    _phase("Inception Score")
    from t2igan.evaluation.inception_score import inception_score
    from t2igan.models.inception import (InceptionV3,
                                         convert_torch_inception_state)
    if args.is_inception_ckpt and os.path.isfile(args.is_inception_ckpt):
        import torch
        sd = torch.load(args.is_inception_ckpt, map_location="cpu",
                        weights_only=True)
        is_vars = convert_torch_inception_state(sd, num_classes=1000)
    else:
        print("WARNING: no IS inception checkpoint — random backbone "
              "(IS == 1.0 expected).")
        import jax
        is_vars = InceptionV3(variant="torchvision", num_classes=1000).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    is_mean, is_std = inception_score(gen_dir, is_vars)
    results["is_mean"] = float(is_mean)
    results["is_std"] = float(is_std)

    _phase("")
    print(json.dumps(results, indent=2))

    # ---- 4. record in BASELINE.md ----
    write = args.write_baseline
    if write is None:
        write = not args.dry_run
    if write:
        date = datetime.date.today().isoformat()
        block = (
            f"\n### Quality parity run — {date}\n\n"
            f"Protocol: trainer.py:485-613 / fid_score.py / "
            f"inception_score.py equivalents via tools/quality_parity.py "
            f"(cfg `{args.cfg}`, netG `{results['net_g']}`, CLIP "
            f"`{results['clip']}`"
            + (", DRY RUN — synthetic data, random weights"
               if args.dry_run else "") + ").\n\n"
            f"| Metric | Value |\n|---|---|\n"
            f"| FID ({cfg.DATASET_NAME}) | {results['fid']:.3f} |\n"
            f"| Inception Score | {results['is_mean']:.3f} ± "
            f"{results['is_std']:.3f} |\n"
            f"| CLIP R-precision | {100 * r_mean:.2f}% ± "
            f"{100 * r_std:.2f}% (n≈{args.r_target}) |\n")
        with open(args.baseline_md, "a") as f:
            f.write(block)
        print(f"Appended results to {args.baseline_md}")
    return results


if __name__ == "__main__":
    main()
