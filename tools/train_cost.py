#!/usr/bin/env python
"""Print the compiled adversarial train step's XLA cost analysis (FLOPs /
bytes accessed) at the shipped defaults — the numerator of the train-step
MFU story and the denominator of its structural floor:

    floor_ms = max(flops / peak_flops, bytes / peak_hbm_bw)

Run right after ``bench.py --mode train`` so the persistent compile cache
makes the ``.compile()`` a cache hit.  Flags mirror bench: --batch --dtype.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = p.parse_args()

    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_discriminators, build_generator
    from t2igan.train.state import gan_optimizers, init_gan_state
    from t2igan.train.steps import make_gan_step
    from bench import _enable_cpu_fallback

    b = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = cfg_replace(Config(),
                      GAN={"GF_DIM": 64, "DF_DIM": 32, "R_NUM": 2},
                      TEXT={"EMBEDDING_DIM": 512, "WORDS_NUM": 77},
                      TRAIN={"BATCH_SIZE": b})
    clip_cfg = ClipConfig()
    clip_model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    gen = build_generator(cfg, dtype=dtype)
    ds = build_discriminators(cfg, dtype=dtype)
    g_tx, d_tx = gan_optimizers(cfg)
    cpu = _enable_cpu_fallback()

    def init_all():
        clip_vars = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32), jnp.ones((1, 77), jnp.int32))
        state = init_gan_state(cfg, gen, ds, jax.random.PRNGKey(1))
        return clip_vars, state

    if cpu is not None:
        with jax.default_device(cpu):
            clip_vars, state = init_all()
    else:
        clip_vars, state = init_all()

    ids = np.full((b, 77), clip_cfg.eos_token_id, np.int32)
    batch = {
        "images": [jnp.zeros((b, s, s, 3), jnp.float32)
                   for s in (64, 128, 256)],
        "ids": jnp.asarray(ids), "mask": jnp.ones((b, 77), jnp.int32),
        "ids_2": jnp.asarray(ids), "mask_2": jnp.ones((b, 77), jnp.int32),
        "class_ids": jnp.arange(b, dtype=jnp.int32),
    }
    step = jax.jit(make_gan_step(cfg, clip_model, gen, ds, g_tx, d_tx),
                   donate_argnums=(0,))
    compiled = step.lower(state, clip_vars["params"], batch,
                          jax.random.PRNGKey(2)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    byts = ca.get("bytes accessed", float("nan"))
    from bench import V5E_BF16_PEAK_TFLOPS
    peak_tf = V5E_BF16_PEAK_TFLOPS * 1e12
    hbm = 819.0e9  # v5e HBM bandwidth
    print(json.dumps({
        "batch": b, "dtype": args.dtype,
        "tflops_per_step": round(flops / 1e12, 3),
        "gb_accessed_per_step": round(byts / 1e9, 3),
        "flop_floor_ms": round(flops / peak_tf * 1e3, 2),
        "hbm_floor_ms": round(byts / hbm * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
