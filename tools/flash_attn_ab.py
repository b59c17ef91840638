#!/usr/bin/env python
"""On-chip A/B of TPU flash attention in the CLIP towers
(``T2IGAN_FLASH_ATTN=1``) vs the default einsum+softmax path.

Checks numerical agreement of ``encode_text_verbose`` first, then times the
DAMSM fine-tune step (the train-side surface with no custom kernel, NOTES
round-2 stretch item).  Run twice — with and without the env flag — or let
this script fork the env itself (default).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def inner():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.train.state import damsm_optimizer, init_damsm_state
    from t2igan.train.steps import make_damsm_step
    from t2igan.utils.hostinit import host_init, put_default

    flag = os.environ.get("T2IGAN_FLASH_ATTN", "0")
    b = int(os.environ.get("AB_BATCH", "48"))
    dtype = jnp.bfloat16
    cfg = cfg_replace(Config(), TREE={"BRANCH_NUM": 1, "BASE_SIZE": 224},
                      TRAIN={"BATCH_SIZE": b})
    clip_cfg = ClipConfig()
    model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    tx = damsm_optimizer(cfg, steps_per_epoch=100)
    with host_init() as on_host:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 30), jnp.int32), jnp.ones((1, 30), jnp.int32))
        state = init_damsm_state(cfg, variables, tx)
    if on_host:
        variables = put_default(variables)
        state = put_default(state)

    rng = np.random.default_rng(0)
    ids = np.full((b, 30), 1, np.int32)
    ids[:, -1] = clip_cfg.eos_token_id
    mask = np.ones((b, 30), np.int32)
    # numerical check: text encode
    words, sent = jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(ids), jnp.asarray(mask),
        method=ClipWithRegionHead.encode_text_verbose))(variables["params"])
    print(json.dumps({"mode": flag, "sent_checksum":
                      float(jnp.mean(jnp.abs(sent.astype(jnp.float32))))}))

    step = jax.jit(make_damsm_step(cfg, model, tx), donate_argnums=(0,))
    batch = {
        "images": jnp.asarray(rng.standard_normal(
            (b, 224, 224, 3)).astype(np.float32)),
        "ids": jnp.asarray(ids), "mask": jnp.asarray(mask),
        "ids_2": jnp.asarray(ids), "mask_2": jnp.asarray(mask),
        "class_ids": jnp.arange(b, dtype=jnp.int32),
    }
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"mode": flag, "metric": "damsm_step",
                      "steps_per_sec": round(1 / dt, 2),
                      "loss": float(m["loss"])}))


def main():
    if os.environ.get("AB_INNER") == "1":
        inner()
        return
    for flag in ("0", "1"):
        env = dict(os.environ, AB_INNER="1", T2IGAN_FLASH_ATTN=flag)
        print(f"=== T2IGAN_FLASH_ATTN={flag} ===", flush=True)
        subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)


if __name__ == "__main__":
    main()
