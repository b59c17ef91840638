"""Is bench_train's wall clock honest?  cost_analysis says the b16 bf16
adversarial step is 6.02 TFLOP — >= 30.6 ms/step at 100% MFU — yet the
committed numbers (288.9 r1 / 337.9 r2 / 297.8 r4d) imply 3.4 ms/step.
Hypothesis: on the axon platform ``jax.block_until_ready`` on the step's
metric outputs returns before execution finishes, so the loop measured the
ENQUEUE rate on steps whose device queue drains later.

Probe: run N steps, time (a) the block_until_ready fence, then (b) an
actual jax.device_get of the same metrics.  If (b) costs ~N x 30 ms after
(a) claimed to finish, the fence is broken and every train/damsm wall
number in BASELINE.md must be re-measured with a materializing fence.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_discriminators, build_generator
    from t2igan.train.state import gan_optimizers, init_gan_state
    from t2igan.train.steps import make_gan_step
    from t2igan.utils.cache import enable_compile_cache
    from bench import _enable_cpu_fallback

    enable_compile_cache()
    b = 16
    iters = 50
    dtype = jnp.bfloat16
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
        dev = jax.devices()[0]
        clip_vars = jax.device_put(clip_vars, dev)
        state = jax.device_put(state, dev)
    else:
        clip_vars, state = init_all()

    step = jax.jit(make_gan_step(cfg, clip_model, gen, ds, g_tx, d_tx),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    ids = np.full((b, 77), clip_cfg.eos_token_id, np.int32)
    batch = {
        "images": [jnp.asarray(rng.standard_normal(
            (b, s, s, 3)).astype(np.float32)) for s in (64, 128, 256)],
        "ids": jnp.asarray(ids), "mask": jnp.ones((b, 77), jnp.int32),
        "ids_2": jnp.asarray(ids), "mask_2": jnp.ones((b, 77), jnp.int32),
        "class_ids": jnp.arange(b, dtype=jnp.int32),
    }
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        state, m = step(state, clip_vars["params"], batch, key)
    print("warmup metrics:", jax.device_get(m), flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, clip_vars["params"], batch, key)
    jax.block_until_ready(m)
    t_block = time.perf_counter() - t0
    t1 = time.perf_counter()
    vals = jax.device_get(m)
    t_get = time.perf_counter() - t1
    print(f"block fence: {iters / t_block:.2f} steps/sec "
          f"({t_block * 1e3 / iters:.2f} ms/step)", flush=True)
    print(f"device_get after fence: {t_get:.3f} s "
          f"=> honest rate {iters / (t_block + t_get):.2f} steps/sec "
          f"({(t_block + t_get) * 1e3 / iters:.2f} ms/step)", flush=True)
    print("metrics:", vals, flush=True)


if __name__ == "__main__":
    main()
