#!/usr/bin/env python
"""Generator sub-stage microbenchmark (evidence for the gen+eval headline).

Times each architectural piece of the cascaded generator in isolation on the
accelerator and reports achieved TFLOP/s + MFU against the v5e bf16 peak, so
optimization effort goes where the time actually is.  Stages:

* init      — InitStageG (z,c -> 64^2 x ngf)
* next64    — NextStageG at 64^2 (memory read + 2 ResBlocks + up to 128^2)
* next128   — NextStageG at 128^2 (the FLOP-dominant stage)
* resblocks — the bare 2x ResBlock chain at 128^2 (no memory/gates)
* upblock   — the final UpBlock 128^2 -> 256^2
* to_rgb    — GetImageG at 256^2

Run: python tools/microbench_gen.py --batch 128 --iters 20
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import V5E_BF16_PEAK_TFLOPS  # single pinned constant (197, measured)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import os

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None

    from t2igan.models.generator import (GetImageG, InitStageG, NextStageG,
                                         ResBlock, UpBlock)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, ngf, L = args.batch, 64, 77
    rng = jax.random.PRNGKey(0)

    def flops_conv(hw, cin, cout, k=3):
        return 2 * b * hw * hw * cin * cout * k * k

    # (module, array inputs, trailing static args, analytic fwd FLOPs)
    stages = {}

    init = InitStageG(ngf * 16, dtype)
    z = jnp.zeros((b, 100), dtype)
    c = jnp.zeros((b, 512), dtype)
    f_init = (2 * b * 612 * 1024 * 4 * 4 * 2
              + flops_conv(8, 1024, 1024) + flops_conv(16, 512, 512)
              + flops_conv(32, 256, 256) + flops_conv(64, 128, 128))
    stages["init"] = (init, (z, c), (False,), f_init)

    words = jnp.zeros((b, L, 512), dtype)
    pad = jnp.zeros((b, L), bool)

    next64 = NextStageG(ngf, 512, 2, dtype)
    h64 = jnp.zeros((b, 64, 64, ngf), dtype)
    f_res = flops_conv(64, 128, 256) + flops_conv(64, 128, 128)
    f_n64 = (2 * f_res + flops_conv(128, 128, 128)
             + 2 * b * 64 * 64 * ngf * L * 2)  # attn logits+readout
    stages["next64"] = (next64, (h64, words, pad), (False, False), f_n64)

    next128 = NextStageG(ngf, 512, 2, dtype)
    h128 = jnp.zeros((b, 128, 128, ngf), dtype)
    f_res128 = flops_conv(128, 128, 256) + flops_conv(128, 128, 128)
    f_n128 = (2 * f_res128 + flops_conv(256, 128, 128)
              + 2 * b * 128 * 128 * ngf * L * 2)
    stages["next128"] = (next128, (h128, words, pad), (False, False),
                         f_n128)

    class ResChain:
        """2x ResBlock at 128^2, channels 2*ngf — bare conv chain."""

        def init(self, key, x, train):
            import flax.linen as nn

            class M(nn.Module):
                @nn.compact
                def __call__(self, x, train):
                    x = ResBlock(2 * ngf, dtype)(x, train)
                    return ResBlock(2 * ngf, dtype)(x, train)

            self.m = M()
            return self.m.init(key, x, train)

        def apply(self, v, x, train):
            return self.m.apply(v, x, train)

    chain = ResChain()
    h2 = jnp.zeros((b, 128, 128, 2 * ngf), dtype)
    stages["resblocks"] = (chain, (h2,), (False,), 2 * f_res128)

    up = UpBlock(ngf, dtype)
    stages["upblock"] = (up, (h2,), (False,), flops_conv(256, 128, 128))

    rgb = GetImageG(dtype)
    h256 = jnp.zeros((b, 256, 256, ngf), dtype)
    stages["to_rgb"] = (rgb, (h256,), (), flops_conv(256, 64, 3))

    for name, (mod, inputs, trailing, flops) in stages.items():
        # init on host with the jnp attention path (return_attn=True) — the
        # Pallas kernel can't lower on CPU; apply() then uses the fused path.
        init_trailing = tuple(True if i > 0 else t
                              for i, t in enumerate(trailing))
        if cpu is not None:
            with jax.default_device(cpu):
                variables = mod.init(rng, *inputs, *init_trailing)
            variables = jax.device_put(variables, jax.devices()[0])
        else:
            variables = mod.init(rng, *inputs, *init_trailing)
        fn = jax.jit(lambda v, *a, m=mod, t=trailing: m.apply(v, *a, *t))
        for _ in range(args.warmup):
            out = fn(variables, *inputs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(variables, *inputs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        tflops = flops / dt / 1e12
        print(json.dumps({
            "stage": name, "ms_per_batch": round(dt * 1e3, 3),
            "ms_per_image": round(dt * 1e3 / b, 4),
            "analytic_gflops_per_image": round(flops / b / 1e9, 2),
            "achieved_tflops": round(tflops, 1),
            "mfu_vs_v5e_bf16": round(tflops / V5E_BF16_PEAK_TFLOPS, 3)}),
            flush=True)


if __name__ == "__main__":
    main()
