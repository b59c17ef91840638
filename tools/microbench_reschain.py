#!/usr/bin/env python
"""Standalone A/B of the fused stage-tail kernel (ops/pallas/reschain.py)
vs the XLA folded-weight chain, at the production shapes of both
refinement stages (64^2 and 128^2, C=128), across row-chunk sizes.

Run on the TPU (small graphs — each compile is ~1 min through the relay
and cached).  Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--stages", nargs="*", type=int, default=[64, 128])
    p.add_argument("--chunks", nargs="*", type=int, default=[0, 8, 16, 32])
    p.add_argument("--rgb", action="store_true",
                   help="also time the fused-RGB final-stage form")
    return p.parse_args()


def main():
    args = parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from t2igan.ops.pallas.reschain import (resblock_chain_up_fused,
                                            resblock_chain_up_reference)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    b, c, n_res = args.batch, 128, 2

    def t(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * scale)

    def timeit(fn, x):
        # Perturb the input each iteration (cheap on-device add) so no
        # layer of the stack can replay a cached identical execution, and
        # fold the output into a checksum that must stay finite.
        perturb = jax.jit(lambda xx, i: xx + (i * 1e-6).astype(xx.dtype))
        checks = []
        for i in range(args.warmup):
            out = fn(perturb(x, jnp.float32(i)))
            jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = fn(perturb(x, jnp.float32(i)))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        leaf = jax.tree.leaves(out)[0]
        checks.append(float(jnp.mean(jnp.abs(leaf.astype(jnp.float32)))))
        assert np.isfinite(checks[-1]), "non-finite kernel output"
        return dt, checks[-1]

    for hw in args.stages:
        x = jnp.asarray(rng.standard_normal(
            (b, hw, hw, c)).astype(np.float32)).astype(dtype)
        rb = [(t(3, 3, c, 2 * c).astype(dtype), t(2 * c) + 1.0, t(2 * c),
               t(3, 3, c, c).astype(dtype), t(c) + 1.0, t(c))
              for _ in range(n_res)]
        up_k = t(3, 3, c, c).astype(dtype)
        up_s, up_b = t(c) + 1.0, t(c)
        rgb_k = t(3, 3, c // 2, 3).astype(dtype) if args.rgb else None

        ref = jax.jit(lambda xx: resblock_chain_up_reference(
            xx, rb, up_k, up_s, up_b))
        sec, chk = timeit(ref, x)
        # per-image algorithmic GF of the chain (halo overhead excluded)
        gf = 2 * hw * hw * (n_res * 9 * (c * 2 * c + c * c)
                            + 16 * c * c) / 1e9
        print(json.dumps({
            "metric": f"reschain/{hw}x{hw}/xla_ref", "ms_per_batch":
            round(sec * 1e3, 3), "imgs_per_sec": round(b / sec, 1),
            "mfu_bf16": round(b * gf / sec / 1e3 / 394.0, 3),
            "checksum": round(chk, 5)}))

        for chunk in args.chunks:
            rc = None if chunk == 0 else chunk
            if rc is not None and hw % rc:
                continue
            try:
                fused = jax.jit(lambda xx, rc=rc: resblock_chain_up_fused(
                    xx, rb, up_k, up_s, up_b, row_chunk=rc))
                sec, chk = timeit(fused, x)
                label = "auto" if rc is None else str(rc)
                print(json.dumps({
                    "metric": f"reschain/{hw}x{hw}/fused_t{label}",
                    "ms_per_batch": round(sec * 1e3, 3),
                    "imgs_per_sec": round(b / sec, 1),
                    "mfu_bf16": round(b * gf / sec / 1e3 / 394.0, 3),
                    "checksum": round(chk, 5)}))
            except Exception as e:
                print(json.dumps({
                    "metric": f"reschain/{hw}x{hw}/fused_t{chunk}",
                    "error": str(e)[:200]}))
        if args.rgb:
            try:
                fusedr = jax.jit(lambda xx: resblock_chain_up_fused(
                    xx, rb, up_k, up_s, up_b, rgb_kernel=rgb_k,
                    want_h=False))
                sec, chk = timeit(fusedr, x)
                print(json.dumps({
                    "metric": f"reschain/{hw}x{hw}/fused_rgb_tauto",
                    "ms_per_batch": round(sec * 1e3, 3),
                    "imgs_per_sec": round(b / sec, 1),
                    "checksum": round(chk, 5)}))
            except Exception as e:
                print(json.dumps({
                    "metric": f"reschain/{hw}x{hw}/fused_rgb",
                    "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
