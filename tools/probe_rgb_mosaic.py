#!/usr/bin/env python
"""On-chip Mosaic lowering probe + isolated timing for the RGB-head kernels.

The two round-3 variants of the GET_IMAGE_G head (model.py:536-547):

* ``to_rgb_paired`` — post-GLU C=64 input, two adjacent pixels packed per
  128-lane row so the manual HBM->VMEM DMA is lane-aligned;
* ``to_rgb_glu``   — pre-GLU 2C=128 input, GLU computed in-kernel.

Both are interpret-tested in ``tests/test_to_rgb_fused.py``; this probe
answers the question CPU interpret mode cannot: does Mosaic LOWER them on
the real chip, and what do they cost in isolation?  (Isolated numbers are
advisory only — the round-3 trace decode showed in-graph cost depends on
the layouts XLA gives the neighbors; the deciding A/B is
``bench.py --mode geneval`` with ``T2IGAN_RGB_KERNEL={paired,glu}``.)

Usage: python tools/probe_rgb_mosaic.py [--batch 8] [--time] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--time", action="store_true",
                    help="also time the kernels vs the XLA conv in isolation")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()
    from t2igan.ops.pallas.to_rgb import to_rgb_glu, to_rgb_paired

    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 256, 256, 64), ).astype(
        np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 64, 3)).astype(
        np.float32)).astype(jnp.bfloat16)

    def naive(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.tanh(y)

    t0 = time.time()
    got = jax.jit(to_rgb_paired)(x, k)
    got.block_until_ready()
    print(f"paired compile+run ok in {time.time() - t0:.1f}s",
          got.shape, got.dtype, flush=True)
    ref = jax.jit(naive)(x, k)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print("paired max abs err vs on-chip XLA conv:", float(err), flush=True)

    # GLU variant: pre-GLU input 2C=128.
    x2 = jnp.asarray(rng.standard_normal((b, 256, 256, 128)).astype(
        np.float32)).astype(jnp.bfloat16)

    def naive_glu(x, k):
        a, g = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        h = (a * jax.nn.sigmoid(g)).astype(x.dtype)
        return naive(h, k)

    t0 = time.time()
    got2 = jax.jit(to_rgb_glu)(x2, k)
    got2.block_until_ready()
    print(f"glu compile+run ok in {time.time() - t0:.1f}s",
          got2.shape, got2.dtype, flush=True)
    ref2 = jax.jit(naive_glu)(x2, k)
    err2 = jnp.max(jnp.abs(got2.astype(jnp.float32)
                           - ref2.astype(jnp.float32)))
    print("glu max abs err vs on-chip XLA chain:", float(err2), flush=True)

    if not args.time:
        return

    paired = jax.jit(to_rgb_paired)
    refj = jax.jit(naive)

    def timeit(fn, *operands):
        for _ in range(5):
            fn(*operands).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*operands)
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters * 1e3

    tp = timeit(paired, x, k)
    tn = timeit(refj, x, k)
    print(f"paired kernel: {tp:.2f} ms/batch   xla conv: {tn:.2f} ms/batch"
          f"   speedup {tn / tp:.2f}x")
    tg = timeit(jax.jit(to_rgb_glu), x2, k)
    tng = timeit(jax.jit(naive_glu), x2, k)
    print(f"glu kernel: {tg:.2f} ms/batch   xla glu+conv: {tng:.2f} ms/batch"
          f"   speedup {tng / tg:.2f}x")


if __name__ == "__main__":
    main()
