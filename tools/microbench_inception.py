#!/usr/bin/env python
"""FID Inception-v3 sub-stage microbenchmark (gen+eval headline evidence).

The eval half of the headline (FID pool3 features, inception.py:56-110 in
the reference's vendored pytorch-fid) runs at ~19% MFU and ~22% of the
gen+eval step (docs/PERFORMANCE.md round 2).  This tool splits its time by
section so optimization goes where the milliseconds are:

* preprocess — torch-exact bilinear 256->299 + [-1,1] rescale
* ->pool1    — stem convs 1a/2a/2b + maxpool (299^2/147^2, 32-64 ch)
* ->pool2    — 3b/4a + maxpool (73^2/71^2, 80-192 ch)
* ->mixed6e  — InceptionA x3 (35^2) + B + C x4 (17^2)
* ->pool3    — InceptionD + E x2 (8^2) + global pool

Cumulative prefixes are timed by jitting functions that return only the
corresponding tap — XLA dead-code-eliminates everything after it — so the
per-section cost is the difference of adjacent prefixes.

Run: python tools/microbench_inception.py --batch 128 --iters 20
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
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
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    from t2igan.models.inception import InceptionV3, preprocess

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = InceptionV3(variant="fid", num_classes=1008, dtype=dtype)
    if cpu is not None:
        with jax.default_device(cpu):
            inc_vars = model.init(jax.random.PRNGKey(7),
                                  jnp.zeros((1, 299, 299, 3)))
        inc_vars = jax.device_put(inc_vars, dev)
    else:
        inc_vars = model.init(jax.random.PRNGKey(7),
                              jnp.zeros((1, 299, 299, 3)))

    b = args.batch
    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.asarray(rng.standard_normal((b, 256, 256, 3)), dtype), dev)

    def pre_f32(im):
        return preprocess((im.astype(jnp.float32) + 1.0) * 0.5)

    def pre_bf16(im):
        return preprocess(((im + 1.0) * 0.5).astype(jnp.bfloat16)
                          ).astype(jnp.float32)

    def tap(name):
        def fn(inc, im):
            return model.apply(inc, pre_f32(im))[name]
        return fn

    stages = {
        "preprocess_f32": lambda inc, im: pre_f32(im),
        "preprocess_bf16": lambda inc, im: pre_bf16(im),
        "to_pool1": tap("pool1"),
        "to_pool2": tap("pool2"),
        "to_mixed6e": tap("mixed6e"),
        "to_pool3": tap("pool3"),
    }

    def timeit(fn):
        jfn = jax.jit(fn)
        for _ in range(args.warmup):
            jax.block_until_ready(jfn(inc_vars, img))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = jfn(inc_vars, img)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    times = {}
    for name, fn in stages.items():
        times[name] = timeit(fn)
        print(json.dumps({"stage": name,
                          "ms_per_batch": round(times[name] * 1e3, 2),
                          "ms_per_img": round(times[name] / b * 1e3, 4)}),
              flush=True)
    order = ["to_pool1", "to_pool2", "to_mixed6e", "to_pool3"]
    prev = times["preprocess_f32"]
    for name in order:
        delta = times[name] - prev
        prev = times[name]
        print(json.dumps({"section": name, "delta_ms_per_batch":
                          round(delta * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
