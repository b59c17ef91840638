#!/usr/bin/env python
"""Headline benchmark: 256x256 gen+eval throughput per chip.

Default mode runs the flagship inference path (CLIP ViT-B/32 text encode ->
cascaded DM-GAN generator 64->128->256 -> FID Inception-v3 pool3 features,
one fused jitted program) on the available accelerator and prints ONE JSON
line:

    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference stack publishes no numbers (BASELINE.md), so
``vs_baseline`` is computed against an analytic V100 estimate for the same
generator: ~55 GFLOP/image forward at fp32 on a 15.7 TFLOP/s V100 at an
optimistic 40% utilization ≈ 115 images/sec.  The north-star target
(BASELINE.json) is >=5x that per chip.

Flags: --batch, --iters, --mode {gen,geneval,train,damsm}, --dtype {f32,bf16}.
"""

import argparse
import json
import os
import sys
import time


V100_REFERENCE_IMGS_PER_SEC = 115.0

CACHE_DIR = "/root/repo/.jax_cache"

# Analytic per-image forward FLOPs of the NAIVE algorithm (bench.py --mode
# cost, CPU XLA cost_analysis at the naive upsample+conv form): CLIP text
# 6.0 GF + generator ~65.4 GF + FID inception 13.4 GF.  Used to report MFU
# (algorithmic FLOPs / time / peak) next to the throughput headline.
GEN_GFLOPS_PER_IMAGE = 71.4
GENEVAL_GFLOPS_PER_IMAGE = 84.8
# Pinned by measurement (tools/microbench_peak.py, 2026-08-20): a chain of
# dependent 4096^3 bf16 matmuls achieves 192.1 TFLOP/s by device trace
# span = 97.5% of 197, so the chip's bf16 peak is 197 TFLOP/s (394 is the
# int8 figure; rounds 1-4 reported MFU at half its true value).
V5E_BF16_PEAK_TFLOPS = 197.0


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mode",
                   choices=["gen", "geneval", "train", "damsm", "ablate",
                            "cost", "warm"],
                   default="geneval")
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--trace", default="",
                   help="capture a jax.profiler trace of ~3 timed "
                        "iterations into this directory (gen/geneval "
                        "modes; decode with tools/trace_decode.py)")
    return p.parse_args()


def _supervise() -> int:
    """Armor the driver-facing headline capture against two measured
    hazards (BENCH_r02 tail, docs/PERFORMANCE.md): a >30-min remote compile
    of the dilated upsample-conv through a congested relay, and stale
    XLA:CPU AOT cache entries from another host ("could lead to ... SIGILL").

    Runs the timed bench in a budgeted child process.  On budget overrun the
    next attempt reverts to ``T2IGAN_UPBLOCK=naive`` (fast compile, ~10%
    slower steady-state — a number beats a timeout).  If the child dies on a
    signal, the compile cache is presumed poisoned: purge it and retry the
    same settings once.  stdout is inherited, so the driver still tails the
    child's one JSON line."""
    import shutil
    import subprocess
    import sys

    plan = [
        ({}, float(os.environ.get("T2IGAN_BENCH_ATTEMPT1_S", "1800"))),
        # Attempt 2 reverts the optional fast path (UpBlock dilated form)
        # so a compile blowup still yields a number inside the driver's
        # window.
        ({"T2IGAN_UPBLOCK": "naive", "T2IGAN_PHASED_TAIL": "0"},
         float(os.environ.get("T2IGAN_BENCH_ATTEMPT2_S", "1200"))),
    ]
    purged = False
    tunnel_retries = int(os.environ.get("T2IGAN_BENCH_TUNNEL_RETRIES", "5"))
    queue = list(plan)
    rc = 1
    while queue:
        env_over, budget = queue.pop(0)
        env = dict(os.environ, T2IGAN_BENCH_CHILD="1", **env_over)
        try:
            t_start = time.time()
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, timeout=budget).returncode
            if (rc > 0 and time.time() - t_start < 120
                    and tunnel_retries > 0):
                # (rc < 0 — a signal death — is handled below: purge the
                # compile cache first, since stale AOT entries SIGILL fast.)
                # A fast failure is almost always the axon tunnel refusing
                # backend init (observed: multi-hour outages) — not a graph
                # bug.  Wait and retry the SAME attempt instead of burning
                # the fallback variant.
                tunnel_retries -= 1
                print("bench: child failed within 120s (tunnel down?); "
                      f"retrying in 120s ({tunnel_retries} retries left)",
                      flush=True)
                time.sleep(120)
                queue.insert(0, (env_over, budget))
                continue
        except subprocess.TimeoutExpired:
            print(f"bench: attempt exceeded its {budget:.0f}s budget "
                  f"(compile blowup?); falling back to the next variant",
                  flush=True)
            rc = 124
            continue
        if rc == 0:
            return 0
        if rc < 0 and not purged:
            print(f"bench: child died with signal {-rc}; purging the "
                  "compile cache and retrying", flush=True)
            shutil.rmtree(CACHE_DIR, ignore_errors=True)
            purged = True
            queue.insert(0, (env_over, budget))
            continue
        # Plain failure: fall through to the slow-but-safe variant once so
        # a broken fast path can't zero the driver's headline; if the safe
        # variant also fails, that's a real bug — surface its rc.
        print(f"bench: attempt failed (rc={rc}); trying the next variant",
              flush=True)
    return rc


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated bench invocations reuse
    compiled programs instead of paying the multi-minute remote compile."""
    from t2igan.utils.cache import enable_compile_cache

    enable_compile_cache(CACHE_DIR)


# Cache validation lives in t2igan/utils/cache.py (shared with the root
# CLIs and the multichip dryrun); re-exported here for bench callers/tests.
from t2igan.utils.cache import (_entry_is_cpu_aot, _host_fingerprint,
                                validate_cache)


def _enable_cpu_fallback():
    """Make the host CPU platform available next to the accelerator so model
    initialization doesn't pay an accelerator compile (the axon tunnel's
    remote compile costs minutes per graph)."""
    import os

    import jax

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


def _jit_with_opts(fn, example_args):
    """jit, optionally with per-compile XLA debug-option overrides from
    ``T2IGAN_XLA_OPTS`` (comma-separated k=v, e.g.
    ``xla_tpu_scoped_vmem_limit_kib=65536``).  Backend-specific flags can't
    ride the XLA_FLAGS env var here — the local CPU flag parser aborts on
    unknown TPU flags — but per-compile compiler_options are proto-backed
    and forwarded through the axon relay."""
    import jax

    opts = os.environ.get("T2IGAN_XLA_OPTS", "")
    if not opts:
        return jax.jit(fn)
    kv = dict(item.split("=", 1) for item in opts.split(",") if item)
    print(f"bench: compiler_options={kv}", flush=True)
    compiled = jax.jit(fn).lower(*example_args).compile(compiler_options=kv)
    return compiled


def bench_gen(args, with_eval: bool = False):
    """Text -> 256px image generation; with ``with_eval`` the FID
    Inception-v3 pool3 feature extraction runs fused into the same jitted
    program (the BASELINE 'gen+eval' headline path)."""
    import jax
    import jax.numpy as jnp

    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_generator
    from t2igan.train.steps import make_sampler

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = cfg_replace(Config(), GAN={"GF_DIM": 64, "DF_DIM": 32},
                      TEXT={"EMBEDDING_DIM": 512, "WORDS_NUM": 77})
    clip_cfg = ClipConfig()
    clip_model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    gen_model = build_generator(cfg, dtype=dtype)

    cpu = _enable_cpu_fallback()
    b, w = args.batch, 77
    ids = jnp.full((b, w), clip_cfg.eos_token_id, jnp.int32)
    mask = jnp.ones((b, w), jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.GAN.Z_DIM))
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (b, cfg.GAN.CONDITION_DIM))
    sent = jnp.zeros((b, 512))
    words = jnp.zeros((b, w, 512))

    def init_all():
        clip_vars = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            ids[:1], mask[:1])
        g_vars = gen_model.init(
            {"params": jax.random.PRNGKey(1),
             "gaussian": jax.random.PRNGKey(2)},
            z, sent, words, mask == 0, False, eps)
        return clip_vars, g_vars

    if cpu is not None:
        with jax.default_device(cpu):
            clip_vars, g_vars = init_all()
        clip_vars = jax.device_put(clip_vars, jax.devices()[0])
        g_vars = jax.device_put(g_vars, jax.devices()[0])
    else:
        clip_vars, g_vars = init_all()

    sampler = make_sampler(cfg, clip_model, gen_model)
    cp, gp = clip_vars["params"], g_vars["params"]
    gb = g_vars.get("batch_stats", {})

    if with_eval:
        from t2igan.models.inception import InceptionV3, preprocess
        inception = InceptionV3(variant="fid", num_classes=1008,
                                dtype=dtype)
        if cpu is not None:
            with jax.default_device(cpu):
                inc_vars = inception.init(jax.random.PRNGKey(7),
                                          jnp.zeros((1, 299, 299, 3)))
            inc_vars = jax.device_put(inc_vars, jax.devices()[0])
        else:
            inc_vars = inception.init(jax.random.PRNGKey(7),
                                      jnp.zeros((1, 299, 299, 3)))

        # params must be jit ARGUMENTS, not closure constants — constants are
        # serialized into the uploaded HLO and blow the remote-compile
        # request limit.
        def run_eval(cp, gp, gb, inc):
            fakes, _ = sampler(cp, gp, gb, ids, mask, z, eps)
            # The [-1,1]->[0,1] rescale and bilinear 256->299 resize run in
            # the bench dtype (bf16 mode = bf16 end-to-end eval, halving the
            # resize HBM traffic); the f32 mode and the eval CLIs keep f32.
            img01 = ((fakes[-1] + 1.0) * 0.5).astype(dtype)
            return inception.apply(inc, preprocess(img01))["pool3"]

        run_eval = _jit_with_opts(run_eval, (cp, gp, gb, inc_vars))

        def run():
            return run_eval(cp, gp, gb, inc_vars)
    else:
        def run_gen(cp, gp, gb):
            fakes, _ = sampler(cp, gp, gb, ids, mask, z, eps)
            return fakes[-1]

        run_gen = _jit_with_opts(run_gen, (cp, gp, gb))

        def run():
            return run_gen(cp, gp, gb)

    for _ in range(args.warmup):
        run().block_until_ready()
    if getattr(args, "trace", ""):
        import jax.profiler
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            run().block_until_ready()
        jax.profiler.stop_trace()
        print(f"bench: trace written to {args.trace}", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return args.batch * args.iters / dt


def _maybe_trace(args, run_once):
    """``--trace`` support shared by the train/damsm modes: capture ~3
    post-warmup steps under jax.profiler (decode with
    tools/trace_decode.py).  The gen/geneval modes have their own inline
    copy (their ``run`` closure lives inside the supervised child).

    TIMING-FENCE WARNING (round 4): on the axon platform
    ``jax.block_until_ready`` on the train/damsm step's METRIC outputs
    returns before the enqueued executions drain, so a block-fenced loop
    measures the ENQUEUE rate — the round 1-3 train/damsm steps-per-sec
    numbers were inflated up to ~9x (the b16 train step is 6.02 TFLOP by
    compiled cost_analysis, >= 30.6 ms at 100% MFU, yet walls of 3.4 ms
    were recorded; the damsm trace's device wall span shows 30.4 ms/step
    where block-fenced walls claimed 8-9 ms).  The timed loops therefore
    end in ``jax.device_get`` — an actual value materialization cannot
    complete before the work does.  The gen/geneval headline was always
    honest: its block fence is on the full output array and its wall
    matches its decoded device trace."""
    if getattr(args, "trace", ""):
        import jax
        import jax.profiler
        n = 3
        jax.profiler.start_trace(args.trace)
        out = None
        for _ in range(n):
            out = run_once()
        jax.device_get(out)
        jax.profiler.stop_trace()
        print(f"bench: trace written to {args.trace}", flush=True)
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            from trace_decode import device_span_ms
            span = device_span_ms(args.trace)
            print(json.dumps({
                "metric": f"{args.mode} step, device trace span",
                "value": round(n / (span / 1e3), 3),
                "unit": "steps/sec (device)",
                "ms_per_step": round(span / n, 2)}), flush=True)
        except Exception as e:  # decode failure must not kill the bench
            print(f"bench: trace span decode failed: {e}", flush=True)


def bench_train(args):
    """Full adversarial train step (clip_bird_DMGAN.yml shape: batch 4,
    G gf=64, D df=32, 3 scales, DAMSM ranking loss through CLIP)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_discriminators, build_generator
    from t2igan.train.state import gan_optimizers, init_gan_state
    from t2igan.train.steps import make_gan_step

    cpu = _enable_cpu_fallback()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    # Fixture LRs are 10x below the production 2e-4: a GAN updated on
    # random-noise images is a divergent system, and at 2e-4 the loss
    # stream goes NaN inside a 200-iter timing window even over distinct
    # batches.  The lr is a folded scalar in the Adam update — same HLO,
    # same op count, same timing; only the logged losses stay readable.
    cfg = cfg_replace(Config(),
                      GAN={"GF_DIM": 64, "DF_DIM": 32, "R_NUM": 2},
                      TEXT={"EMBEDDING_DIM": 512, "WORDS_NUM": 77},
                      TRAIN={"BATCH_SIZE": args.batch,
                             "DISCRIMINATOR_LR": 2e-5,
                             "GENERATOR_LR": 2e-5})
    clip_cfg = ClipConfig()
    clip_model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    gen = build_generator(cfg, dtype=dtype)
    ds = build_discriminators(cfg, dtype=dtype)
    g_tx, d_tx = gan_optimizers(cfg)

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
    b = args.batch
    rng = np.random.default_rng(0)
    # Cycle >=8 distinct synthetic batches + per-step noise keys: repeated
    # updates on ONE random batch with ONE key diverge to NaN after ~50
    # steps at production dims (fixture overfit, not a numerics bug —
    # NOTES round 4 s2).  Captions are distinct random token runs with a
    # real EOS + pad mask rather than all-EOS degenerates, so the text
    # tower and DAMSM terms see non-identical embeddings.  Same compiled
    # graph — this is host-side data only.
    n_fix = 8

    def _captions():
        length = 20
        ids = np.full((b, 77), clip_cfg.eos_token_id, np.int32)
        ids[:, :length] = rng.integers(
            1, clip_cfg.eos_token_id - 1, (b, length), dtype=np.int32)
        mask = np.zeros((b, 77), np.int32)
        mask[:, :length + 1] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def _fixture_batch():
        ids, mask = _captions()
        ids2, mask2 = _captions()
        return {
            "images": [jnp.asarray(rng.standard_normal(
                (b, s, s, 3)).astype(np.float32)) for s in (64, 128, 256)],
            "ids": ids, "mask": mask, "ids_2": ids2, "mask_2": mask2,
            "class_ids": jnp.arange(b, dtype=jnp.int32),
        }

    batches = [_fixture_batch() for _ in range(n_fix)]
    keys = list(jax.random.split(jax.random.PRNGKey(2), 4096))
    it = 0
    for _ in range(args.warmup):
        state, m = step(state, clip_vars["params"], batches[it % n_fix],
                        keys[it % len(keys)])
        it += 1
    jax.block_until_ready(state)

    def once():
        nonlocal state, it
        state, m = step(state, clip_vars["params"], batches[it % n_fix],
                        keys[it % len(keys)])
        it += 1
        return m
    _maybe_trace(args, once)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, clip_vars["params"], batches[it % n_fix],
                        keys[it % len(keys)])
        it += 1
    vals = jax.device_get(m)  # MATERIALIZING fence — see _maybe_trace
    dt = time.perf_counter() - t0
    # Fixture health: the timing loop cycles 8 distinct synthetic batches
    # precisely so long windows keep finite losses (a single repeated
    # batch diverged to NaN after ~50 updates at production dims — NOTES
    # round 4 s2).  Print the evidence with every run.
    finite = {k: float(v) for k, v in vals.items()
              if k in ("g_loss", "d_loss0", "d_loss1", "d_loss2")}
    print(json.dumps({
        "metric": f"train losses after {args.warmup + args.iters} updates",
        "values": finite,
        "all_finite": bool(all(np.isfinite(list(finite.values())))),
    }), flush=True)
    return args.iters / dt  # steps/sec


def bench_ablate(args):
    """Per-stage timing of the gen+eval headline: jit and time each stage of
    the fused program in isolation (CLIP text encode -> generator pyramid ->
    preprocess+inception pool3).  Prints one JSON line per stage — a
    measurement-backed breakdown of where the headline's time goes."""
    import jax
    import jax.numpy as jnp

    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_generator
    from t2igan.models.inception import InceptionV3, preprocess

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = cfg_replace(Config(), GAN={"GF_DIM": 64, "DF_DIM": 32},
                      TEXT={"EMBEDDING_DIM": 512, "WORDS_NUM": 77})
    clip_cfg = ClipConfig()
    clip_model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    gen_model = build_generator(cfg, dtype=dtype)
    inception = InceptionV3(variant="fid", num_classes=1008, dtype=dtype)

    cpu = _enable_cpu_fallback()
    b, w = args.batch, 77
    ids = jnp.full((b, w), clip_cfg.eos_token_id, jnp.int32)
    mask = jnp.ones((b, w), jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.GAN.Z_DIM))
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (b, cfg.GAN.CONDITION_DIM))

    def init_all():
        clip_vars = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            ids[:1], mask[:1])
        g_vars = gen_model.init(
            {"params": jax.random.PRNGKey(1),
             "gaussian": jax.random.PRNGKey(2)},
            z[:1], jnp.zeros((1, 512)), jnp.zeros((1, w, 512)),
            mask[:1] == 0, False, eps[:1])
        inc_vars = inception.init(jax.random.PRNGKey(7),
                                  jnp.zeros((1, 299, 299, 3)))
        return clip_vars, g_vars, inc_vars

    if cpu is not None:
        with jax.default_device(cpu):
            clip_vars, g_vars, inc_vars = init_all()
        dev = jax.devices()[0]
        clip_vars = jax.device_put(clip_vars, dev)
        g_vars = jax.device_put(g_vars, dev)
        inc_vars = jax.device_put(inc_vars, dev)
    else:
        clip_vars, g_vars, inc_vars = init_all()

    @jax.jit
    def clip_stage(cp):
        words, sent = clip_model.apply(
            {"params": cp}, ids, mask,
            method=ClipWithRegionHead.encode_text_verbose)
        return words, sent

    @jax.jit
    def gen_stage(gp, gb, words, sent):
        fakes, _, _, _ = gen_model.apply(
            {"params": gp, "batch_stats": gb},
            z, sent, words, mask == 0, False, eps, False)
        return fakes[-1]

    @jax.jit
    def eval_stage(inc, img):
        img01 = ((img + 1.0) * 0.5).astype(dtype)
        return inception.apply(inc, preprocess(img01))["pool3"]

    cp, gp = clip_vars["params"], g_vars["params"]
    gb = g_vars.get("batch_stats", {})
    words, sent = clip_stage(cp)
    img = gen_stage(gp, gb, words, sent)
    feats = eval_stage(inc_vars, img)
    jax.block_until_ready((words, img, feats))

    def timeit(fn, *a):
        for _ in range(args.warmup):
            jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    stages = {
        "clip_text_encode": timeit(clip_stage, cp),
        "generator_256": timeit(gen_stage, gp, gb, words, sent),
        "inception_pool3": timeit(eval_stage, inc_vars, img),
    }
    total = sum(stages.values())
    for name, t in stages.items():
        print(json.dumps({
            "metric": f"ablate/{name} (batch {args.batch}, {args.dtype})",
            "value": round(args.batch / t, 2), "unit": "images/sec/chip",
            "sec_per_batch": round(t, 5),
            "share_of_staged_total": round(t / total, 3)}))
    print(json.dumps({
        "metric": f"ablate/staged_total (batch {args.batch}, {args.dtype})",
        "value": round(args.batch / total, 2),
        "unit": "images/sec/chip", "sec_per_batch": round(total, 5)}))


def bench_cost(args):
    """XLA cost analysis of the gen+eval stages (FLOPs / bytes accessed per
    compiled program).  Run with ``JAX_PLATFORMS=cpu`` and a small --batch —
    FLOPs scale linearly in batch, so divide by batch for per-image cost and
    combine with --mode ablate timings for per-stage MFU."""
    import jax
    import jax.numpy as jnp

    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.models.factory import build_generator
    from t2igan.models.inception import InceptionV3, preprocess

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = cfg_replace(Config(), GAN={"GF_DIM": 64, "DF_DIM": 32},
                      TEXT={"EMBEDDING_DIM": 512, "WORDS_NUM": 77})
    clip_cfg = ClipConfig()
    clip_model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    gen_model = build_generator(cfg, dtype=dtype)
    inception = InceptionV3(variant="fid", num_classes=1008, dtype=dtype)

    b, w = args.batch, 77
    ids = jnp.full((b, w), clip_cfg.eos_token_id, jnp.int32)
    mask = jnp.ones((b, w), jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.GAN.Z_DIM))
    eps = jax.random.normal(jax.random.PRNGKey(4),
                            (b, cfg.GAN.CONDITION_DIM))
    clip_vars = clip_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 3)), ids[:1],
                                mask[:1])
    g_vars = gen_model.init(
        {"params": jax.random.PRNGKey(1), "gaussian": jax.random.PRNGKey(2)},
        z[:1], jnp.zeros((1, 512)), jnp.zeros((1, w, 512)),
        mask[:1] == 0, False, eps[:1])
    inc_vars = inception.init(jax.random.PRNGKey(7),
                              jnp.zeros((1, 299, 299, 3)))
    words = jnp.zeros((b, w, 512), dtype)
    sent = jnp.zeros((b, 512), dtype)
    img = jnp.zeros((b, 256, 256, 3), dtype)

    def clip_stage(cp):
        return clip_model.apply({"params": cp}, ids, mask,
                                method=ClipWithRegionHead.encode_text_verbose)

    def gen_stage(gp, gb, words, sent):
        fakes, _, _, _ = gen_model.apply(
            {"params": gp, "batch_stats": gb},
            z, sent, words, mask == 0, False, eps, False)
        return fakes[-1]

    def eval_stage(inc, im):
        img01 = (im.astype(jnp.float32) + 1.0) * 0.5
        return inception.apply(inc, preprocess(img01))["pool3"]

    stages = {
        "clip_text_encode": (clip_stage, (clip_vars["params"],)),
        "generator_256": (gen_stage, (g_vars["params"],
                                      g_vars.get("batch_stats", {}),
                                      words, sent)),
        "inception_pool3": (eval_stage, (inc_vars, img)),
    }
    for name, (fn, fargs) in stages.items():
        ca = jax.jit(fn).lower(*fargs).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        print(json.dumps({
            "metric": f"cost/{name} (batch {args.batch}, {args.dtype})",
            "gflops_per_image": round(ca.get("flops", 0.0) / args.batch
                                      / 1e9, 3),
            "hbm_mb_per_image": round(ca.get("bytes accessed", 0.0)
                                      / args.batch / 1e6, 3)}))


def bench_damsm(args):
    """DAMSM CLIP fine-tune step (DAMSM/bird.yml shape: batch 48, 224px,
    two caption views, grad-clipped two-group update)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from t2igan.config import Config, cfg_replace
    from t2igan.models.clip import ClipConfig, ClipWithRegionHead
    from t2igan.train.state import damsm_optimizer, init_damsm_state
    from t2igan.train.steps import make_damsm_step

    cpu = _enable_cpu_fallback()
    b = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    cfg = cfg_replace(Config(),
                      TREE={"BRANCH_NUM": 1, "BASE_SIZE": 224},
                      TRAIN={"BATCH_SIZE": b})
    clip_cfg = ClipConfig()
    model = ClipWithRegionHead(clip_cfg, dtype=dtype)
    tx = damsm_optimizer(cfg, steps_per_epoch=100)

    def init_all():
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 30), jnp.int32), jnp.ones((1, 30), jnp.int32))
        return init_damsm_state(cfg, variables, tx)

    if cpu is not None:
        with jax.default_device(cpu):
            state = init_all()
        state = jax.device_put(state, jax.devices()[0])
    else:
        state = init_all()

    step = jax.jit(make_damsm_step(cfg, model, tx), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    ids = np.full((b, 30), clip_cfg.eos_token_id, np.int32)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((b, 224, 224, 3)).astype(np.float32)),
        "ids": jnp.asarray(ids), "mask": jnp.ones((b, 30), jnp.int32),
        "ids_2": jnp.asarray(ids), "mask_2": jnp.ones((b, 30), jnp.int32),
        "class_ids": jnp.arange(b, dtype=jnp.int32),
    }
    for _ in range(args.warmup):
        state, m = step(state, batch)
    jax.block_until_ready(state)

    def once():
        nonlocal state
        state, m = step(state, batch)
        return m
    _maybe_trace(args, once)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    jax.device_get(m)  # MATERIALIZING fence — see _maybe_trace's docstring
    return args.iters / (time.perf_counter() - t0)


def main():
    args = parse_args()
    validate_cache()
    if (args.mode in ("gen", "geneval")
            and os.environ.get("T2IGAN_BENCH_CHILD") != "1"
            and os.environ.get("T2IGAN_BENCH_NO_SUPERVISE") != "1"):
        raise SystemExit(_supervise())
    _enable_compile_cache()
    if args.mode == "warm":
        # Pre-warm the persistent cache with the headline graphs so the
        # driver's bench window never pays a cold compile.
        t0 = time.perf_counter()
        args.iters, args.warmup = 1, 0
        bench_gen(args, with_eval=True)
        print(json.dumps({
            "metric": "warm: geneval graphs compiled+cached",
            "value": round(time.perf_counter() - t0, 1), "unit": "sec"}))
        return
    if args.mode == "gen":
        value = bench_gen(args)
        metric = "256x256 text-to-image generation"
        gflops = GEN_GFLOPS_PER_IMAGE
    elif args.mode == "geneval":
        value = bench_gen(args, with_eval=True)
        metric = "256x256 generation + FID inception features (gen+eval)"
        gflops = GENEVAL_GFLOPS_PER_IMAGE
    elif args.mode == "damsm":
        value = bench_damsm(args)
        print(json.dumps({
            "metric": ("DAMSM CLIP fine-tune step (batch %d, %s)"
                       % (args.batch, args.dtype)),
            "value": round(value, 3), "unit": "steps/sec",
            "vs_baseline": None}))
        return
    elif args.mode == "ablate":
        bench_ablate(args)
        return
    elif args.mode == "cost":
        bench_cost(args)
        return
    elif args.mode == "train":
        value = bench_train(args)
        metric = ("full adversarial train step (batch %d, %s)"
                  % (args.batch, args.dtype))
        print(json.dumps({"metric": metric, "value": round(value, 3),
                          "unit": "steps/sec", "vs_baseline": None}))
        return
    else:
        raise SystemExit(f"mode {args.mode} not yet wired")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / V100_REFERENCE_IMGS_PER_SEC, 3),
        "mfu_vs_v5e_bf16": round(
            value * gflops / 1e3 / V5E_BF16_PEAK_TFLOPS, 3),
    }))


if __name__ == "__main__":
    main()
