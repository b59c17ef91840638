"""Conditional GAN trainer — TPU-native ``condGANTrainer`` + ``main.py``.

Parity targets: model build/resume (trainer.py:73-160), the training loop
(trainer.py:250-464), the generation + R-precision sweep ``sampling()``
(trainer.py:485-613), and caption-driven ``gen_example`` (trainer.py:619-704
— implemented against the CLIP text encoder, since the legacy RNN path is
dead in the CLIP configs, SURVEY §2 #26).

TPU-native structure: one jitted adversarial step per iteration over a data
mesh (three D updates + G update + EMA in a single XLA program); orbax
checkpoints hold G, G-EMA, all Ds, optimizer states and spectral/batch-stats
collections; sampling and R-precision run as batched jitted inference.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.config import Config
from t2igan.data.pipeline import Batch, DataLoader, prefetch_to_device
from t2igan.data.tokenizer import ClipTokenizer
from t2igan.models.clip import ClipConfig
from t2igan.models.factory import build_discriminators, build_generator
from t2igan.ops.image import resize_nearest
from t2igan.parallel.mesh import (global_batch, make_mesh_for_batch,
                                  replicate)
from t2igan.train.checkpoint import CheckpointManager, GracefulShutdown
from t2igan.train.pretrain_damsm import build_clip, make_dataset
from t2igan.train.state import gan_optimizers, init_gan_state
from t2igan.train.steps import make_gan_step, make_sampler
from t2igan.evaluation.rprecision import bootstrap_r_precision, make_rank_fn
from t2igan.utils.logging import MetricsLogger, StepTimer
from t2igan.utils.viz import save_image_grid, tanh_to01


class CondGanTrainer:
    def __init__(self, cfg: Config, output_dir: str,
                 clip_cfg: Optional[ClipConfig] = None,
                 split: str = "train", dtype=None, seed: int = 0):
        """``dtype``: computation dtype for the models (params stay f32);
        jnp.bfloat16 halves HBM traffic and doubles MXU rate on TPU.
        ``seed`` feeds the JAX init and training-noise keys — the
        counterpart of the reference's global ``torch.manual_seed``
        (main.py:109-116); eval/probe keys stay pinned for parity."""
        self.cfg = cfg
        self.seed = seed
        dtype = dtype or jnp.float32
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)

        self.tokenizer = ClipTokenizer.load(cfg.DATA_DIR or None)
        self.dataset = make_dataset(cfg, split)
        self.loader = DataLoader(
            self.dataset, self.tokenizer, cfg.TRAIN.BATCH_SIZE,
            cfg.TEXT.WORDS_NUM, shuffle=cfg.TRAIN.FLAG,
            num_workers=max(1, cfg.WORKERS), engine=cfg.DATA_ENGINE)

        self.clip_model, clip_vars = build_clip(cfg, clip_cfg, dtype=dtype)
        self.clip_params = clip_vars["params"]
        self.gen_model = build_generator(cfg, dtype=dtype)
        self.d_models = build_discriminators(cfg, dtype=dtype)
        g_tx, d_tx = gan_optimizers(cfg)
        from t2igan.utils.hostinit import host_init, put_default
        with host_init() as on_host:
            self.state = init_gan_state(cfg, self.gen_model, self.d_models,
                                        jax.random.PRNGKey(seed))
        if on_host:
            self.state = put_default(self.state)
        # donate the state so G/D/optimizer buffers update in place on-device
        self.step_fn = jax.jit(
            make_gan_step(cfg, self.clip_model, self.gen_model,
                          self.d_models, g_tx, d_tx),
            donate_argnums=(0,))
        self.sampler = make_sampler(cfg, self.clip_model, self.gen_model)
        self._sampler_attn = None  # built on demand for gen_example

        self.mesh = make_mesh_for_batch(cfg.TRAIN.BATCH_SIZE)
        self.model_dir = os.path.join(output_dir, "Model")
        self.image_dir = os.path.join(output_dir, "Image")
        os.makedirs(self.image_dir, exist_ok=True)
        self.ckpt = CheckpointManager(self.model_dir)
        self.logger = MetricsLogger(output_dir, print_every=100)

        # resume (trainer.py:127-154): NET_G may point at the orbax dir or a
        # standalone generator export (.npz, the netG_epoch_*.pth analogue)
        net_g = cfg.TRAIN.NET_G
        if net_g and os.path.isfile(net_g) and net_g.endswith(".npz"):
            from t2igan.train.export import load_generator
            ema, stats = load_generator(net_g)
            # g_params and g_ema_params must NOT alias: the jitted step
            # donates the state, and XLA rejects donating one buffer twice.
            self.state = self.state.replace(
                g_ema_params=ema,
                g_params=jax.tree.map(jnp.array, ema),
                g_batch_stats=stats)
            print(f"Loaded generator export: {net_g}")
        elif net_g and os.path.isfile(net_g) and net_g.endswith(".pth"):
            # Cross-framework migration: ingest the reference's torch
            # deliverables — netG_epoch_%d.pth holds the EMA weights and
            # sibling netD%d.pth files sit next to it (trainer.py:137-154).
            from t2igan.train.checkpoint import (load_torch_discriminator,
                                                 load_torch_generator)
            gv = load_torch_generator(net_g, branch_num=cfg.TREE.BRANCH_NUM,
                                      num_residual=cfg.GAN.R_NUM,
                                      dcgan=cfg.GAN.B_DCGAN)
            # distinct copies: the donated train state may not alias buffers
            self.state = self.state.replace(
                g_params=gv["params"],
                g_ema_params=jax.tree.map(jnp.array, gv["params"]),
                g_batch_stats=gv.get("batch_stats", {}))
            print(f"Loaded torch generator checkpoint: {net_g}")
            if cfg.TRAIN.B_NET_D:
                d_dir = os.path.dirname(net_g)
                d_params = list(self.state.d_params)
                d_spec = list(self.state.d_spectral)
                for i, size in enumerate(cfg.branch_sizes):
                    d_path = os.path.join(d_dir, f"netD{i}.pth")
                    if os.path.isfile(d_path):
                        dv = load_torch_discriminator(d_path, img_size=size)
                        d_params[i] = dv["params"]
                        d_spec[i] = dv.get("spectral", {})
                        print(f"Loaded torch discriminator: {d_path}")
                self.state = self.state.replace(d_params=d_params,
                                                d_spectral=d_spec)
        else:
            resume_dir = net_g or self.model_dir
            if os.path.isdir(resume_dir):
                try:
                    mgr = (self.ckpt if resume_dir == self.model_dir
                           else CheckpointManager(resume_dir))
                    restored, step = mgr.restore(self.state)
                    if restored is not None:
                        self.state = restored
                        print(f"Resumed GAN state from step {step}")
                except Exception as e:  # fresh run
                    print(f"NOTE: no resumable checkpoint in "
                          f"{resume_dir}: {e}")

    # ------------------------------------------------------------------
    # training (trainer.py:250-464)
    # ------------------------------------------------------------------

    def _device_batch(self, batch: Batch):
        arrays = {
            "images": list(batch.images),
            "ids": batch.input_ids, "mask": batch.attention_mask,
            "ids_2": batch.input_ids_2, "mask_2": batch.attention_mask_2,
            "class_ids": batch.class_ids,
        }
        return global_batch(self.mesh, arrays)

    def train(self, max_epochs: Optional[int] = None):
        cfg = self.cfg
        epochs = max_epochs if max_epochs is not None else cfg.TRAIN.MAX_EPOCH
        timer = StepTimer(cfg.TRAIN.BATCH_SIZE)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 int(self.state.step) + 1)
        self.state = replicate(self.mesh, self.state)
        stop = GracefulShutdown()
        for epoch in range(epochs):
            start = time.time()
            d_last = g_last = float("nan")
            for dev_batch in prefetch_to_device(self.loader,
                                                self._device_batch):
                rng, sub = jax.random.split(rng)
                self.state, metrics = self.step_fn(
                    self.state, self.clip_params, dev_batch, sub)
                timer.tick()
                metrics["images_per_sec"] = timer.images_per_sec
                self.logger.log(int(self.state.step), metrics)
                d_last = sum(float(metrics[f"d_loss{i}"])
                             for i in range(len(self.d_models)))
                g_last = float(metrics["g_loss"])
                if stop.requested:
                    break
            print(f"[{epoch}/{epochs}] Loss_D: {d_last:.2f} "
                  f"Loss_G: {g_last:.2f} Time: {time.time() - start:.2f}s")
            if epoch % cfg.TRAIN.SNAPSHOT_INTERVAL == 0 or \
                    epoch == epochs - 1:
                self.ckpt.save(int(self.state.step), self.state)
                from t2igan.train.export import save_generator
                save_generator(
                    os.path.join(self.model_dir,
                                 f"netG_epoch_{epoch}"),
                    jax.device_get(self.state.g_ema_params),
                    jax.device_get(self.state.g_batch_stats))
                self._save_sample_grid(epoch)
            if stop.requested:
                print("Shutdown requested: checkpointing and exiting.")
                self.ckpt.save(int(self.state.step), self.state, wait=True)
                break
        stop.restore()
        self.ckpt.wait()
        return self.state

    def _save_sample_grid(self, tag):
        """Fixed-noise sample sheet + attention-map overlays (the role of
        save_img_results, trainer.py:207-247 -> miscc/utils.py:90-170),
        generated from the EMA weights.  Uses the loader's side-effect-free
        probe batch so snapshot cadence never perturbs the training shuffle
        order.  The reference's helper is broken (undefined names,
        miscc/utils.py:101,147); this renders the intended artifact with
        utils.viz.attention_grid."""
        batch = self.loader.peek()
        if batch is None:
            return
        b = batch.input_ids.shape[0]
        z = jax.random.normal(jax.random.PRNGKey(42), (b, self.cfg.GAN.Z_DIM))
        eps = jnp.zeros((b, self.cfg.GAN.CONDITION_DIM))
        if self._sampler_attn is None:
            self._sampler_attn = make_sampler(self.cfg, self.clip_model,
                                              self.gen_model,
                                              return_attn=True)
        fakes, atts = self._sampler_attn(
            self.clip_params, self.state.g_ema_params,
            self.state.g_batch_stats, jnp.asarray(batch.input_ids),
            jnp.asarray(batch.attention_mask), z, eps)
        save_image_grid(tanh_to01(np.asarray(fakes[-1])),
                        os.path.join(self.image_dir, f"G_{tag}.png"))
        if atts:
            from PIL import Image
            from t2igan.utils.viz import attention_grid
            n = min(b, 8)  # overlay sheet stays readable
            labels = [[self.tokenizer.decode([t]).strip() or "·"
                       for t in row[1:9]]
                      for row in np.asarray(batch.input_ids[:n])]
            grid = attention_grid(
                tanh_to01(np.asarray(fakes[-1][:n])),
                np.asarray(atts[-1][:n]), labels)
            Image.fromarray(grid).save(
                os.path.join(self.image_dir, f"G_{tag}_attn.png"))

    # ------------------------------------------------------------------
    # evaluation sweep: generation + R-precision (trainer.py:485-613)
    # ------------------------------------------------------------------

    def sampling(self, split_dir: str = "valid", num_rounds: int = 11,
                 r_target: int = 30000, save_images: bool = True,
                 use_ema: bool = True, n_mis: int = 99,
                 data_parallel: bool = True):
        cfg = self.cfg
        save_dir = os.path.join(self.output_dir, split_dir, "single")
        if save_images:
            os.makedirs(save_dir, exist_ok=True)
        g_params = (self.state.g_ema_params if use_ema
                    else self.state.g_params)
        # Data-parallel eval sweep over all local devices (the reference
        # DataParallel-wraps netG and the CLIP towers for sampling too,
        # trainer.py:255-265): replicate params, shard the batch.  A batch
        # not divisible by the device count shrinks the mesh (static shapes).
        sampler = self.sampler
        mesh = self.mesh
        if data_parallel and mesh.devices.size > 1:
            sampler = make_sampler(cfg, self.clip_model, self.gen_model,
                                   mesh=mesh)
            rank_fn = make_rank_fn(self.clip_model,
                                   {"params": self.clip_params}, mesh=mesh)
        else:
            rank_fn = make_rank_fn(self.clip_model,
                                   {"params": self.clip_params})
        clip_size = self.clip_model.cfg.image_size
        words_eval = 77 if self.clip_model.cfg.max_positions >= 77 \
            else self.clip_model.cfg.max_positions

        hits = []
        rng = jax.random.PRNGKey(100)  # eval seed pinned (main.py:115-116)
        self._build_miscaption_bank(words_eval)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(4) as io_pool:  # PNG encode off the sweep
            for round_i in range(num_rounds):
                for batch in self.loader:
                    b = batch.input_ids.shape[0]
                    rng, rz, re = jax.random.split(rng, 3)
                    z = jax.random.normal(rz, (b, cfg.GAN.Z_DIM))
                    eps = jax.random.normal(re, (b, cfg.GAN.CONDITION_DIM))
                    fakes, _ = sampler(
                        self.clip_params, g_params, self.state.g_batch_stats,
                        jnp.asarray(batch.input_ids),
                        jnp.asarray(batch.attention_mask), z, eps)
                    finest = np.asarray(fakes[-1])
                    if save_images:
                        self._save_singles(finest, batch.keys, save_dir,
                                           round_i, io_pool)
                    # R-precision: 99 mis-captions per sample
                    mis_ids, mis_mask = self._mis_caption_batch(
                        batch.class_ids, words_eval, n_mis=n_mis)
                    resized = resize_nearest(jnp.asarray(fakes[-1]),
                                             clip_size)
                    flags = rank_fn(resized,
                                    jnp.asarray(batch.input_ids),
                                    jnp.asarray(batch.attention_mask),
                                    mis_ids, mis_mask)
                    hits.extend(np.asarray(flags).tolist())
                    if len(hits) >= r_target:
                        mean, std = bootstrap_r_precision(np.asarray(hits))
                        print(f"R mean:{mean:.4f} std:{std:.4f}")
                        return mean, std
        mean, std = bootstrap_r_precision(np.asarray(hits)) \
            if hits else (float("nan"), float("nan"))
        print(f"R mean:{mean:.4f} std:{std:.4f} (n={len(hits)})")
        return mean, std

    def _build_miscaption_bank(self, words_num: int):
        """Tokenize every caption in the split ONCE (evaluation.rprecision.
        MisCaptionBank): per batch, mis-captions become a numpy index gather
        instead of B×99 host BPE calls, keeping the 30k-query sweep
        device-bound."""
        if getattr(self, "_mis_bank", None) is None or \
                self._mis_bank.words_num != words_num:
            from t2igan.evaluation.rprecision import MisCaptionBank
            self._mis_bank = MisCaptionBank(self.dataset, self.tokenizer,
                                            words_num)

    def _mis_caption_batch(self, class_ids, words_num, n_mis: int = 99):
        self._build_miscaption_bank(words_num)
        ids, mask = self._mis_bank.sample(class_ids, n_mis)
        return jnp.asarray(ids), jnp.asarray(mask)

    def _save_singles(self, finest, keys, save_dir, round_i, io_pool=None):
        """Write per-sample PNGs (trainer.py:557-571).  With ``io_pool`` the
        encodes run on IO threads off the sweep's critical path (~10 ms per
        256^2 PNG x 30k images otherwise); the caller's pool shutdown joins
        them before results are reported."""
        from PIL import Image
        u8 = ((finest + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

        def write(j, key):
            path = os.path.join(save_dir, f"{key}_{round_i}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(u8[j]).save(path)

        for j, key in enumerate(keys):
            if io_pool is None:
                write(j, key)
            else:
                io_pool.submit(write, j, key)

    # ------------------------------------------------------------------
    # custom-caption generation (trainer.py:619-704)
    # ------------------------------------------------------------------

    def gen_example(self, captions_by_key, n_samples: int = 1):
        """Generate images (and attention grids) for user captions.

        ``captions_by_key``: {name: [caption strings]} — the structure
        main.py:51-98 builds from example_filenames.txt.
        """
        from t2igan.utils.viz import attention_grid

        cfg = self.cfg
        if self._sampler_attn is None:
            self._sampler_attn = make_sampler(cfg, self.clip_model,
                                              self.gen_model,
                                              return_attn=True)
        rng = jax.random.PRNGKey(0)
        for key, captions in captions_by_key.items():
            save_dir = os.path.join(self.output_dir, key)
            os.makedirs(save_dir, exist_ok=True)
            out = self.tokenizer(captions, max_length=cfg.TEXT.WORDS_NUM)
            b = out["input_ids"].shape[0]
            for s in range(n_samples):
                rng, rz, re = jax.random.split(rng, 3)
                z = jax.random.normal(rz, (b, cfg.GAN.Z_DIM))
                eps = jax.random.normal(re, (b, cfg.GAN.CONDITION_DIM))
                fakes, atts = self._sampler_attn(
                    self.clip_params, self.state.g_ema_params,
                    self.state.g_batch_stats,
                    jnp.asarray(out["input_ids"]),
                    jnp.asarray(out["attention_mask"]), z, eps)
                from PIL import Image
                for k, stage in enumerate(fakes):
                    u8 = ((np.asarray(stage) + 1) * 127.5).clip(0, 255) \
                        .astype(np.uint8)
                    for j in range(b):
                        Image.fromarray(u8[j]).save(
                            os.path.join(save_dir, f"{s}_s_{j}_g{k}.png"))
                labels = [[self.tokenizer.decode([t]).strip() or "·"
                           for t in row[1:9]]
                          for row in out["input_ids"]]
                for k, att in enumerate(atts):
                    grid = attention_grid(
                        tanh_to01(np.asarray(fakes[k + 1])),
                        np.asarray(att), labels)
                    Image.fromarray(grid).save(
                        os.path.join(save_dir, f"{s}_a{k}.png"))
