"""DAMSM CLIP fine-tuning entry — TPU-native ``pretrain_DAMSM.py``.

Parity target: the reference entry (pretrain_DAMSM.py:376-500): TextDataset
train/val loaders, AddLinearOnCLIP, two Adam groups with OneCycle schedules,
per-epoch validation with an attention-map figure, per-epoch checkpoints.

TPU-native structure: one jitted train step (forward x2 captions + DAMSM +
NT-Xent + clipped two-group update) over a data mesh; orbax checkpoints; the
attention figure is rendered from the same jitted attention op used in the
loss.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.config import Config
from t2igan.data.dataset import TextImageDataset
from t2igan.data.pipeline import Batch, DataLoader, prefetch_to_device
from t2igan.data.synthetic import SyntheticDataset
from t2igan.data.tokenizer import ClipTokenizer
from t2igan.models.clip import ClipConfig, ClipWithRegionHead
from t2igan.ops.attention import word_region_attention
from t2igan.parallel.mesh import (global_batch, make_mesh_for_batch,
                                  replicate)
from t2igan.train.checkpoint import (CheckpointManager, GracefulShutdown,
                                     load_torch_clip)
from t2igan.train.state import damsm_optimizer, init_damsm_state
from t2igan.train.steps import make_damsm_loss, make_damsm_step
from t2igan.utils.logging import MetricsLogger, StepTimer

# The reference hardcodes 30 BPE tokens for DAMSM captions
# (pretrain_DAMSM.py:103).
DAMSM_WORDS_NUM = 30


def build_clip(cfg: Config, clip_cfg: Optional[ClipConfig] = None,
               rng=None, dtype=None):
    """CLIP model + variables: torch checkpoint if configured and present
    (main.py:145-156 semantics), otherwise fresh initialization."""
    clip_cfg = clip_cfg or ClipConfig()
    model = ClipWithRegionHead(clip_cfg, dtype=dtype or jnp.float32)
    ckpt = cfg.TRAIN.CLIP_MODEL_CHECKPOINT
    if ckpt and os.path.isfile(ckpt) and ckpt.endswith((".pth", ".pt")):
        variables = load_torch_clip(ckpt)
        print(f"Loaded CLIP weights from torch checkpoint: {ckpt}")
        return model, variables
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    from t2igan.utils.hostinit import host_init, put_default
    with host_init() as on_host:
        variables = model.init(
            rng,
            jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3)),
            jnp.zeros((1, clip_cfg.max_positions), jnp.int32),
            jnp.ones((1, clip_cfg.max_positions), jnp.int32))
    if on_host:
        variables = put_default(variables)
    if ckpt:
        print(f"WARNING: CLIP checkpoint {ckpt!r} not found; "
              "starting from random initialization.")
    return model, variables


def make_dataset(cfg: Config, split: str):
    """Real dataset when DATA_DIR exists on disk, synthetic otherwise (so
    smoke runs and benches work in sealed environments)."""
    split_dir = os.path.join(cfg.DATA_DIR, split)
    if cfg.DATA_DIR and os.path.isdir(split_dir):
        return TextImageDataset(cfg, split)
    print(f"WARNING: dataset split {split_dir!r} not found; "
          "using synthetic data.")
    return SyntheticDataset(cfg, size=max(2 * cfg.TRAIN.BATCH_SIZE, 64))


class DamsmTrainer:
    def __init__(self, cfg: Config, output_dir: str,
                 clip_cfg: Optional[ClipConfig] = None,
                 words_num: int = DAMSM_WORDS_NUM, dtype=None):
        self.cfg = cfg
        self.output_dir = output_dir
        self.words_num = words_num
        os.makedirs(output_dir, exist_ok=True)

        self.tokenizer = ClipTokenizer.load(cfg.DATA_DIR or None)
        self.train_ds = make_dataset(cfg, "train")
        self.val_ds = make_dataset(cfg, "val")
        self.train_loader = DataLoader(
            self.train_ds, self.tokenizer, cfg.TRAIN.BATCH_SIZE,
            words_num, shuffle=True, num_workers=max(1, cfg.WORKERS),
            engine=cfg.DATA_ENGINE)
        self.val_loader = DataLoader(
            self.val_ds, self.tokenizer, cfg.TRAIN.BATCH_SIZE,
            words_num, shuffle=True, num_workers=max(1, cfg.WORKERS),
            engine=cfg.DATA_ENGINE)

        self.clip_model, clip_vars = build_clip(cfg, clip_cfg, dtype=dtype)
        self.tx = damsm_optimizer(cfg, steps_per_epoch=len(self.train_loader))
        self.state = init_damsm_state(cfg, clip_vars, self.tx)

        self.mesh = make_mesh_for_batch(cfg.TRAIN.BATCH_SIZE)
        # donate the state so optimizer/param buffers update in place on-device
        self.step_fn = jax.jit(make_damsm_step(cfg, self.clip_model, self.tx),
                               donate_argnums=(0,))
        self.eval_loss_fn = jax.jit(make_damsm_loss(cfg, self.clip_model))

        self.ckpt = CheckpointManager(os.path.join(output_dir, "Model"))
        self.logger = MetricsLogger(output_dir)
        restored, step = self.ckpt.restore(self.state)
        if restored is not None:
            self.state = restored
            print(f"Resumed DAMSM state from step {step}")

    def _device_batch(self, batch: Batch):
        arrays = {
            "images": batch.images[-1],
            "ids": batch.input_ids, "mask": batch.attention_mask,
            "ids_2": batch.input_ids_2, "mask_2": batch.attention_mask_2,
            "class_ids": batch.class_ids,
        }
        return global_batch(self.mesh, arrays)

    def train(self, max_epochs: Optional[int] = None):
        cfg = self.cfg
        epochs = max_epochs if max_epochs is not None else cfg.TRAIN.MAX_EPOCH
        timer = StepTimer(cfg.TRAIN.BATCH_SIZE)
        self.state = replicate(self.mesh, self.state)
        stop = GracefulShutdown()
        for epoch in range(epochs):
            start = time.time()
            for dev_batch in prefetch_to_device(self.train_loader,
                                                self._device_batch):
                self.state, metrics = self.step_fn(self.state, dev_batch)
                timer.tick()
                metrics["images_per_sec"] = timer.images_per_sec
                self.logger.log(int(self.state.step), metrics)
                if stop.requested:
                    break
            val = self.evaluate()
            print(f"| end epoch {epoch:3d} | valid s_loss {val['s_loss']:5.2f}"
                  f" w_loss {val['w_loss']:5.2f} |"
                  f" {time.time() - start:.1f}s")
            if epoch % cfg.TRAIN.SNAPSHOT_INTERVAL == 0 or \
                    epoch == epochs - 1:
                self.ckpt.save(int(self.state.step), self.state)
                self._save_attention_figure(epoch)
            if stop.requested:
                print("Shutdown requested: checkpointing and exiting.")
                self.ckpt.save(int(self.state.step), self.state, wait=True)
                break
        stop.restore()
        self.ckpt.wait()
        return self.state

    def evaluate(self, max_batches: Optional[int] = None):
        """Validation losses over the FULL validation split by default,
        matching the reference (pretrain_DAMSM.evaluate, :273-344).  A cap
        for smoke runs comes from ``cfg.TRAIN.EVAL_MAX_BATCHES`` (0 = no
        cap) or the explicit ``max_batches`` argument."""
        if max_batches is None:
            max_batches = self.cfg.TRAIN.EVAL_MAX_BATCHES or None
        s_total, w_total, n = 0.0, 0.0, 0
        for i, batch in enumerate(self.val_loader):
            if max_batches is not None and i >= max_batches:
                break
            _, m = self.eval_loss_fn(self.state.clip_params,
                                     self._device_batch(batch))
            s_total += float(m["s_loss"])
            w_total += float(m["w_loss"])
            n += 1
        n = max(n, 1)
        return {"s_loss": s_total / n, "w_loss": w_total / n}

    def _save_attention_figure(self, epoch: int):
        """Word-region attention overlay grid for the first val batch
        (pretrain_DAMSM.py:296-325, rendered with utils.viz)."""
        from t2igan.losses.damsm import strip_special_tokens
        from t2igan.utils.viz import attention_grid, denormalize_clip

        # side-effect-free probe batch: snapshot cadence must not perturb
        # the validation loader's shuffle order
        batch = self.val_loader.peek()
        if batch is None:
            return
        variables = {"params": self.state.clip_params}
        subr, _ = self.clip_model.apply(
            variables, jnp.asarray(batch.images[-1][:4]),
            method=ClipWithRegionHead.encode_image_verbose)
        words, _ = self.clip_model.apply(
            variables, jnp.asarray(batch.input_ids[:4]),
            jnp.asarray(batch.attention_mask[:4]),
            method=ClipWithRegionHead.encode_text_verbose)
        w, m = strip_special_tokens(words,
                                    jnp.asarray(batch.attention_mask[:4]))
        _, attn = word_region_attention(
            w, subr[:, 1:, :], m, self.cfg.TRAIN.SMOOTH.GAMMA1)
        labels = [[self.tokenizer.decode([t]).strip() or "·"
                   for t in row[1:9]]
                  for row in np.asarray(batch.input_ids[:4])]
        grid = attention_grid(
            denormalize_clip(np.asarray(batch.images[-1][:4])),
            np.asarray(attn), labels)
        img_dir = os.path.join(self.output_dir, "Image")
        os.makedirs(img_dir, exist_ok=True)
        from PIL import Image
        Image.fromarray(grid).save(
            os.path.join(img_dir, f"attn_epoch{epoch}.png"))
