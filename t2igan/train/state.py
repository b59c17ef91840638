"""Train-state containers and optimizer builders.

Parity targets:
* GAN optimizers: one Adam per discriminator + one for G, lr 2e-4,
  betas (0.5, 0.999) (trainer.py:162-175);
* G-EMA shadow with decay 0.999 (trainer.py:436-437), snapshots store the
  EMA weights (trainer.py:189-200);
* DAMSM: two Adams (betas (0.9, 0.98)) over backbone vs. the fresh
  ``linear_subr`` head, each under a OneCycle cosine schedule, plus global
  grad-norm clip 0.25 (pretrain_DAMSM.py:189-197, :458-476).

Deliberate deviation: the reference constructs OneCycleLR for
``steps_per_epoch * epochs`` steps but calls ``.step()`` once per *epoch*
(pretrain_DAMSM.py:496-497), so the published code only ever traverses the
first ``MAX_EPOCH`` points of the warmup.  We advance the schedule once per
optimizer step — the documented intent of OneCycle — with the same peak
values, pct_start and div factors.
"""

from __future__ import annotations

from typing import Any, List

import flax
import jax
import jax.numpy as jnp
import optax

from t2igan.config import Config


@flax.struct.dataclass
class GanTrainState:
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_ema_params: Any
    g_opt_state: Any
    d_params: List[Any]
    d_spectral: List[Any]
    d_opt_states: List[Any]


@flax.struct.dataclass
class DamsmTrainState:
    step: jnp.ndarray
    clip_params: Any
    opt_state: Any


def gan_optimizers(cfg: Config):
    """(g_tx, d_tx): Adam with the reference's hyperparameters
    (trainer.py:162-175; torch Adam eps default 1e-8)."""
    g_tx = optax.adam(cfg.TRAIN.GENERATOR_LR, b1=0.5, b2=0.999, eps=1e-8)
    d_tx = optax.adam(cfg.TRAIN.DISCRIMINATOR_LR, b1=0.5, b2=0.999, eps=1e-8)
    return g_tx, d_tx


def damsm_optimizer(cfg: Config, steps_per_epoch: int):
    """Two-group transform: backbone vs. linear_subr head, OneCycle cosine
    schedules with the reference's factors (pretrain_DAMSM.py:458-476;
    torch OneCycleLR defaults div_factor=25, final_div_factor=1e4)."""
    total = max(1, steps_per_epoch * cfg.TRAIN.MAX_EPOCH)
    backbone_sched = optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=cfg.TRAIN.BACKBONE_LR,
        pct_start=0.02, div_factor=25.0, final_div_factor=1e4)
    linear_sched = optax.cosine_onecycle_schedule(
        transition_steps=total, peak_value=cfg.TRAIN.LINEAR_LR,
        pct_start=0.1, div_factor=1e3, final_div_factor=1e6)

    def label_fn(params):
        return jax.tree.map_with_path(
            lambda path, _: "linear"
            if any(getattr(k, "key", None) == "linear_subr" for k in path)
            else "backbone",
            params)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.TRAIN.RNN_GRAD_CLIP),
        optax.multi_transform(
            {"backbone": optax.adam(backbone_sched, b1=0.9, b2=0.98,
                                    eps=1e-8),
             "linear": optax.adam(linear_sched, b1=0.9, b2=0.98, eps=1e-8)},
            label_fn),
    )
    return tx


def ema_update(ema_params, params, decay: float = 0.999):
    """avg = decay * avg + (1 - decay) * p (trainer.py:436-437)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)


def init_gan_state(cfg: Config, gen_model, d_models, rng,
                   words_num: int | None = None) -> GanTrainState:
    """Initialize G/D parameters, EMA shadow and optimizer states.

    The EMA shadow starts as a copy of the fresh G parameters
    (``copy_G_params``, trainer.py:267).
    """
    words_num = words_num or cfg.TEXT.WORDS_NUM
    b = 2  # init batch; shapes generalize
    rng_g, rng_ca, *rng_ds = jax.random.split(rng, 2 + len(d_models))
    z = jnp.zeros((b, cfg.GAN.Z_DIM))
    sent = jnp.zeros((b, cfg.TEXT.EMBEDDING_DIM))
    words = jnp.zeros((b, words_num, cfg.TEXT.EMBEDDING_DIM))
    pad = jnp.zeros((b, words_num), bool)
    g_vars = gen_model.init({"params": rng_g, "gaussian": rng_ca},
                            z, sent, words, pad, True)
    g_tx, d_tx = gan_optimizers(cfg)

    d_params, d_spectral, d_opts = [], [], []
    for model, r in zip(d_models, rng_ds):
        x = jnp.zeros((b, model.img_size, model.img_size, 3))
        dv = model.init(r, x, sent)
        d_params.append(dv["params"])
        d_spectral.append(dv.get("spectral", {}))
        d_opts.append(d_tx.init(dv["params"]))

    return GanTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_ema_params=jax.tree.map(jnp.copy, g_vars["params"]),
        g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_params,
        d_spectral=d_spectral,
        d_opt_states=d_opts,
    )


def init_damsm_state(cfg: Config, clip_variables, tx) -> DamsmTrainState:
    params = clip_variables["params"]
    return DamsmTrainState(
        step=jnp.zeros((), jnp.int32),
        clip_params=params,
        opt_state=tx.init(params),
    )
