"""Jitted train steps: DAMSM CLIP fine-tuning and the adversarial GAN step.

Parity targets:
* DAMSM step — the body of ``pretrain_DAMSM.train`` (pretrain_DAMSM.py:94-197):
  two caption views through CLIP, word/sentence DAMSM losses on both, NT-Xent
  between the two sentence embeddings, grad-clip 0.25, two optimizer groups.
* GAN step — one iteration of ``condGANTrainer.train``
  (trainer.py:300-437): text encode (detached), G forward for both caption
  views with shared z, per-scale D updates (conditional + unconditional +
  wrong-pair BCE, both views), then the G update against the *updated*
  discriminators with the DAMSM ranking loss on the finest scale, KL, and
  0.2x NT-Xent between the CLIP encodings of the two fake batches, followed
  by the G-EMA update.

TPU-first redesign notes:
* each step is ONE jitted function — all three D updates and the G update
  execute in a single XLA program; under a data mesh the gradient psums ride
  ICI with zero host round-trips per step;
* batches are unsorted and mask-based (the reference's sort/unsort
  permutations, trainer.py:409-415, are identity here);
* real/fake/fake2 discriminator features are computed in one concatenated
  trunk apply (the trunk is BN-free, so this is exact); spectral-norm power
  iteration therefore advances once per step — the standard SN-GAN recipe —
  rather than the reference's incidental 6x per step from repeated forwards;
* one CLIP image encode serves both caption views (identical images; the
  reference re-encodes the same pixels in a second sorted order,
  pretrain_DAMSM.py:114-115);
* reference bugs NOT replicated (SURVEY §7): the stale 6-arg ``words_loss``
  call in the GAN path (losses.py:352), the inverted memory-attention mask
  (trainer.py:317), and ``sent_emb_2`` being overwritten with view 1 before
  the contrastive loss (pretrain_DAMSM.py:171) — the documented intent is
  implemented instead.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax

from t2igan.config import Config
from t2igan.losses import (discriminator_loss, generator_adv_loss, kl_loss,
                           nt_xent_loss, sent_loss, strip_special_tokens,
                           words_loss, wrong_pair)
from t2igan.models.clip import ClipWithRegionHead
from t2igan.ops.image import resize_nearest
from t2igan.train.state import DamsmTrainState, GanTrainState, ema_update

Array = jnp.ndarray


def _l2n(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# DAMSM pretraining step
# ---------------------------------------------------------------------------

def make_damsm_loss(cfg: Config, clip_model: ClipWithRegionHead):
    """Pure DAMSM loss ``(clip_params, batch) -> (total, metrics)`` — also
    used stand-alone (jitted) for validation (pretrain_DAMSM.py:273-344).
    ``batch``: dict with images [B, S, S, 3], ids/mask for both caption
    views, class_ids."""
    g1 = cfg.TRAIN.SMOOTH.GAMMA1
    g2 = cfg.TRAIN.SMOOTH.GAMMA2
    g3 = cfg.TRAIN.SMOOTH.GAMMA3

    def loss_fn(params, batch):
        variables = {"params": params}

        subr, img_code = clip_model.apply(
            variables, batch["images"],
            method=ClipWithRegionHead.encode_image_verbose)
        img_code = _l2n(img_code)
        regions = subr[:, 1:, :]                      # strip CLS token

        # Both caption views ride ONE [2B] text-tower apply: the tower is
        # LayerNorm-only (row-independent), so this is exact, and at these
        # tiny sequence lengths (30 tokens) the doubled batch halves the
        # per-op dispatch count and fattens the attention matmul tiles
        # (the round-5 DAMSM trace shows the text side as ~1200 fragmented
        # ops/step).  The reference runs two separate CLIP forwards
        # (pretrain_DAMSM.py:114-115) — same math.
        words12, sent12 = clip_model.apply(
            variables,
            jnp.concatenate([batch["ids"], batch["ids_2"]], axis=0),
            jnp.concatenate([batch["mask"], batch["mask_2"]], axis=0),
            method=ClipWithRegionHead.encode_text_verbose)
        # the reference reads sentence embeddings from CLIPModel.forward,
        # which l2-normalizes them (see models/clip.py)
        words1, words2 = jnp.split(words12, 2, axis=0)
        sent1, sent2 = jnp.split(_l2n(sent12), 2, axis=0)
        w1, m1 = strip_special_tokens(words1, batch["mask"])
        w2, m2 = strip_special_tokens(words2, batch["mask_2"])

        cls = batch["class_ids"]
        wl0, wl1 = words_loss(regions, w1, cls, m1, g1, g2, g3)
        wl0b, wl1b = words_loss(regions, w2, cls, m2, g1, g2, g3)
        sl0, sl1 = sent_loss(img_code, sent1, cls, g3)
        sl0b, sl1b = sent_loss(img_code, sent2, cls, g3)
        contrast = nt_xent_loss(sent1, sent2, temperature=0.5)
        total = wl0 + wl1 + wl0b + wl1b + sl0 + sl1 + sl0b + sl1b + contrast
        metrics = {
            "loss": total,
            "w_loss": wl0 + wl1 + wl0b + wl1b,
            "s_loss": sl0 + sl1 + sl0b + sl1b,
            "contrastive": contrast,
        }
        return total, metrics

    return loss_fn


def make_damsm_step(cfg: Config, clip_model: ClipWithRegionHead, tx):
    """Build the jittable DAMSM step ``(state, batch) -> (state, metrics)``."""
    loss_fn = make_damsm_loss(cfg, clip_model)

    def step(state: DamsmTrainState, batch) -> Tuple[DamsmTrainState, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.clip_params, batch)
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.clip_params)
        new_params = optax.apply_updates(state.clip_params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, clip_params=new_params,
                             opt_state=new_opt), metrics

    return step


# ---------------------------------------------------------------------------
# Adversarial GAN step
# ---------------------------------------------------------------------------

def make_gan_step(cfg: Config, clip_model: ClipWithRegionHead, gen_model,
                  d_models: List[Any], g_tx, d_tx,
                  ema_decay: float = 0.999):
    """Build the jittable adversarial step.

    ``(state, clip_params, batch, rng) -> (state, metrics)`` where ``batch``
    holds the image pyramid and both caption views.  ``ema_decay`` defaults
    to the reference's G-EMA mixing rate (trainer.py:436-437); short
    overfit harnesses pass a smaller horizon.
    """
    g1 = cfg.TRAIN.SMOOTH.GAMMA1
    g2 = cfg.TRAIN.SMOOTH.GAMMA2
    g3 = cfg.TRAIN.SMOOTH.GAMMA3
    lam = cfg.TRAIN.SMOOTH.LAMBDA
    nz = cfg.GAN.Z_DIM
    clip_size = clip_model.cfg.image_size
    n_scales = len(d_models)

    def encode_text_both(clip_params, batch):
        # one [2B] text-tower apply for both caption views (row-independent
        # LayerNorm tower — exact; halves the text-side dispatch count)
        words, sent = clip_model.apply(
            {"params": clip_params},
            jnp.concatenate([batch["ids"], batch["ids_2"]], axis=0),
            jnp.concatenate([batch["mask"], batch["mask_2"]], axis=0),
            method=ClipWithRegionHead.encode_text_verbose)
        # detached text conditioning (trainer.py:338)
        words = jax.lax.stop_gradient(words)
        sent = jax.lax.stop_gradient(sent)
        (w1, w2), (s1, s2) = (jnp.split(words, 2, axis=0),
                              jnp.split(sent, 2, axis=0))
        return w1, s1, w2, s2

    def generate(g_params, g_bstats, z, sent, words, pad_mask, eps):
        # return_attn=False: the memory read runs through the fused Pallas
        # kernel (fwd + flash-style bwd) — no [B, HW, L] attention tensor in
        # HBM in either direction.
        (fakes, _, mu, logvar), upd = gen_model.apply(
            {"params": g_params, "batch_stats": g_bstats},
            z, sent, words, pad_mask, True, eps, False,
            mutable=["batch_stats"])
        return fakes, mu, logvar, upd["batch_stats"]

    def step(state: GanTrainState, clip_params, batch, rng):
        b = batch["ids"].shape[0]
        rng_z, rng_e1, rng_e2 = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z, (b, nz))
        eps1 = jax.random.normal(rng_e1, (b, cfg.GAN.CONDITION_DIM))
        eps2 = jax.random.normal(rng_e2, (b, cfg.GAN.CONDITION_DIM))

        words1, sent1, words2, sent2 = encode_text_both(clip_params, batch)
        pad1 = batch["mask"] == 0
        pad2 = batch["mask_2"] == 0

        # The whole iteration lives inside ONE differentiated function so
        # each caption view pays a single G forward (trainer.py:352-354
        # generates once and feeds both the D updates and the G loss): the
        # stop-gradiented fakes drive the D updates — that subgraph carries
        # no gp tangents, so the outer AD treats it as primal and saves no
        # residuals for it — and the same tensors (with grad) then meet the
        # freshly *updated* discriminators (trainer.py:388-435).
        def g_loss_fn(gp):
            f1, mu1g, lv1g, b1 = generate(gp, state.g_batch_stats, z, sent1,
                                          words1, pad1, eps1)
            f2, mu2g, lv2g, b2 = generate(gp, b1, z, sent2, words2, pad2,
                                          eps2)
            fakes1 = [jax.lax.stop_gradient(f) for f in f1]
            fakes2 = [jax.lax.stop_gradient(f) for f in f2]

            # ---- per-scale discriminator updates (trainer.py:361-376) ----
            new_d_params, new_d_spectral, new_d_opts = [], [], []
            d_metrics: Dict[str, Array] = {}
            for i in range(n_scales):
                model = d_models[i]
                real = batch["images"][i]

                def d_loss_fn(dp, i=i, model=model, real=real):
                    x = jnp.concatenate([real, fakes1[i], fakes2[i]], axis=0)
                    h, upd = model.apply(
                        {"params": dp, "spectral": state.d_spectral[i]},
                        x, method=model.features, mutable=["spectral"])
                    h_r, h_f1, h_f2 = jnp.split(h, 3, axis=0)

                    def head(hc, c):
                        return model.apply({"params": dp,
                                            "spectral": upd["spectral"]},
                                           hc, c, method=model.cond)

                    def uhead(hc):
                        return model.apply({"params": dp,
                                            "spectral": upd["spectral"]},
                                           hc, method=model.uncond)

                    loss1, aux1 = discriminator_loss(
                        head(h_r, sent1), head(h_f1, sent1),
                        head(h_r, wrong_pair(sent1)),
                        uhead(h_r), uhead(h_f1))
                    loss2, _ = discriminator_loss(
                        head(h_r, sent2), head(h_f2, sent2),
                        head(h_r, wrong_pair(sent2)),
                        uhead(h_r), uhead(h_f2))
                    return loss1 + loss2, (upd["spectral"], aux1)

                (d_loss, (spec, aux)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(state.d_params[i])
                upds, new_opt = d_tx.update(d_grads, state.d_opt_states[i],
                                            state.d_params[i])
                new_d_params.append(
                    optax.apply_updates(state.d_params[i], upds))
                new_d_spectral.append(spec)
                new_d_opts.append(new_opt)
                d_metrics[f"d_loss{i}"] = d_loss
                d_metrics[f"real_acc{i}"] = aux["real_acc"]
                d_metrics[f"fake_acc{i}"] = aux["fake_acc"]

            # ---- generator losses vs the updated Ds (trainer.py:388) ----
            # both caption views ride ONE [2B] trunk/head apply per scale —
            # the trunk is BN-free so this is exact, and the doubled batch
            # keeps the D convs on fatter MXU tiles at small train batches
            sent12 = jnp.concatenate([sent1, sent2], axis=0)
            adv = 0.0
            for i in range(n_scales):
                model = d_models[i]
                dv = {"params": new_d_params[i],
                      "spectral": new_d_spectral[i]}
                h = model.apply(dv, jnp.concatenate([f1[i], f2[i]], axis=0),
                                method=model.features)
                cond = model.apply(dv, h, sent12, method=model.cond)
                uncond = model.apply(dv, h, method=model.uncond)
                # Both views' BCE means in ONE call over the [2B] logits:
                # mean(half1) + mean(half2) == 2 * mean(all) exactly (equal
                # halves), so this is the reference's per-view sum
                # (losses.py:314-324, both views).  Deliberately NOT a
                # per-view split loop: `split -> two means -> sum` makes the
                # axon TPU backend miscompile the trunk's INPUT-gradient
                # convs into all-NaN output (deterministic, both dtypes,
                # forward unaffected; minimal repro + elimination table in
                # docs/PERFORMANCE.md round 5 "the NaN hunt").  XLA:CPU
                # compiles the split form correctly.
                adv = adv + 2.0 * generator_adv_loss(cond, uncond)

            # DAMSM ranking loss on the finest scale (losses.py:329-364).
            # Both views' fakes ride ONE [2B] CLIP vision apply (LayerNorm
            # tower, row-independent — exact); the ranking losses are
            # per-view (batching them would add cross-view negatives).
            cls = batch["class_ids"]
            resized = resize_nearest(
                jnp.concatenate([f1[-1], f2[-1]], axis=0), clip_size)
            subr12, img12 = clip_model.apply(
                {"params": clip_params}, resized,
                method=ClipWithRegionHead.encode_image_verbose)
            regions1, regions2 = jnp.split(subr12[:, 1:, :], 2, axis=0)
            cnn1, cnn2 = jnp.split(img12, 2, axis=0)

            def damsm_terms(regions, img_code, words, mask, sent):
                wl0, wl1 = words_loss(regions, words, cls,
                                      mask > 0, g1, g2, g3)
                sl0, sl1 = sent_loss(img_code, sent, cls, g3)
                return (wl0 + wl1) * lam, (sl0 + sl1) * lam

            w_a, s_a = damsm_terms(regions1, cnn1, words1,
                                   batch["mask"], sent1)
            w_b, s_b = damsm_terms(regions2, cnn2, words2,
                                   batch["mask_2"], sent2)
            kl = kl_loss(mu1g, lv1g) + kl_loss(mu2g, lv2g)
            contrast = 0.2 * nt_xent_loss(_l2n(cnn1), _l2n(cnn2), 0.5)
            total = adv + w_a + w_b + s_a + s_b + kl + contrast
            aux = {"g_adv": adv, "w_loss": w_a + w_b, "s_loss": s_a + s_b,
                   "kl_loss": kl, "contrastive": contrast,
                   "batch_stats": b2, "d_metrics": d_metrics,
                   "d_state": (new_d_params, new_d_spectral, new_d_opts)}
            return total, aux

        (g_loss, g_aux), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_upds, g_opt = g_tx.update(g_grads, state.g_opt_state,
                                    state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upds)
        ema = ema_update(state.g_ema_params, g_params, ema_decay)

        metrics: Dict[str, Array] = dict(g_aux["d_metrics"])
        metrics["g_loss"] = g_loss
        for k in ("g_adv", "w_loss", "s_loss", "kl_loss", "contrastive"):
            metrics[k] = g_aux[k]
        new_d_params, new_d_spectral, new_d_opts = g_aux["d_state"]

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_batch_stats=g_aux["batch_stats"],
            g_ema_params=ema,
            g_opt_state=g_opt,
            d_params=new_d_params,
            d_spectral=new_d_spectral,
            d_opt_states=new_d_opts,
        )
        return new_state, metrics

    return step


def make_sampler(cfg: Config, clip_model: ClipWithRegionHead, gen_model,
                 return_attn: bool = False, mesh=None):
    """Jittable text -> image pyramid inference (the core of ``sampling()``,
    trainer.py:545-556): CLIP text encode then generator forward in eval
    mode (running BN statistics, fixed CA noise).

    ``return_attn=False`` (the throughput path) routes the memory read
    through the fused Pallas kernel and skips materializing attention maps;
    visualization callers pass True.

    With ``mesh`` the sampler runs data-parallel: parameters replicated,
    the batch dimension sharded over the mesh's ``data`` axis — the
    TPU-native form of the reference wrapping netG/CLIP in
    ``nn.DataParallel`` for its eval sweep (trainer.py:255-265)."""

    def sample(clip_params, g_params, g_bstats, ids, mask, z, eps):
        words, sent = clip_model.apply(
            {"params": clip_params}, ids, mask,
            method=ClipWithRegionHead.encode_text_verbose)
        fakes, atts, _, _ = gen_model.apply(
            {"params": g_params, "batch_stats": g_bstats},
            z, sent, words, mask == 0, False, eps,
            return_attn)
        return fakes, atts

    if mesh is None:
        return jax.jit(sample)
    from t2igan.parallel.mesh import batch_sharded, replicated

    rep, shard = replicated(mesh), batch_sharded(mesh)
    return jax.jit(sample,
                   in_shardings=(rep, rep, rep, shard, shard, shard, shard),
                   out_shardings=shard)
