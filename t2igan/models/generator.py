"""Cascaded DM-GAN generator (64 -> 128 -> 256 px) with dynamic memory.

Parity targets in the reference ``model.py``:

* ``GLU`` / ``upBlock`` / ``ResBlock``          — model.py:82-136
* ``CA_NET`` conditioning augmentation          — model.py:333-361
* ``INIT_STAGE_G``                              — model.py:364-403
* ``Memory`` read                               — model.py:406-452
* ``NEXT_STAGE_G`` (write/read/response gates)  — model.py:455-533
* ``GET_IMAGE_G``                               — model.py:536-547
* ``G_NET`` / ``G_DCGAN``                       — model.py:550-641

TPU-first design decisions:
* NHWC layout (XLA's native conv layout on TPU); word sequences are
  ``[B, L, D]`` and the reference's k=1 ``Conv1d``s become ``Dense`` layers —
  identical math, better MXU mapping;
* static shapes everywhere: caption masks are carried, caption-length sorting
  is unnecessary;
* ``Memory``'s masked-softmax read is a batched einsum
  (:func:`t2igan.ops.attention.memory_read`) with per-sample masks — the
  reference's mask-tiling misalignment (model.py:438) and inverted mask
  polarity (trainer.py:317 passes ``attention_mask`` where the module
  expects a padding mask) are fixed to the documented intent;
* all hyperparameters arrive via module attributes from the Config, so the
  jitted graphs are fully static.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from t2igan.ops.attention import memory_read
from t2igan.ops.image import (conv3x3_on_up2x, conv3x3_on_up2x_dilated,
                              phase_batch_stats, phase_bn_glu_rgb_train,
                              up2x_bn_glu_rgb_phased, up2x_phase_conv,
                              upsample_nearest_2x)

Array = jnp.ndarray

ortho = jax.nn.initializers.orthogonal


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm scale ~ N(1, 0.02) (weights_init, miscc/utils.py:340-342)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def glu(x: Array, axis: int = -1) -> Array:
    """Gated linear unit over channels: ``a * sigmoid(b)`` (model.py:82-90)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def use_phased_tail(flag: bool, train: bool) -> bool:
    """Trace-time decision for the phase-space eval tail (config
    ``GAN.PHASED_TAIL`` with the ``T2IGAN_PHASED_TAIL`` env A/B override):
    the final stage computes upconv + BN + GLU + RGB head as two folded
    2x2 convs at LOW resolution (ops/image.py::up2x_bn_glu_rgb_phased)."""
    import os

    return (not train
            and os.environ.get("T2IGAN_PHASED_TAIL",
                               "1" if flag else "0") == "1")


def use_fused_tail(flag: bool, train: bool) -> bool:
    """Trace-time decision for the fused eval stage tail (config
    ``GAN.FUSED_TAIL`` with the ``T2IGAN_RESCHAIN`` env A/B override)."""
    import os

    return (not train
            and os.environ.get("T2IGAN_RESCHAIN",
                               "1" if flag else "0") == "1")


def use_phased_tail_train(flag: bool, train: bool) -> bool:
    """Trace-time decision for the TRAIN-mode phase-space tail (config
    ``GAN.PHASED_TAIL_TRAIN`` with the ``T2IGAN_PHASED_TAIL_TRAIN`` env
    A/B override): the final stage's training tail (upconv + batch-stat
    BN + GLU + RGB head) runs in 2x2 subpixel phase space with halo-masked
    batch statistics (ops/image.py::phase_batch_stats)."""
    import os

    return (train
            and os.environ.get("T2IGAN_PHASED_TAIL_TRAIN",
                               "1" if flag else "0") == "1")


class _BNStats(nn.Module):
    """Declares the IDENTICAL parameter/variable tree as ``nn.BatchNorm``
    (params ``scale``/``bias``, batch_stats ``mean``/``var`` — same names,
    shapes, dtypes, inits) for paths that normalize OUTSIDE the module
    (the phase-space train tail, where the statistics are computed from
    the phase tensor): given freshly computed batch ``(mean, var)`` it
    performs the same momentum-0.9 running-average update and returns the
    ``(scale, bias)`` affine params."""

    features: int

    @nn.compact
    def __call__(self, stats):
        mean, var = stats
        scale = self.param("scale", bn_scale_init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        if not self.is_initializing():
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
        return scale, bias


class BatchNorm(nn.Module):
    """BatchNorm with torch-parity defaults (momentum 0.1, eps 1e-5) and the
    reference's N(1, 0.02) scale init.

    ``stats=(mean, var)`` selects the external-normalization mode: the
    identical param/variable tree is declared (so checkpoints and the
    torch converters are unaffected), the running stats update from the
    provided batch statistics exactly as ``nn.BatchNorm`` would, and the
    raw ``(scale, bias)`` params are returned for the caller to apply —
    used by the phase-space train tail, whose statistics come from the
    halo-masked phase tensor."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, stats=None):
        if stats is not None:
            return _BNStats(stats[0].shape[-1], name="BatchNorm_0")(stats)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=bn_scale_init, dtype=self.dtype)(x)


class _SubpixelUpConv(nn.Module):
    """conv3x3 over a nearest-2x upsample, computed as the equivalent
    four-phase 2x2 subpixel conv (:func:`conv3x3_on_up2x`) — 2.25x fewer
    FLOPs and the upsampled tensor never hits HBM.  The parameter is the
    plain [3, 3, Cin, Cout] kernel under the same ``Conv_0/kernel`` path as
    ``nn.Conv``, so checkpoints and torch converters are unaffected."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", ortho(),
                            (3, 3, x.shape[-1], self.features))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return conv3x3_on_up2x(x, kernel)


class _Conv3x3Param(nn.Module):
    """Parameter holder exposing the plain [3, 3, Cin, Cout] conv kernel
    under the same ``Conv_0/kernel`` path as ``nn.Conv`` — used by UpBlock
    paths that consume the kernel inside a fused Pallas call."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param("kernel", ortho(),
                          (3, 3, in_features, self.features))


class _DilatedUpConv(nn.Module):
    """conv3x3 over a nearest-2x upsample as one input-dilated conv
    (:func:`conv3x3_on_up2x_dilated`) — ~1.9x faster than the two-op form
    on TPU.  Parameter is the plain [3, 3, Cin, Cout] kernel under the same
    ``Conv_0/kernel`` path as ``nn.Conv``."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", ortho(),
                            (3, 3, x.shape[-1], self.features))
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return conv3x3_on_up2x_dilated(x, kernel)


class UpBlock(nn.Module):
    """2x nearest upsample + conv3x3 -> 2C + BN + GLU (model.py:104-110).

    Three output-equivalent computations of the upsample+conv pair, selected
    by ``T2IGAN_UPBLOCK`` (all share the one ``Conv_0/kernel`` [3,3,Cin,2C]
    param; equivalence tested in test_models_gan.py).  v5e measurements for
    the 128^2->256^2 stage-3 conv, batch 128 bf16 (tools/upblock_variants.py
    + microbench):

    * ``dilated`` (DEFAULT) — one input-dilated conv with a derived 4x4
      kernel; 13.8 ms/batch.  The TPU conv emitter's phase decomposition
      wins.
    * ``naive``   — the reference's literal two-op form; 26.7 ms/batch.
    * ``subpixel`` — explicit 4-phase 2x2 conv + interleave; slowest (~2x
      worse than naive end-to-end) because of odd conv shapes and the
      interleave, despite 2.25x fewer FLOPs.  Kept as a documented negative
      result.

    Two further Pallas variants were built, measured as full-graph losses,
    and RETIRED (docs/PERFORMANCE.md rounds 2-4): ``pallas`` (row-major
    fused upconv+BN+GLU; 1513 vs 1724 imgs/sec gen-only) and ``bm``
    (batch-minor, reading XLA's native activation layout; 1379.9 plain /
    1432.7 DMA-pipelined vs 1437.5 default gen+eval).  The fused stage-tail
    kernel (ops/pallas/reschain.py, ``GAN.FUSED_TAIL``) remains the one
    documented-negative kernel of this family.

    The variant comes from the config (``GAN.UPBLOCK``) via the module
    attribute so the compiled graph is reproducible from the YAML alone;
    the ``T2IGAN_UPBLOCK`` env var remains as an explicit A/B override."""

    features: int
    dtype: Any = jnp.float32
    variant: str = "dilated"

    @nn.compact
    def __call__(self, x, train: bool, fold: bool = False,
                 phase_train: bool = False):
        import os

        if fold:
            f2 = self.features * 2
            kernel = _Conv3x3Param(f2, name="Conv_0")(x.shape[-1])
            scale, shift = _bn_affine(BatchNorm(self.dtype,
                                                name="BatchNorm_0"), f2)
            return kernel, scale, shift
        if phase_train:
            # TRAIN-mode phase-space form (GAN.PHASED_TAIL_TRAIN): the raw
            # pre-BN phase tensor, its halo-masked batch statistics, and
            # the BN affine params — running stats update exactly as the
            # module chain's nn.BatchNorm (same param tree).  The caller
            # finishes with ops/image.py::phase_bn_glu_rgb_train.
            f2 = self.features * 2
            kernel = _Conv3x3Param(f2, name="Conv_0")(x.shape[-1])
            y = up2x_phase_conv(x.astype(self.dtype),
                                kernel.astype(self.dtype))
            mean, var = phase_batch_stats(y)
            scale, bias = BatchNorm(self.dtype, name="BatchNorm_0")(
                y, train, stats=(mean, var))
            return y, mean, var, scale, bias

        variant = os.environ.get("T2IGAN_UPBLOCK", self.variant)
        if variant == "naive":
            x = upsample_nearest_2x(x)
            x = nn.Conv(self.features * 2, (3, 3), padding=1, use_bias=False,
                        kernel_init=ortho(), dtype=self.dtype,
                        name="Conv_0")(x)
        elif variant == "subpixel":
            x = _SubpixelUpConv(self.features * 2, self.dtype,
                                name="Conv_0")(x)
        else:
            x = _DilatedUpConv(self.features * 2, self.dtype,
                               name="Conv_0")(x)
        x = BatchNorm(self.dtype)(x, train)
        return glu(x)


def _bn_affine(bn: "BatchNorm", features: int):
    """Fold an eval-mode BatchNorm into (scale, shift) by probing the
    shared child at 0 and 1 — exact, since eval BN is affine per channel."""
    zero = bn(jnp.zeros((1, 1, 1, features), jnp.float32), False)
    one = bn(jnp.ones((1, 1, 1, features), jnp.float32), False)
    shift = zero.reshape(features).astype(jnp.float32)
    scale = (one - zero).reshape(features).astype(jnp.float32)
    return scale, shift


class ResBlock(nn.Module):
    """conv3x3->2C + BN + GLU + conv3x3->C + BN, residual (model.py:122-136).

    ``fold=True`` (eval-mode fusion support) declares the identical
    parameters but returns the folded weights
    ``(k1, scale1, shift1, k2, scale2, shift2)`` instead of computing —
    consumed by the fused tail kernel (ops/pallas/reschain.py)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, fold: bool = False):
        if fold:
            f2 = self.features * 2
            k1 = _Conv3x3Param(f2, name="Conv_0")(x.shape[-1])
            s1, b1 = _bn_affine(BatchNorm(self.dtype, name="BatchNorm_0"), f2)
            k2 = _Conv3x3Param(self.features, name="Conv_1")(self.features)
            s2, b2 = _bn_affine(BatchNorm(self.dtype, name="BatchNorm_1"),
                                self.features)
            return k1, s1, b1, k2, s2, b2
        h = nn.Conv(self.features * 2, (3, 3), padding=1, use_bias=False,
                    kernel_init=ortho(), dtype=self.dtype)(x)
        h = BatchNorm(self.dtype)(h, train)
        h = glu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    kernel_init=ortho(), dtype=self.dtype)(h)
        h = BatchNorm(self.dtype)(h, train)
        return x + h


class CANet(nn.Module):
    """Conditioning augmentation: sentence embedding -> (c, mu, logvar)
    (model.py:333-361)."""

    condition_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sent_emb: Array, eps: Optional[Array] = None):
        x = nn.Dense(self.condition_dim * 4, kernel_init=ortho(),
                     dtype=self.dtype)(sent_emb)
        x = glu(x)
        mu, logvar = x[:, :self.condition_dim], x[:, self.condition_dim:]
        if eps is None:
            eps = jax.random.normal(self.make_rng("gaussian"), mu.shape,
                                    dtype=mu.dtype)
        c_code = mu + jnp.exp(0.5 * logvar) * eps
        return c_code, mu, logvar


class InitStageG(nn.Module):
    """z + c -> [B, 64, 64, ngf] seed feature map (model.py:364-403)."""

    ngf: int  # = GF_DIM * 16 at this stage, matching the reference
    dtype: Any = jnp.float32
    upblock: str = "dilated"

    @nn.compact
    def __call__(self, z_code: Array, c_code: Array, train: bool):
        x = jnp.concatenate([c_code, z_code], axis=-1)
        x = nn.Dense(self.ngf * 4 * 4 * 2, use_bias=False,
                     kernel_init=ortho(), dtype=self.dtype)(x)
        x = BatchNorm(self.dtype)(x, train)
        x = glu(x)
        # torch reshapes channel-first to (B, ngf, 4, 4); NHWC equivalent:
        x = x.reshape(x.shape[0], self.ngf, 4, 4).transpose(0, 2, 3, 1)
        for i in range(4):
            x = UpBlock(self.ngf // (2 ** (i + 1)), self.dtype,
                        self.upblock)(x, train)
        return x  # [B, 64, 64, ngf/16]


class NextStageG(nn.Module):
    """Dynamic-memory refinement stage (model.py:455-533).

    Memory WRITE: per-word gate mixing word features against the pooled image
    state; READ: pixel-wise masked attention over key/value projections;
    RESPONSE: per-pixel gate blending the read-out into the image features;
    then R_NUM residual blocks and a 2x upsample.
    """

    ngf: int
    nef: int
    num_residual: int = 2
    dtype: Any = jnp.float32
    upblock: str = "dilated"
    fused_tail: bool = False
    phased_tail: bool = False
    phased_tail_train: bool = False

    @nn.compact
    def __call__(self, h_code: Array, word_embs: Array,
                 pad_mask: Optional[Array], train: bool,
                 return_attn: bool = True,
                 rgb_kernel: Optional[Array] = None):
        """h_code: [B, H, W, ngf]; word_embs: [B, L, nef];
        pad_mask: [B, L] bool, True at padding slots.  With
        ``return_attn=False`` the read dispatches to the fused Pallas
        kernel and no attention map is produced.  With ``rgb_kernel``
        (final stage, eval): the RGB head fuses into the stage tail, the
        2x feature map never materializes, and the RGB image is returned
        in place of the features."""
        b, hh, ww, c = h_code.shape
        L = word_embs.shape[1]

        # --- Memory writing (model.py:508-517) ---
        # Pooled image state, detached as in the reference (model.py:510).
        h_avg = jax.lax.stop_gradient(jnp.mean(h_code, axis=(1, 2)))  # [B, ngf]
        gate_w = nn.Dense(1, use_bias=False, kernel_init=ortho(),
                          dtype=self.dtype, name="A")(word_embs)      # [B, L, 1]
        gate_h = nn.Dense(1, use_bias=False, kernel_init=ortho(),
                          dtype=self.dtype, name="B")(h_avg)          # [B, 1]
        writing_gate = jax.nn.sigmoid(gate_w + gate_h[:, None, :])    # [B, L, 1]
        m_w = nn.relu(nn.Dense(self.ngf * 2, kernel_init=ortho(),
                               dtype=self.dtype, name="M_w")(word_embs))
        m_r = nn.relu(nn.Dense(self.ngf * 2, kernel_init=ortho(),
                               dtype=self.dtype, name="M_r")(h_avg))  # [B, 2ngf]
        memory = m_w * writing_gate + m_r[:, None, :] * (1.0 - writing_gate)

        # --- Key addressing / value reading (model.py:519-523) ---
        key = nn.relu(nn.Dense(self.ngf, kernel_init=ortho(),
                               dtype=self.dtype, name="key")(memory))
        value = nn.relu(nn.Dense(self.ngf, kernel_init=ortho(),
                                 dtype=self.dtype, name="value")(memory))
        mem_out, attn = memory_read(h_code, key, value, pad_mask,
                                    return_attn=return_attn)

        # --- Key response (model.py:526-528) ---
        gate_in = jnp.concatenate([h_code, mem_out], axis=-1)
        response_gate = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), kernel_init=ortho(), dtype=self.dtype,
                    name="response_gate")(gate_in))
        h_new = h_code * (1.0 - response_gate) + response_gate * mem_out
        h_new = jnp.concatenate([h_new, h_new], axis=-1)  # channel-duplicate

        out = self._stage_tail(h_new, train, rgb_kernel)
        if attn is not None:
            attn = attn.reshape(b, hh, ww, L)
        return out, attn

    def _stage_tail(self, h_new: Array, train: bool,
                    rgb_kernel: Optional[Array] = None) -> Array:
        """ResBlock x R -> UpBlock.  In eval mode (GAN.FUSED_TAIL, or the
        T2IGAN_RESCHAIN env A/B override) the whole tail runs as ONE fused
        Pallas pass per spatial row-band (ops/pallas/reschain.py) — the
        intermediate [B, H, W, 2ngf] activations never round-trip HBM,
        which the round-2 device trace showed to be ~half the gen step.
        Training keeps the module chain (BN needs batch statistics)."""
        b, hh, ww, c = h_new.shape
        if not use_fused_tail(self.fused_tail, train):
            for i in range(self.num_residual):
                h_new = ResBlock(self.ngf * 2, self.dtype)(h_new, train)
            if (rgb_kernel is not None
                    and use_phased_tail(self.phased_tail, train)):
                # Final stage, eval: the whole tail (upconv + BN + GLU +
                # RGB head + tanh) runs in 2x2 subpixel phase space — two
                # folded 2x2 convs at LOW resolution (1/4 the dilated
                # upconv's MXU FLOPs; the [B, 2H, 2W, 2ngf] pre-GLU tensor
                # never exists in HBM).  Module creation order matches the
                # plain path, so the param tree is identical.
                k_up, up_s, up_b = UpBlock(self.ngf, self.dtype,
                                           self.upblock)(h_new, train,
                                                         fold=True)
                return up2x_bn_glu_rgb_phased(
                    h_new.astype(self.dtype), k_up.astype(self.dtype),
                    up_s, up_b, rgb_kernel.astype(self.dtype))
            if (rgb_kernel is not None
                    and use_phased_tail_train(self.phased_tail_train,
                                              train)):
                # Final stage, TRAIN: same phase-space tail with
                # batch-statistics BN — the UpBlock computes the raw phase
                # conv + halo-masked stats and updates its running stats
                # exactly as the module chain; the affine/GLU/RGB/tanh
                # finish stays rank-4 flat-channel (GAN.PHASED_TAIL_TRAIN).
                y, mean, var, bn_s, bn_b = UpBlock(
                    self.ngf, self.dtype, self.upblock)(h_new, train,
                                                        phase_train=True)
                return phase_bn_glu_rgb_train(
                    y, mean, var, bn_s, bn_b, rgb_kernel.astype(self.dtype))
            # (Two retired A/B levers once lived here, both measured as
            # full-graph losses — docs/PERFORMANCE.md round 4:
            # T2IGAN_LAYOUT_PIN (row-major pin before the stage-3 upconv,
            # −2.4%: the boundary copies cost more than the batch-minor
            # conv form wastes) and T2IGAN_RGB_KERNEL=glu (Pallas GLU-fused
            # RGB head, −1.7%).  XLA's layout assignment and its GLU-fused
            # conv fetch stand as the production forms.)
            up = UpBlock(self.ngf, self.dtype, self.upblock)
            out = up(h_new, train)
            if rgb_kernel is None:
                return out
            y = jax.lax.conv_general_dilated(
                out.astype(self.dtype), rgb_kernel.astype(self.dtype),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.tanh(y)

        from t2igan.ops.pallas.reschain import (resblock_chain_up_fused,
                                                resblock_chain_up_reference)

        folds = [ResBlock(self.ngf * 2, self.dtype)(h_new, train, fold=True)
                 for _ in range(self.num_residual)]
        up_k, up_s, up_b = UpBlock(self.ngf, self.dtype,
                                   self.upblock)(h_new, train, fold=True)
        dt = self.dtype
        rbp = [(k1.astype(dt), s1, b1, k2.astype(dt), s2, b2)
               for (k1, s1, b1, k2, s2, b2) in folds]
        up = (up_k.astype(dt), up_s, up_b)
        rgbk = None if rgb_kernel is None else rgb_kernel.astype(dt)
        want_h = rgb_kernel is None  # final stage: only the image is used

        def fused(h, rbp, up, rgbk):
            return resblock_chain_up_fused(h, rbp, *up, rgb_kernel=rgbk,
                                           want_h=want_h)

        def ref(h, rbp, up, rgbk):
            return resblock_chain_up_reference(h, rbp, *up, rgb_kernel=rgbk,
                                               want_h=want_h)

        # VMEM gate: the single-buffered padded image block (plus weights
        # and the f32 conv accumulators) must fit the ~16 MB scoped VMEM.
        p = 2 * self.num_residual + (2 if rgbk is not None else 1)
        bpe = jnp.dtype(dt).itemsize
        blk = (hh + 2 * p) * (ww + 2 * p) * c * bpe
        if blk > 8 * 1024 * 1024:
            return ref(h_new.astype(dt), rbp, up, rgbk)
        return jax.lax.platform_dependent(h_new.astype(dt), rbp, up, rgbk,
                                          tpu=fused, axon=fused, default=ref)


class GetImageG(nn.Module):
    """Feature map -> RGB in [-1, 1] (model.py:536-547).

    The 3-channel-output conv looks like the worst MXU fit in the graph
    (~1% MFU through XLA) but is NOT worth a kernel: the round-2 trace
    shows XLA fuses the GLU into its fetch (4.0 ms in-graph vs 6.8
    isolated), and all three Pallas replacements measured as full-graph
    losses on chip in round 4 — channels-major (DMA lane-alignment forces
    doubled traffic), paired-pixel (1342.5, −6.6%) and GLU-fused (1413.6,
    −1.7%) vs the 1437.5 XLA default (docs/PERFORMANCE.md round 4).  The
    kernel family and its ``T2IGAN_RGB_KERNEL`` selector are deleted; the
    plain XLA conv below is the production form, and the only remaining
    alternative is the whole-stage fused tail (``GAN.FUSED_TAIL``, the
    documented-negative reschain kernel) which folds this head via
    ``fold=True``."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h_code: Array, fold: bool = False):
        if fold:
            # Declare the same Conv_0/kernel param but return it folded —
            # consumed by the final stage's fused tail (the [B, 2H, 2W, C]
            # feature map then never materializes; ops/pallas/reschain.py).
            return _Conv3x3Param(3, name="Conv_0")(h_code.shape[-1])
        x = nn.Conv(3, (3, 3), padding=1, use_bias=False,
                    kernel_init=ortho(), dtype=self.dtype,
                    name="Conv_0")(h_code)
        return jnp.tanh(x)


class GNet(nn.Module):
    """Cascaded generator (model.py:550-597).

    Attributes follow the config: ``gf_dim`` = GAN.GF_DIM, ``nef`` =
    TEXT.EMBEDDING_DIM, ``condition_dim`` = GAN.CONDITION_DIM, ``branch_num``
    = TREE.BRANCH_NUM, ``num_residual`` = GAN.R_NUM.
    """

    gf_dim: int = 64
    nef: int = 512
    condition_dim: int = 512
    branch_num: int = 3
    num_residual: int = 2
    dtype: Any = jnp.float32
    upblock: str = "dilated"
    fused_tail: bool = False
    phased_tail: bool = False
    phased_tail_train: bool = False

    @nn.compact
    def __call__(self, z_code: Array, sent_emb: Array, word_embs: Array,
                 pad_mask: Optional[Array], train: bool = True,
                 ca_eps: Optional[Array] = None, return_attn: bool = True):
        """Returns (fake_imgs, att_maps, mu, logvar).

        fake_imgs: list of [B, s, s, 3] in [-1, 1] for s in (64, 128, 256);
        att_maps: list of [B, H, W, L] memory attention maps.
        """
        ngf = self.gf_dim
        fake_imgs, att_maps = [], []
        c_code, mu, logvar = CANet(self.condition_dim, self.dtype)(
            sent_emb, ca_eps)

        h_code = InitStageG(ngf * 16, self.dtype,
                            self.upblock)(z_code, c_code, train)
        fake_imgs.append(GetImageG(self.dtype)(h_code))
        for i in range(1, self.branch_num):
            stage = NextStageG(ngf, self.nef, self.num_residual,
                               self.dtype, self.upblock, self.fused_tail,
                               self.phased_tail, self.phased_tail_train)
            last = i == self.branch_num - 1
            if last and (use_fused_tail(self.fused_tail, train)
                         or use_phased_tail(self.phased_tail, train)
                         or use_phased_tail_train(self.phased_tail_train,
                                                  train)):
                # Final stage, eval: fold the RGB head into the fused stage
                # tail — the [B, 2H, 2W, ngf] feature map never
                # materializes (its only consumer is this head).  Module
                # creation order matches the plain path, so the param tree
                # is identical.
                head = GetImageG(self.dtype)
                rgb_k = head(h_code, fold=True)
                rgb, attn = stage(h_code, word_embs, pad_mask, train,
                                  return_attn, rgb_kernel=rgb_k)
                fake_imgs.append(rgb)
            else:
                h_code, attn = stage(h_code, word_embs, pad_mask, train,
                                     return_attn)
                fake_imgs.append(GetImageG(self.dtype)(h_code))
            if attn is not None:
                att_maps.append(attn)
        return fake_imgs, att_maps, mu, logvar


class GDCGan(nn.Module):
    """Single-output DCGAN-style variant (model.py:601-641): same stages but
    only the final RGB head."""

    gf_dim: int = 64
    nef: int = 512
    condition_dim: int = 512
    branch_num: int = 3
    num_residual: int = 2
    dtype: Any = jnp.float32
    upblock: str = "dilated"
    fused_tail: bool = False
    phased_tail: bool = False
    phased_tail_train: bool = False

    @nn.compact
    def __call__(self, z_code: Array, sent_emb: Array, word_embs: Array,
                 pad_mask: Optional[Array], train: bool = True,
                 ca_eps: Optional[Array] = None, return_attn: bool = True):
        ngf = self.gf_dim
        att_maps = []
        c_code, mu, logvar = CANet(self.condition_dim, self.dtype)(
            sent_emb, ca_eps)
        h_code = InitStageG(ngf * 16, self.dtype,
                            self.upblock)(z_code, c_code, train)
        img = None
        for i in range(1, self.branch_num):
            stage = NextStageG(ngf, self.nef, self.num_residual,
                               self.dtype, self.upblock, self.fused_tail,
                               self.phased_tail, self.phased_tail_train)
            last = i == self.branch_num - 1
            if last and (use_fused_tail(self.fused_tail, train)
                         or use_phased_tail(self.phased_tail, train)
                         or use_phased_tail_train(self.phased_tail_train,
                                                  train)):
                head = GetImageG(self.dtype)
                rgb_k = head(h_code, fold=True)
                img, attn = stage(h_code, word_embs, pad_mask, train,
                                  return_attn, rgb_kernel=rgb_k)
            else:
                h_code, attn = stage(h_code, word_embs, pad_mask, train,
                                     return_attn)
                img = None
            if attn is not None:
                att_maps.append(attn)
        if img is None:
            img = GetImageG(self.dtype)(h_code)
        return [img], att_maps, mu, logvar
