"""Torch -> flax weight converters for the GAN models.

The reference's deliverable artifacts are torch ``state_dict`` pickles:
``netG_epoch_%d.pth`` (EMA generator weights) and ``netD%d.pth`` per scale
(trainer.py:189-200, :459-462).  These converters map them onto
:class:`t2igan.models.generator.GNet` / :class:`~.generator.GDCGan` and
:class:`t2igan.models.discriminator.DNetWithHeads` variable trees so a
reference-trained model can be evaluated (FID/IS/R-precision) in this
framework without retraining.  The inverse problem (our checkpoints -> torch)
is out of scope; export uses :mod:`t2igan.train.export`.

Layout conventions bridged here:

* torch ``Linear``/k=1 ``Conv1d`` -> flax ``Dense``: ``kernel = W.T``
  (``Conv1d`` weights ``(out, in, 1)`` squeeze to ``(out, in)`` first);
* torch ``Conv2d`` ``(out, in, kh, kw)`` -> flax NHWC ``(kh, kw, in, out)``;
* torch ``BatchNorm{1,2}d`` ``weight/bias/running_mean/running_var`` ->
  flax ``scale/bias`` params + ``mean/var`` batch stats;
* the reference ``SpectralNorm`` wrapper (spectral.py:47-63) stores
  ``weight_bar`` (the raw weight), ``weight_u``/``weight_v`` (power-iteration
  buffers); ``weight_bar`` becomes the SNConv kernel and ``weight_u`` the
  ``"spectral"`` collection's ``u``.  Both implementations recompute ``v``
  from ``u`` before use (spectral.py:30, ops/spectral.py), so ``v`` only
  needs a shape-correct conversion (flattened-axis order permuted from
  torch's ``(in, kh, kw)`` to our ``(kh, kw, in)``).

Structural name map (torch module -> flax path), generator
(model.py:550-597):

====================  =====================================
``ca_net.fc``          ``CANet_0/Dense_0``
``h_net1.fc.0``        ``InitStageG_0/Dense_0``
``h_net1.fc.1``        ``InitStageG_0/BatchNorm_0/BatchNorm_0``
``h_net1.upsample<k>`` ``InitStageG_0/UpBlock_<k-1>``
``img_net<b>.img.0``   ``GetImageG_<b-1>/Conv_0``
``h_net<b>.{A,B,M_w,M_r,key,value}``  ``NextStageG_<b-2>/<same name>``
``h_net<b>.response_gate.0``          ``NextStageG_<b-2>/response_gate``
``h_net<b>.residual.<i>``             ``NextStageG_<b-2>/ResBlock_<i>``
``h_net<b>.upsample``                 ``NextStageG_<b-2>/UpBlock_0``
====================  =====================================

Discriminators (model.py:705-768): ``img_code_s16.{0,2,4,6}`` ->
``trunk/Encode16x_0/DownBlock_{0..3}``; ``img_code_s32``/``img_code_s64`` ->
``trunk/DownBlock_{0,1}``; ``img_code_s32_1``/``img_code_s64_{1,2}`` ->
``trunk/Block3x3Leaky_{0,1}``; ``COND_DNET.jointConv.0`` ->
``cond_head/Block3x3Leaky_0``; ``{COND,UNCOND}_DNET.outlogits.0`` ->
``{cond,uncond}_head/Conv_0``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Tree = Dict[str, dict]


def _np(v):
    return np.asarray(v, dtype=np.float32)


def _strip(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Normalize keys: drop DataParallel's ``module.`` prefix
    (trainer.py:131-133) and materialize numpy float32 arrays."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = _np(v)
    return out


def _dense(sd, src, bias=True):
    p = {"kernel": np.ascontiguousarray(sd[f"{src}.weight"].T)}
    if bias:
        p["bias"] = sd[f"{src}.bias"]
    return p


def _conv1d_as_dense(sd, src, bias=True):
    w = sd[f"{src}.weight"]  # (out, in, 1)
    p = {"kernel": np.ascontiguousarray(w[:, :, 0].T)}
    if bias:
        p["bias"] = sd[f"{src}.bias"]
    return p


def _conv2d(sd, src, bias=False):
    w = sd[f"{src}.weight"]  # (out, in, kh, kw)
    p = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if bias:
        p["bias"] = sd[f"{src}.bias"]
    return p


def _bn(sd, src):
    params = {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}
    stats = {"mean": sd[f"{src}.running_mean"],
             "var": sd[f"{src}.running_var"]}
    return params, stats


def _upblock(sd, src):
    """torch upBlock Sequential: .0 Upsample, .1 conv3x3(no bias), .2 BN
    (model.py:104-110)."""
    bn_p, bn_s = _bn(sd, f"{src}.2")
    params = {"Conv_0": _conv2d(sd, f"{src}.1"),
              "BatchNorm_0": {"BatchNorm_0": bn_p}}
    stats = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
    return params, stats


def _resblock(sd, src):
    """torch ResBlock.block Sequential: .0 conv, .1 BN, .2 GLU, .3 conv,
    .4 BN (model.py:122-131)."""
    bn0_p, bn0_s = _bn(sd, f"{src}.block.1")
    bn1_p, bn1_s = _bn(sd, f"{src}.block.4")
    params = {"Conv_0": _conv2d(sd, f"{src}.block.0"),
              "Conv_1": _conv2d(sd, f"{src}.block.3"),
              "BatchNorm_0": {"BatchNorm_0": bn0_p},
              "BatchNorm_1": {"BatchNorm_0": bn1_p}}
    stats = {"BatchNorm_0": {"BatchNorm_0": bn0_s},
             "BatchNorm_1": {"BatchNorm_0": bn1_s}}
    return params, stats


def _next_stage(sd, src, num_residual):
    """NEXT_STAGE_G (model.py:455-533): gates are Linears, the k=1 Conv1d
    projections become Denses, response_gate a 1x1 Conv2d."""
    params = {
        "A": _dense(sd, f"{src}.A", bias=False),
        "B": _dense(sd, f"{src}.B", bias=False),
        "M_r": _conv1d_as_dense(sd, f"{src}.M_r.0"),
        "M_w": _conv1d_as_dense(sd, f"{src}.M_w.0"),
        "key": _conv1d_as_dense(sd, f"{src}.key.0"),
        "value": _conv1d_as_dense(sd, f"{src}.value.0"),
        "response_gate": _conv2d(sd, f"{src}.response_gate.0", bias=True),
    }
    stats = {}
    for i in range(num_residual):
        params[f"ResBlock_{i}"], stats[f"ResBlock_{i}"] = _resblock(
            sd, f"{src}.residual.{i}")
    up_p, up_s = _upblock(sd, f"{src}.upsample")
    params["UpBlock_0"] = up_p
    stats["UpBlock_0"] = up_s
    return params, stats


def convert_torch_generator_state(state_dict: Mapping, branch_num: int = 3,
                                  num_residual: int = 2,
                                  dcgan: bool = False):
    """Convert a reference ``G_NET`` (or ``G_DCGAN`` with ``dcgan=True``)
    state dict -> flax variables for :class:`GNet` / :class:`GDCGan`.

    ``num_residual`` must match the checkpoint's ``cfg.GAN.R_NUM``
    (2 bird / 3 coco); it is inferred from the keys when possible.
    """
    sd = _strip(state_dict)
    # Infer R_NUM from the first NEXT_STAGE's residual keys if present.
    r = {int(k.split(".")[2]) for k in sd
         if k.startswith("h_net2.residual.")}
    if r:
        num_residual = max(r) + 1

    params: Tree = {"CANet_0": {"Dense_0": _dense(sd, "ca_net.fc")}}
    stats: Tree = {}

    init: Tree = {"Dense_0": {
        "kernel": np.ascontiguousarray(sd["h_net1.fc.0.weight"].T)}}
    bn_p, bn_s = _bn(sd, "h_net1.fc.1")
    init["BatchNorm_0"] = {"BatchNorm_0": bn_p}
    init_stats: Tree = {"BatchNorm_0": {"BatchNorm_0": bn_s}}
    for k in range(4):
        init[f"UpBlock_{k}"], init_stats[f"UpBlock_{k}"] = _upblock(
            sd, f"h_net1.upsample{k + 1}")
    params["InitStageG_0"] = init
    stats["InitStageG_0"] = init_stats

    for b in range(2, branch_num + 1):
        p, s = _next_stage(sd, f"h_net{b}", num_residual)
        params[f"NextStageG_{b - 2}"] = p
        stats[f"NextStageG_{b - 2}"] = s

    if dcgan:  # single RGB head (model.py:617)
        params["GetImageG_0"] = {"Conv_0": _conv2d(sd, "img_net.img.0")}
    else:
        for b in range(1, branch_num + 1):
            params[f"GetImageG_{b - 1}"] = {
                "Conv_0": _conv2d(sd, f"img_net{b}.img.0")}

    return {"params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, stats)}


def _snconv(sd, src):
    """SpectralNorm(conv) (spectral.py:47-63): ``<src>.module.weight_bar``
    is the raw weight; ``weight_u`` seeds the power iteration."""
    w = sd[f"{src}.module.weight_bar"]  # (out, in, kh, kw)
    o, i, kh, kw = w.shape
    p = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
         "bias": sd[f"{src}.module.bias"]}
    v = sd[f"{src}.module.weight_v"].reshape(i, kh, kw)
    spec = {"u": sd[f"{src}.module.weight_u"],
            "v": np.ascontiguousarray(np.transpose(v, (1, 2, 0)).reshape(-1))}
    return p, spec


def convert_torch_discriminator_state(state_dict: Mapping,
                                      img_size: int = 64,
                                      b_jcu: bool = True):
    """Convert a reference ``D_NET{64,128,256}`` state dict -> flax variables
    for :class:`DNetWithHeads` (model.py:705-768)."""
    sd = _strip(state_dict)
    b_jcu = b_jcu and any(k.startswith("UNCOND_DNET.") for k in sd)

    trunk: Tree = {"Encode16x_0": {}}
    spec: Tree = {"Encode16x_0": {}}
    for k, idx in enumerate((0, 2, 4, 6)):  # model.py:662-672
        p, s = _snconv(sd, f"img_code_s16.{idx}")
        trunk["Encode16x_0"][f"DownBlock_{k}"] = {"SNConv_0": p}
        spec["Encode16x_0"][f"DownBlock_{k}"] = {"SNConv_0": s}

    def put(flax_name, torch_src):
        p, s = _snconv(sd, torch_src)
        trunk[flax_name] = {"SNConv_0": p}
        spec[flax_name] = {"SNConv_0": s}

    if img_size == 128:  # model.py:723-742
        put("DownBlock_0", "img_code_s32.0")
        put("Block3x3Leaky_0", "img_code_s32_1.0")
    elif img_size == 256:  # model.py:746-768
        put("DownBlock_0", "img_code_s32.0")
        put("DownBlock_1", "img_code_s64.0")
        put("Block3x3Leaky_0", "img_code_s64_1.0")
        put("Block3x3Leaky_1", "img_code_s64_2.0")
    elif img_size != 64:
        raise ValueError(f"unsupported discriminator size {img_size}")

    joint_p, joint_s = _snconv(sd, "COND_DNET.jointConv.0")
    params: Tree = {
        "trunk": trunk,
        "cond_head": {
            "Block3x3Leaky_0": {"SNConv_0": joint_p},
            "Conv_0": _conv2d(sd, "COND_DNET.outlogits.0", bias=True),
        },
    }
    spectral: Tree = {
        "trunk": spec,
        "cond_head": {"Block3x3Leaky_0": {"SNConv_0": joint_s}},
    }
    if b_jcu:
        params["uncond_head"] = {
            "Conv_0": _conv2d(sd, "UNCOND_DNET.outlogits.0", bias=True)}

    return {"params": jax.tree.map(jnp.asarray, params),
            "spectral": jax.tree.map(jnp.asarray, spectral)}


def convert_torch_rnn_encoder_state(state_dict: Mapping,
                                    rnn_type: str = "LSTM") -> Tree:
    """Map a reference ``RNN_ENCODER`` state_dict (model.py:140-221) onto
    :class:`t2igan.models.legacy.RnnEncoder` variables.

    The torch module is a single-layer bidirectional ``nn.LSTM``/``nn.GRU``
    (batch_first) over an ``nn.Embedding``; flax splits each direction into
    a scanned cell with per-gate dense layers.  Gate packing:

    * torch LSTM ``weight_ih_l0`` rows are (i, f, g, o) chunks; flax
      ``OptimizedLSTMCell`` has ``ii/if/ig/io`` input kernels (no bias) and
      ``hi/hf/hg/ho`` recurrent kernels whose bias absorbs
      ``b_ih + b_hh`` (both add into the same pre-activation).
    * torch GRU rows are (r, z, n); flax ``GRUCell`` has ``ir/iz/in``
      (with bias) and ``hr/hz/hn`` (bias only on ``hn``).  The reset/update
      gates add ``b_ir + b_hr`` into one pre-activation, so both fold into
      the ``i*`` bias; the candidate keeps them separate because torch
      computes ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))`` — exactly
      flax's form with ``in.bias = b_in`` and ``hn.bias = b_hn``.

    ``_reverse`` weights land in the second cell (the ``reverse=True`` RNN).
    """
    sd = _strip(state_dict)
    params: Tree = {"Embed_0": {"embedding": sd["encoder.weight"]}}

    def lstm_cell(suffix):
        w_ih, w_hh = sd[f"rnn.weight_ih_l0{suffix}"], sd[f"rnn.weight_hh_l0{suffix}"]
        b = sd[f"rnn.bias_ih_l0{suffix}"] + sd[f"rnn.bias_hh_l0{suffix}"]
        h = w_hh.shape[1]
        cell = {}
        for gi, g in enumerate("ifgo"):
            rows = slice(gi * h, (gi + 1) * h)
            cell[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[rows].T)}
            cell[f"h{g}"] = {"kernel": np.ascontiguousarray(w_hh[rows].T),
                             "bias": b[rows]}
        return cell

    def gru_cell(suffix):
        w_ih, w_hh = sd[f"rnn.weight_ih_l0{suffix}"], sd[f"rnn.weight_hh_l0{suffix}"]
        b_ih, b_hh = sd[f"rnn.bias_ih_l0{suffix}"], sd[f"rnn.bias_hh_l0{suffix}"]
        h = w_hh.shape[1]
        cell = {}
        for gi, g in enumerate("rzn"):
            rows = slice(gi * h, (gi + 1) * h)
            ib = b_ih[rows] if g == "n" else b_ih[rows] + b_hh[rows]
            cell[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[rows].T),
                             "bias": ib}
            hk = {"kernel": np.ascontiguousarray(w_hh[rows].T)}
            if g == "n":
                hk["bias"] = b_hh[rows]
            cell[f"h{g}"] = hk
        return cell

    if rnn_type == "LSTM":
        params["OptimizedLSTMCell_0"] = lstm_cell("")
        params["OptimizedLSTMCell_1"] = lstm_cell("_reverse")
    elif rnn_type == "GRU":
        params["GRUCell_0"] = gru_cell("")
        params["GRUCell_1"] = gru_cell("_reverse")
    else:
        raise ValueError(f"unsupported rnn_type {rnn_type!r}")
    return {"params": jax.tree.map(jnp.asarray, params)}
