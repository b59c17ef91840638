"""Typed configuration system for t2igan.

Reference parity: mirrors the key surface and validation semantics of the
reference's global config (``/root/reference/DMGAN+CLIP/code/miscc/config.py``):

* the same default values (config.py:13-78),
* YAML merge that rejects unknown keys (config.py:92) and mismatched types
  (config.py:100),
* the same 8 YAML files parse unchanged (cfg/*.yml, cfg/DAMSM/*.yml).

TPU-first redesign: instead of a process-global mutable ``easydict`` that every
module imports, configuration is an immutable dataclass tree passed explicitly.
This keeps jitted train steps pure (hyperparameters become Python-level
constants baked into the compiled program) and makes multi-config tests
possible in one process.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any, Mapping


def _frozen(cls):
    return dataclass(frozen=True)(cls)


@_frozen
class TreeConfig:
    BRANCH_NUM: int = 3
    BASE_SIZE: int = 64


@_frozen
class SmoothConfig:
    GAMMA1: float = 5.0
    GAMMA2: float = 5.0
    GAMMA3: float = 10.0
    LAMBDA: float = 1.0


@_frozen
class TrainConfig:
    TRAIN_CLIP_MODEL: bool = False
    DEVICE: str = "cuda:0"  # accepted for YAML parity; ignored on TPU
    CLIP_MODEL_CHECKPOINT: str = "output/pretrained/clip350.pth"
    CLIP_MODEL_BASE: str = "openai/clip-vit-base-patch32"

    BATCH_SIZE: int = 64
    MAX_EPOCH: int = 600
    SNAPSHOT_INTERVAL: int = 2000
    DISCRIMINATOR_LR: float = 2e-4
    GENERATOR_LR: float = 2e-4
    CLIP_LR: float = 1e-5

    BACKBONE_LR: float = 2e-5
    LINEAR_LR: float = 2e-3
    RNN_GRAD_CLIP: float = 0.25
    STEP_SIZE_UP: int = 300
    GAMMA: float = 0.8
    BASE_LR: float = 1e-7

    FLAG: bool = True
    NET_G: str = ""
    NET_E: str = ""
    B_NET_D: bool = True

    # TPU addition (not part of the reference YAML surface): cap on DAMSM
    # validation batches per epoch for smoke runs.  0 = the full validation
    # split, matching the reference's evaluate() (pretrain_DAMSM.py:273-344).
    EVAL_MAX_BATCHES: int = 0

    SMOOTH: SmoothConfig = field(default_factory=SmoothConfig)


@_frozen
class GanConfig:
    DF_DIM: int = 64
    GF_DIM: int = 128
    Z_DIM: int = 100
    CONDITION_DIM: int = 512
    R_NUM: int = 2
    B_ATTENTION: bool = True
    B_DCGAN: bool = False
    # TPU additions (not part of the reference YAML surface; defaults keep
    # the reference YAMLs parsing unchanged).  UPBLOCK selects the
    # output-equivalent computation of upsample+conv in the generator —
    # "dilated" (fastest on TPU), "naive", "subpixel"; see
    # models/generator.py::UpBlock.  The T2IGAN_UPBLOCK env var remains as
    # an explicit A/B override only.
    UPBLOCK: str = "dilated"
    # Fuse each refinement stage's eval-mode tail (ResBlock x R_NUM +
    # upsample-conv) into one Pallas pass (ops/pallas/reschain.py).
    # T2IGAN_RESCHAIN=0/1 is the env A/B override.  OFF by default: the
    # first on-chip schedule measured SLOWER than XLA's conv chain
    # (644 vs 1368 imgs/sec gen+eval) — see docs/PERFORMANCE.md round 3.
    FUSED_TAIL: bool = False
    # Compute the FINAL stage's eval tail (upsample-conv + BN + GLU + RGB
    # head + tanh) in 2x2 subpixel phase space — two folded 2x2 convs at
    # LOW resolution (ops/image.py::up2x_bn_glu_rgb_phased): 1/4 the MXU
    # FLOPs of the dilated upconv (which the round-4 trace shows XLA runs
    # dense) and no 2x-resolution feature tensor in HBM.  ON by default:
    # measured +14.2% gen+eval (1641 vs 1437.5 imgs/sec) and +15.9%
    # gen-only (2011.7 vs 1735.2) at batch 128 bf16 on the v5e chip; the
    # stage-3 upconv fell 21.0 -> 6.4 ms/batch (docs/PERFORMANCE.md round
    # 4).  Training always uses the module chain (BN batch statistics).
    # T2IGAN_PHASED_TAIL=0/1 is the env A/B override.
    PHASED_TAIL: bool = True
    # TRAIN-mode counterpart of PHASED_TAIL: the final stage's training
    # tail (upconv + batch-stat BN + GLU + RGB head) in 2x2 subpixel phase
    # space — 1/4 the upconv/RGB conv FLOPs in the forward AND both
    # gradients, and the [B, 2H, 2W, 2F] feature tensor (plus the
    # activation `reverse` passes of its dilated input gradient) never
    # exists in HBM.  Batch statistics are computed halo-masked in phase
    # space (ops/image.py::phase_batch_stats) and running stats update
    # identically to the module chain.  ON by default: measured 80.91 vs
    # 83.11 ms/step (+2.7% by device trace span, b16 bf16, queue r5a; the
    # 256^2-family on-op time fell 22.9 -> 2.3 ms/step).
    # T2IGAN_PHASED_TAIL_TRAIN=0/1 is the env A/B override.
    PHASED_TAIL_TRAIN: bool = True


@_frozen
class TextConfig:
    CAPTIONS_PER_IMAGE: int = 10
    EMBEDDING_DIM: int = 512
    WORDS_NUM: int = 77


@_frozen
class Config:
    DATASET_NAME: str = "birds"
    CONFIG_NAME: str = ""
    DATA_DIR: str = ""
    GPU_ID: int = 0
    CUDA: bool = True  # accepted for YAML parity; ignored on TPU
    WORKERS: int = 6
    B_VALIDATION: bool = False
    # Input-pipeline engine: "auto" uses the native C++ async executor
    # (t2igan/native/image_exec.cc: decode + transform thread pool with a
    # prefetch ring) when it is buildable and the dataset reads image files,
    # falling back to the Python thread-pool loader; "thread" forces the
    # Python path; "native" requires the executor (raises if unavailable).
    DATA_ENGINE: str = "auto"

    TREE: TreeConfig = field(default_factory=TreeConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    GAN: GanConfig = field(default_factory=GanConfig)
    TEXT: TextConfig = field(default_factory=TextConfig)

    # ---- derived helpers (not part of the YAML surface) ----

    @property
    def branch_sizes(self) -> tuple:
        """Image pyramid sizes, e.g. (64, 128, 256) for BASE_SIZE=64, 3 branches."""
        return tuple(self.TREE.BASE_SIZE * (2 ** i) for i in range(self.TREE.BRANCH_NUM))

    @property
    def final_size(self) -> int:
        return self.TREE.BASE_SIZE * (2 ** (self.TREE.BRANCH_NUM - 1))


_NUMERIC = (int, float)


def _merge_into(cls: type, defaults: Any, overrides: Mapping[str, Any], path: str = ""):
    """Merge a YAML mapping into a dataclass, with reference-equal validation.

    Matches the semantics of the reference ``_merge_a_into_b``
    (miscc/config.py:81-112): unknown keys raise ``KeyError``; a type mismatch
    raises ``ValueError``.  One deliberate relaxation: an ``int`` provided for
    a ``float`` default is accepted (YAML ``5`` vs ``5.0``), since the
    reference YAMLs always spell floats explicitly and the strictness there
    guarded typos, not numeric towers.
    """
    valid = {f.name: f for f in fields(cls)}
    kwargs = {}
    for key, value in overrides.items():
        if key not in valid:
            raise KeyError("{} is not a valid config key".format(path + key))
        default_val = getattr(defaults, key)
        if dataclasses.is_dataclass(default_val):
            if not isinstance(value, Mapping):
                raise ValueError(
                    "Type mismatch ({} vs. {}) for config key: {}".format(
                        type(default_val), type(value), path + key))
            kwargs[key] = _merge_into(type(default_val), default_val, value,
                                      path + key + ".")
        else:
            if type(default_val) is not type(value):
                ok = (isinstance(default_val, float) and isinstance(value, int)
                      and not isinstance(value, bool))
                if ok:
                    value = float(value)
                else:
                    raise ValueError(
                        "Type mismatch ({} vs. {}) for config key: {}".format(
                            type(default_val), type(value), path + key))
            kwargs[key] = value
    return dataclasses.replace(defaults, **kwargs)


def cfg_from_file(filename: str, base: Config | None = None) -> Config:
    """Load a YAML config file and merge it over the defaults.

    Accepts the reference's YAML files unchanged (same key surface as
    miscc/config.py ``cfg_from_file``, :115-121) but returns an immutable
    :class:`Config` instead of mutating a global.
    """
    import yaml

    with open(filename, "r") as f:
        yaml_cfg = yaml.safe_load(f) or {}
    return cfg_from_dict(yaml_cfg, base=base)


def cfg_from_dict(d: Mapping[str, Any], base: Config | None = None) -> Config:
    base = base if base is not None else Config()
    return _merge_into(Config, base, d)


def cfg_replace(cfg: Config, **updates) -> Config:
    """Functional update helper: ``cfg_replace(cfg, TRAIN=dict(BATCH_SIZE=8))``."""
    return _merge_into(Config, cfg, updates)
