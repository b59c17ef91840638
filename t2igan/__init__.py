"""t2igan — a TPU-native text-to-image CLIP+DM-GAN framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch stack dgjun32/T2I_CLIP-GAN:

* CLIP ViT-B/32 text & image encoders with a trainable region-projection head
  (:mod:`t2igan.models.clip`),
* the cascaded DM-GAN generator with dynamic gated-memory word attention and
  three per-scale spectral-norm discriminators
  (:mod:`t2igan.models.generator`, :mod:`t2igan.models.discriminator`),
* DAMSM word-region attention + sentence losses, NT-Xent contrastive loss and
  the GAN loss set, fully vectorized for the MXU (:mod:`t2igan.losses`),
* data-parallel training over a ``jax.sharding.Mesh``
  (:mod:`t2igan.parallel`), jitted train steps (:mod:`t2igan.train`),
* evaluation: FID, Inception Score, CLIP R-precision
  (:mod:`t2igan.evaluation`).

Entry points mirror the reference CLIs (``pretrain_DAMSM.py``, ``main.py``,
``fid_score.py``, ``inception_score.py``) and accept the same YAML configs.
"""

from t2igan.config import Config, cfg_from_dict, cfg_from_file, cfg_replace

__version__ = "0.1.0"

__all__ = [
    "Config",
    "cfg_from_file",
    "cfg_from_dict",
    "cfg_replace",
    "__version__",
]
