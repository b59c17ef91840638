"""CLIP R-precision: rank the true caption against 99 mismatched ones.

Parity target: the R-precision loop inside ``condGANTrainer.sampling``
(trainer.py:578-613): for each generated image, its CLIP image embedding is
cosine-ranked against the true caption's sentence embedding plus 99 captions
from other classes; R = fraction ranked first, reported as a 10x3000
bootstrap mean/std over 30,000 queries.

TPU-first redesign: the reference scores one image at a time with 100 host
round-trips each; here a whole batch of images ranks against its [B, 100]
candidate caption sets in one jitted einsum pass.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t2igan.models.clip import ClipWithRegionHead

Array = jnp.ndarray


def make_rank_fn(clip_model: ClipWithRegionHead, clip_variables, mesh=None):
    """Jitted: (images01 [B,S,S,3] in [-1,1] generator output resized to the
    CLIP input size, true ids/mask [B,W], mis ids/mask [B,99,W]) -> [B] bool
    hit flags.

    CLIP parameters enter the jitted function as an argument (bound via a
    thin wrapper) rather than a closure constant: closure constants are
    serialized into the HLO upload and exceed the axon remote-compile
    request limit for a full CLIP."""

    def run(clip_variables, images, ids_true, mask_true, ids_mis, mask_mis):
        b, n_mis, w = ids_mis.shape
        _, img_code = clip_model.apply(
            clip_variables, images,
            method=ClipWithRegionHead.encode_image_verbose)   # [B, D]
        _, sent_true = clip_model.apply(
            clip_variables, ids_true, mask_true,
            method=ClipWithRegionHead.encode_text_verbose)    # [B, D]
        _, sent_mis = clip_model.apply(
            clip_variables, ids_mis.reshape(b * n_mis, w),
            mask_mis.reshape(b * n_mis, w),
            method=ClipWithRegionHead.encode_text_verbose)
        sent_mis = sent_mis.reshape(b, n_mis, -1)
        cands = jnp.concatenate([sent_true[:, None, :], sent_mis], axis=1)
        img_n = img_code / jnp.clip(
            jnp.linalg.norm(img_code, axis=-1, keepdims=True), min=1e-8)
        cand_n = cands / jnp.clip(
            jnp.linalg.norm(cands, axis=-1, keepdims=True), min=1e-8)
        scores = jnp.einsum("bd,bnd->bn", img_n, cand_n)
        return jnp.argmax(scores, axis=-1) == 0

    if mesh is None:
        jitted = jax.jit(run)
    else:
        # Data-parallel ranking: CLIP weights replicated, every batch-leading
        # operand sharded over the mesh (reference analogue: the CLIP towers
        # are also DataParallel-wrapped in the eval sweep, trainer.py:255-265).
        from t2igan.parallel.mesh import batch_sharded, replicated

        rep, shard = replicated(mesh), batch_sharded(mesh)
        jitted = jax.jit(run,
                         in_shardings=(rep, shard, shard, shard, shard,
                                       shard),
                         out_shardings=shard)

    def bound(images, ids_true, mask_true, ids_mis, mask_mis):
        return jitted(clip_variables, images, ids_true, mask_true,
                      ids_mis, mask_mis)

    return bound


class MisCaptionBank:
    """Tokenized mis-caption pool for the 30k-query R-precision protocol.

    The reference draws 99 random other-class captions per image and
    BPE-tokenizes them on the spot (trainer.py:587-603, datasets.py:635-661)
    — ~3M host tokenizer calls per sweep.  Here every caption in the split is
    tokenized ONCE; per query, mis-captions are a numpy index gather from
    per-class complement pools, so the sweep's wall-clock is device-bound.

    Sampling is with replacement over the complement — the same distribution
    as the reference's rejection loop.
    """

    def __init__(self, dataset, tokenizer, words_num: int, seed: int = 100):
        caps, cls = dataset.caption_bank()
        out = tokenizer(caps, max_length=words_num)
        self.ids = np.asarray(out["input_ids"], np.int32)      # [N, W]
        self.mask = np.asarray(out["attention_mask"], np.int32)
        self.cls = np.asarray(cls, np.int64)                   # [N]
        self.words_num = words_num
        self._complement: dict = {}
        self._rng = np.random.default_rng(seed)

    def _comp(self, cls_id: int) -> np.ndarray:
        comp = self._complement.get(cls_id)
        if comp is None:
            comp = np.flatnonzero(self.cls != cls_id)
            self._complement[cls_id] = comp
        return comp

    def sample(self, class_ids, n_mis: int = 99):
        """(ids [B, n_mis, W], mask [B, n_mis, W]) of other-class captions."""
        rows = np.empty((len(class_ids), n_mis), np.int64)
        for i, cls in enumerate(class_ids):
            comp = self._comp(int(cls))
            if len(comp) == 0:
                raise ValueError(
                    f"no mis-captions available: every caption in the split "
                    f"belongs to class {int(cls)} (single-class split?); "
                    "R-precision needs at least one other-class caption")
            rows[i] = comp[self._rng.integers(0, len(comp), n_mis)]
        return self.ids[rows], self.mask[rows]


def bootstrap_r_precision(hits: np.ndarray, n_groups: int = 10,
                          group_size: int = 3000,
                          seed: int = 0) -> Tuple[float, float]:
    """Shuffle and average in n_groups chunks (trainer.py:605-613)."""
    r = np.asarray(hits, dtype=np.float64).copy()
    np.random.default_rng(seed).shuffle(r)
    n_groups = max(1, min(n_groups, r.size))
    total = n_groups * group_size
    if r.size < total:
        group_size = max(1, r.size // n_groups)
        total = n_groups * group_size
    means = r[:total].reshape(n_groups, group_size).mean(axis=1)
    return float(means.mean()), float(means.std())
