"""Synthetic dataset with the same record interface as TextImageDataset.

Used by tests, benchmarks and smoke-training in environments without
CUB/COCO on disk.  Deterministic per (seed, index)."""

from __future__ import annotations

from typing import List

import numpy as np

from t2igan.config import Config
from t2igan.data.dataset import Record

_COLORS = ["red", "blue", "yellow", "green", "black", "white"]
_PARTS = ["wings", "beak", "crown", "tail", "breast", "belly"]


class SyntheticDataset:
    def __init__(self, cfg: Config, size: int = 64, n_classes: int = 8,
                 seed: int = 0):
        self.cfg = cfg
        self.sizes = cfg.branch_sizes
        self.n = size
        self.n_classes = n_classes
        self.seed = seed
        self.class_id = np.arange(size) % n_classes
        self.number_example = size
        self.embeddings_num = cfg.TEXT.CAPTIONS_PER_IMAGE
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.n

    def _caption(self, rng) -> str:
        c1, c2 = rng.choice(_COLORS, 2, replace=True)
        p1, p2 = rng.choice(_PARTS, 2, replace=False)
        return f"a bird with {c1} {p1} and {c2} {p2}"

    def __getitem__(self, index: int) -> Record:
        rng = np.random.default_rng((self.seed, index))
        images: List[np.ndarray] = [
            rng.standard_normal((s, s, 3)).astype(np.float32) * 0.5
            for s in self.sizes
        ]
        return Record(images=images,
                      caption=self._caption(rng),
                      caption_2=self._caption(rng),
                      class_id=int(self.class_id[index]),
                      key=f"synthetic/{index:06d}")

    def mis_captions(self, cls_id: int, n: int = 99):
        out = []
        while len(out) < n:
            idx = int(self.rng.integers(0, self.n))
            if self.class_id[idx] == cls_id:
                continue
            rng = np.random.default_rng((self.seed, idx, 1))
            out.append(self._caption(rng))
        return out

    def caption_bank(self):
        """One caption per sample with its class id (same draw as
        ``mis_captions``), for the tokenized mis-caption pool."""
        caps = [self._caption(np.random.default_rng((self.seed, i, 1)))
                for i in range(self.n)]
        return caps, self.class_id.astype(np.int64)
