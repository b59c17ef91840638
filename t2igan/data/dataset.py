"""Dataset index for CUB-200-2011 / COCO2014 text-image pairs.

Parity target: the reference ``TextDataset`` (datasets.py:395-666):

* ``filenames.pickle`` per split, ``captions.pickle`` with the legacy
  word-index vocabulary (ixtoword/wordtoix), ``class_info.pickle``
  (datasets.py:530-570);
* CUB bounding boxes from ``CUB_200_2011/bounding_boxes.txt`` +
  ``images.txt`` (datasets.py:431-454), cropped to a 75%-padded square
  around the box center (datasets.py:91-98);
* two random captions per image per sample (datasets.py:619-627) —
  captions are detokenized from the legacy vocab back to text and CLIP-BPE
  tokenized downstream (datasets.py:582-595);
* ``get_mis_caption``: 99 random captions from other classes, for
  R-precision (datasets.py:635-661).

TPU-first notes: this module is pure host-side indexing + PIL decode; all
tensor math happens on device.  Unlike the reference there is no
caption-length sorting — fixed-shape batches carry attention masks instead.
Caption files may also be plain text lists (no legacy vocab), which is what
a freshly preprocessed dataset produces.
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from t2igan.config import Config
from t2igan.ops.image import CLIP_MEAN, CLIP_STD


@dataclass
class Record:
    """One sample: a decoded multi-scale image pyramid + two captions."""

    images: List[np.ndarray]        # per-branch [s, s, 3] float32, normalized
    caption: str
    caption_2: str
    class_id: int
    key: str


@dataclass
class ExecPlan:
    """Plan for one sample of the native async executor
    (t2igan/native/image_exec.cc): everything but the pixels.  The executor
    derives the crop window from the fractions (``x0 = floor(u * (nw - crop
    + 1))``) after it knows the decoded/bbox-cropped dimensions, so the
    dataset rng never needs the image on the Python side."""

    path: str
    bbox: Optional[List[int]]       # CUB [x, y, w, h] or None
    u: float                        # crop fractions in [0, 1)
    v: float
    flip: bool
    caption: str
    caption_2: str
    class_id: int
    key: str


def _load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def load_bbox_table(data_dir: str) -> Dict[str, List[int]]:
    """CUB bbox table (datasets.py:431-454) without the pandas dependency."""
    boxes_path = os.path.join(data_dir, "CUB_200_2011", "bounding_boxes.txt")
    images_path = os.path.join(data_dir, "CUB_200_2011", "images.txt")
    with open(images_path) as f:
        names = [line.split()[1] for line in f if line.strip()]
    table = {}
    with open(boxes_path) as f:
        for i, line in enumerate(f):
            parts = line.split()
            if not parts:
                continue
            table[names[i][:-4]] = [int(float(x)) for x in parts[1:5]]
    return table


def crop_to_bbox(img, bbox):
    """75%-padded square crop around the bbox center (datasets.py:91-98).
    img: PIL Image; bbox: [x, y, w, h]."""
    width, height = img.size
    r = int(np.maximum(bbox[2], bbox[3]) * 0.75)
    cx = int((2 * bbox[0] + bbox[2]) / 2)
    cy = int((2 * bbox[1] + bbox[3]) / 2)
    y1, y2 = max(0, cy - r), min(height, cy + r)
    x1, x2 = max(0, cx - r), min(width, cx + r)
    return img.crop([x1, y1, x2, y2])


class ImageTransform:
    """Scale(76/64 * imsize) -> RandomCrop(imsize) -> RandomHFlip
    (main.py:163-166 / pretrain_DAMSM.py:417-420)."""

    def __init__(self, imsize: int):
        self.imsize = imsize
        self.scale = int(imsize * 76 / 64)

    def scaled_dims(self, w: int, h: int):
        """torchvision Scale semantics: shorter side -> scale."""
        if w < h:
            return self.scale, int(round(self.scale * h / w))
        return int(round(self.scale * w / h)), self.scale

    def plan(self, w: int, h: int, rng: np.random.Generator):
        """Draw the random crop/flip decisions up front so the transform can
        be executed by either the PIL or the native C++ backend."""
        nw, nh = self.scaled_dims(w, h)
        x0 = int(rng.integers(0, nw - self.imsize + 1))
        y0 = int(rng.integers(0, nh - self.imsize + 1))
        flip = bool(rng.random() < 0.5)
        return nw, nh, x0, y0, flip

    def __call__(self, img, rng: np.random.Generator):
        from PIL import Image

        w, h = img.size
        nw, nh, x0, y0, flip = self.plan(w, h, rng)
        img = img.resize((nw, nh), Image.BILINEAR)
        img = img.crop((x0, y0, x0 + self.imsize, y0 + self.imsize))
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


def normalize_clip(img_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC -> CLIP-normalized float32 (datasets.py:403-406)."""
    x = img_u8.astype(np.float32) / 255.0
    return (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(
        CLIP_STD, np.float32)


def build_pyramid(img, sizes: Sequence[int]) -> List[np.ndarray]:
    """Per-branch resizes, finest = the transform output (datasets.py:103-115)."""
    from PIL import Image

    out = []
    for i, s in enumerate(sizes):
        im = img if i == len(sizes) - 1 else img.resize((s, s), Image.BILINEAR)
        out.append(normalize_clip(np.asarray(im, dtype=np.uint8)))
    return out


class TextImageDataset:
    """Host-side dataset over the reference's on-disk layout."""

    def __init__(self, cfg: Config, split: str = "train",
                 seed: int = 0):
        self.cfg = cfg
        self.split = split
        self.data_dir = cfg.DATA_DIR
        self.embeddings_num = cfg.TEXT.CAPTIONS_PER_IMAGE
        self.sizes = cfg.branch_sizes
        self.transform = ImageTransform(cfg.final_size)
        self.rng = np.random.default_rng(seed)

        self.bbox = (load_bbox_table(self.data_dir)
                     if "birds" in self.data_dir else None)
        self.filenames = self._load_filenames(split)
        self.captions, self.ixtoword = self._load_captions(split)
        self.class_id = self._load_class_id(
            os.path.join(self.data_dir, split), len(self.filenames))
        self.number_example = len(self.filenames)

    # ---- index loading ----

    def _load_filenames(self, split):
        path = os.path.join(self.data_dir, split, "filenames.pickle")
        if os.path.isfile(path):
            return _load_pickle(path)
        return []

    def _load_captions(self, split):
        """captions.pickle: [train, test, (ixtoword, wordtoix)?]
        (datasets.py:530-551).  Caption entries may be legacy word-index
        lists (detokenized through ixtoword, datasets.py:588-591) or plain
        strings."""
        path = os.path.join(self.data_dir, "captions.pickle")
        if not os.path.isfile(path):
            return [], None
        x = _load_pickle(path)
        caps = x[0] if split == "train" else x[1]
        ixtoword = x[2] if len(x) > 2 else None
        return caps, ixtoword

    def _load_class_id(self, split_dir, total):
        path = os.path.join(split_dir, "class_info.pickle")
        if os.path.isfile(path):
            return np.asarray(_load_pickle(path))
        return np.arange(total)

    # ---- sampling ----

    def caption_text(self, sent_ix: int) -> str:
        cap = self.captions[sent_ix]
        if isinstance(cap, str):
            return cap
        if self.ixtoword is not None:
            return " ".join(self.ixtoword[int(w)] for w in cap)
        return " ".join(str(w) for w in cap)

    def _random_caption(self, index: int) -> str:
        sent_ix = int(self.rng.integers(0, self.embeddings_num))
        return self.caption_text(index * self.embeddings_num + sent_ix)

    def image_path(self, key: str) -> str:
        d = self.data_dir
        if self.bbox is not None:
            return os.path.join(d, "CUB_200_2011", "images", key + ".jpg")
        if d.endswith("birds"):
            return os.path.join(d, "CUB_200_2011", "images", key + ".jpg")
        sub = "train2014" if self.split == "train" else "val2014"
        return os.path.join(d, sub, key + ".jpg")

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, index: int) -> Record:
        from PIL import Image

        key = self.filenames[index]
        img = Image.open(self.image_path(key)).convert("RGB")
        if self.bbox is not None:
            img = crop_to_bbox(img, self.bbox[key])
        images = self._pyramid(img)
        return Record(images=images,
                      caption=self._random_caption(index),
                      caption_2=self._random_caption(index),
                      class_id=int(self.class_id[index]),
                      key=key)

    def plan_record(self, index: int) -> ExecPlan:
        """Sample plan for the native async executor — consumes the dataset
        rng in a fixed order (crop u, crop v, flip, two caption draws) but
        never decodes pixels on the Python side.  The augmentation stream
        differs from ``__getitem__``'s (fractions vs integer draws) but is
        equally seeded-reproducible; distributionally the transforms match
        (datasets.py:86-115 semantics either way)."""
        key = self.filenames[index]
        u = float(self.rng.random())
        v = float(self.rng.random())
        flip = bool(self.rng.random() < 0.5)
        bbox = None
        if self.bbox is not None:
            bbox = [int(x) for x in self.bbox[key]]
        return ExecPlan(path=self.image_path(key), bbox=bbox, u=u, v=v,
                        flip=flip,
                        caption=self._random_caption(index),
                        caption_2=self._random_caption(index),
                        class_id=int(self.class_id[index]), key=key)

    def exec_fallback(self, plan: ExecPlan) -> List[np.ndarray]:
        """PIL decode + transform for a sample the native executor could not
        handle (exotic format, e.g. CMYK JPEG) — same plan, same output."""
        from PIL import Image

        img = Image.open(plan.path).convert("RGB")
        if plan.bbox is not None:
            img = crop_to_bbox(img, plan.bbox)
        nw, nh = self.transform.scaled_dims(*img.size)
        crop = self.transform.imsize
        x0 = min(max(0, nw - crop), int(plan.u * (max(0, nw - crop) + 1)))
        y0 = min(max(0, nh - crop), int(plan.v * (max(0, nh - crop) + 1)))
        return self._pyramid(img, plan=(nw, nh, x0, y0, plan.flip))

    def deterministic_record(self, index: int) -> Record:
        """RNG-free sample for probe/snapshot batches: fixed caption choice
        (first two captions of the image), center crop, no flip.  Unlike
        ``__getitem__`` this never touches ``self.rng``, so probing (e.g.
        ``DataLoader.peek`` at snapshot cadence) cannot shift subsequent
        training augmentation or caption draws."""
        from PIL import Image

        key = self.filenames[index]
        img = Image.open(self.image_path(key)).convert("RGB")
        if self.bbox is not None:
            img = crop_to_bbox(img, self.bbox[key])
        nw, nh = self.transform.scaled_dims(*img.size)
        plan = (nw, nh, (nw - self.transform.imsize) // 2,
                (nh - self.transform.imsize) // 2, False)
        base = index * self.embeddings_num
        cap2_ix = base + min(1, self.embeddings_num - 1)
        return Record(images=self._pyramid(img, plan=plan),
                      caption=self.caption_text(base),
                      caption_2=self.caption_text(cap2_ix),
                      class_id=int(self.class_id[index]),
                      key=key)

    def _pyramid(self, img, plan=None) -> List[np.ndarray]:
        """Augment + multi-scale pyramid; native C++ backend when built,
        PIL otherwise (same transform plan either way).  ``plan`` overrides
        the random crop/flip draw (used by :meth:`deterministic_record`)."""
        from t2igan import native

        w, h = img.size
        nw, nh, x0, y0, flip = (self.transform.plan(w, h, self.rng)
                                if plan is None else plan)
        if native.available():
            return native.pyramid(np.asarray(img, np.uint8),
                                  self.transform.scale, self.transform.imsize,
                                  x0, y0, flip, self.sizes)
        from PIL import Image as PILImage

        img = img.resize((nw, nh), PILImage.BILINEAR)
        img = img.crop((x0, y0, x0 + self.transform.imsize,
                        y0 + self.transform.imsize))
        if flip:
            img = img.transpose(PILImage.FLIP_LEFT_RIGHT)
        return build_pyramid(img, self.sizes)

    def mis_captions(self, cls_id: int, n: int = 99) -> List[str]:
        """n captions from other classes (datasets.py:635-661)."""
        out = []
        while len(out) < n:
            idx = int(self.rng.integers(0, self.number_example))
            if self.class_id[idx] == cls_id:
                continue
            out.append(self._random_caption(idx))
        return out

    def caption_bank(self):
        """Every caption in the split with its class id, for building the
        tokenized mis-caption pool once (the R-precision sweep otherwise
        re-tokenizes B×99 captions per batch; trainer.py:578-613 protocol
        draws random other-class captions, which this bank reproduces by
        index sampling instead of host BPE calls).

        Returns (captions: List[str], caption_class: np.ndarray [N])."""
        n_caps = len(self.captions)
        expected = len(self.filenames) * self.embeddings_num
        if n_caps != expected:
            raise ValueError(
                f"captions.pickle carries {n_caps} captions for "
                f"{len(self.filenames)} filenames x {self.embeddings_num} "
                f"captions/image (expected {expected}); the i//"
                "embeddings_num class lookup would misalign classes")
        caps = [self.caption_text(i) for i in range(n_caps)]
        cls = np.asarray([int(self.class_id[i // self.embeddings_num])
                          for i in range(n_caps)], np.int64)
        return caps, cls
