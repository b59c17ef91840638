"""Data pipeline tests: collate shapes/dtypes/normalization, loader
determinism, bbox crop math, and reference-format pickle loading."""

import os
import pickle

import numpy as np
import pytest

from t2igan.config import Config, cfg_replace
from t2igan.data.dataset import (TextImageDataset, build_pyramid,
                                 crop_to_bbox, normalize_clip)
from t2igan.data.pipeline import Batch, DataLoader, collate
from t2igan.data.synthetic import SyntheticDataset
from t2igan.data.tokenizer import ClipTokenizer
from t2igan.ops.image import CLIP_MEAN, CLIP_STD

CFG = cfg_replace(Config(), TRAIN={"BATCH_SIZE": 4},
                  TREE={"BASE_SIZE": 16, "BRANCH_NUM": 3})


@pytest.fixture
def loader():
    ds = SyntheticDataset(CFG, size=12)
    tok = ClipTokenizer.fallback()
    return DataLoader(ds, tok, batch_size=4, words_num=30, seed=7)


def test_collate_shapes_and_dtypes(loader):
    batch = next(iter(loader))
    assert isinstance(batch, Batch)
    assert [im.shape for im in batch.images] == [
        (4, 16, 16, 3), (4, 32, 32, 3), (4, 64, 64, 3)]
    assert all(im.dtype == np.float32 for im in batch.images)
    assert batch.input_ids.shape == (4, 30)
    assert batch.attention_mask.shape == (4, 30)
    assert batch.input_ids_2.shape == (4, 30)
    assert batch.class_ids.dtype == np.int32
    assert len(batch.keys) == 4


def test_loader_length_drop_last(loader):
    assert len(loader) == 3  # 12 / 4


def test_loader_yields_all_batches(loader):
    batches = list(iter(loader))
    assert len(batches) == 3
    keys = [k for b in batches for k in b.keys]
    assert len(set(keys)) == 12


def test_two_caption_views_differ_sometimes(loader):
    batch = next(iter(loader))
    assert not np.array_equal(batch.input_ids, batch.input_ids_2)


def test_normalize_clip_stats():
    img = np.full((8, 8, 3), 255, np.uint8)
    x = normalize_clip(img)
    expected = (1.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(x[0, 0], expected, rtol=1e-5)


def test_crop_to_bbox_square_padding():
    from PIL import Image
    img = Image.new("RGB", (200, 150))
    # bbox [x, y, w, h]: crop is a 75%-padded square around the center
    out = crop_to_bbox(img, [50, 40, 40, 60])
    r = int(60 * 0.75)  # 45
    cx, cy = (2 * 50 + 40) // 2, (2 * 40 + 60) // 2  # 70, 70
    assert out.size == (min(200, cx + r) - max(0, cx - r),
                        min(150, cy + r) - max(0, cy - r))


def test_build_pyramid_sizes():
    from PIL import Image
    img = Image.new("RGB", (64, 64))
    pyr = build_pyramid(img, (16, 32, 64))
    assert [p.shape for p in pyr] == [(16, 16, 3), (32, 32, 3), (64, 64, 3)]


def test_text_dataset_reads_reference_pickles(tmp_path):
    """Exercise the captions.pickle legacy format (datasets.py:530-551):
    word-index lists + ixtoword vocabulary, filenames + class_info pickles."""
    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    ixtoword = {0: "<end>", 1: "red", 2: "bird", 3: "blue", 4: "wing"}
    train_caps = [[1, 2], [3, 4], [1, 4], [3, 2]]  # 2 images x 2 caps
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([train_caps, [], ixtoword, {}], f, protocol=2)
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(["img_a", "img_b"], f, protocol=2)
    with open(data_dir / "train" / "class_info.pickle", "wb") as f:
        pickle.dump([5, 9], f, protocol=2)

    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    ds = TextImageDataset(cfg, "train")
    assert len(ds) == 2
    assert ds.caption_text(0) == "red bird"
    assert ds.caption_text(1) == "blue wing"
    assert list(ds.class_id) == [5, 9]
    mis = ds.mis_captions(5, n=3)
    assert len(mis) == 3
    assert all(m in ("red bird", "blue wing", "red wing", "blue bird")
               for m in mis)


def test_prefetch_to_device_preserves_order(loader):
    from t2igan.data.pipeline import prefetch_to_device

    direct = [b.keys for b in iter(loader)]
    loader.epoch = 0  # reset shuffle epoch for identical order
    prefetched = [b.keys for b in prefetch_to_device(loader, lambda b: b)]
    assert prefetched == direct


def test_clip_token_dataset(tmp_path):
    """ClipTokenDataset yields pre-tokenized fixed-width records
    (datasets.py:119-392 semantics)."""
    import pickle

    from t2igan.data.clip_dataset import ClipTokenDataset
    from t2igan.data.tokenizer import ClipTokenizer

    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([["a red bird", "a blue bird",
                      "small bird with long tail", "bird"], []], f,
                    protocol=2)
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(["img_a", "img_b"], f, protocol=2)

    from t2igan.config import cfg_replace
    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2, "WORDS_NUM": 12})
    ds = ClipTokenDataset.__new__(ClipTokenDataset)
    # initialize without image loading by reusing the parent init pieces
    from t2igan.data.dataset import TextImageDataset
    TextImageDataset.__init__(ds, cfg, "train")
    ds.tokenizer = ClipTokenizer.fallback()
    ds.words_num = 12

    ids, mask, n = ds._tokenized(0)
    assert ids.shape == (12,) and mask.shape == (12,)
    assert mask.sum() == n and n <= 12
    assert ids[0] == ds.tokenizer.bos_id
    # long caption triggers ordered subsampling
    ids2, mask2, n2 = ds._tokenized(2)
    assert n2 == 12 and mask2.sum() == 12


def test_multihost_sharding_partitions_data():
    """Each host sees a disjoint slice; together they cover the epoch."""
    ds = SyntheticDataset(CFG, size=24)
    tok = ClipTokenizer.fallback()
    keys = []
    for host in range(3):
        loader = DataLoader(ds, tok, batch_size=4, words_num=16,
                            shuffle=True, seed=5, host_index=host,
                            host_count=3)
        assert len(loader) == 2  # 24 / 3 hosts / batch 4
        for b in loader:
            keys.extend(b.keys)
    assert len(keys) == 24
    assert len(set(keys)) == 24


def test_peek_is_deterministic_and_side_effect_free(loader):
    """peek() must not consume loader state: the epoch shuffle order seen by
    iteration is identical whether or not probe batches were taken."""
    probe1 = loader.peek()
    probe2 = loader.peek()
    assert probe1.keys == probe2.keys
    np.testing.assert_array_equal(probe1.input_ids, probe2.input_ids)
    # record the first two epochs' batch orders with peeks interleaved
    order_a = [b.keys for b in loader] + [b.keys for b in loader]
    fresh = DataLoader(loader.dataset, loader.tokenizer, batch_size=4,
                       words_num=30, seed=7)
    loader.peek()
    order_b = [b.keys for b in fresh] + [b.keys for b in fresh]
    assert order_a == order_b
    # probe batch is dataset-order, independent of shuffle seed
    assert probe1.keys == [loader.dataset[i].key for i in range(4)]


def test_peek_does_not_touch_dataset_rng(tmp_path):
    """TextImageDataset.__getitem__ consumes the shared dataset rng (caption
    pick + crop/flip plan), so peek() must route through the rng-free
    deterministic_record path: dataset.rng state must be bit-identical
    before and after, and repeated peeks must return identical captions."""
    from PIL import Image

    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    (data_dir / "train2014").mkdir()
    for i in range(2):
        Image.new("RGB", (80, 70), (10 * i, 20, 30)).save(
            data_dir / "train2014" / f"img_{i}.jpg")
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([["a red bird", "a blue bird",
                      "green wings", "long tail"], []], f, protocol=2)
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(["img_0", "img_1"], f, protocol=2)
    with open(data_dir / "train" / "class_info.pickle", "wb") as f:
        pickle.dump([1, 2], f, protocol=2)

    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    ds = TextImageDataset(cfg, "train")
    loader = DataLoader(ds, ClipTokenizer.fallback(), batch_size=2,
                        words_num=16, seed=3)
    state_before = ds.rng.bit_generator.state
    p1 = loader.peek()
    p2 = loader.peek()
    assert ds.rng.bit_generator.state == state_before
    np.testing.assert_array_equal(p1.input_ids, p2.input_ids)
    np.testing.assert_array_equal(p1.input_ids_2, p2.input_ids_2)
    for a, b in zip(p1.images, p2.images):
        np.testing.assert_array_equal(a, b)
    # fixed caption choice: first two captions of each image
    rec = ds.deterministic_record(0)
    assert (rec.caption, rec.caption_2) == ("a red bird", "a blue bird")


def test_caption_bank_size_mismatch_raises(tmp_path):
    """A captions.pickle whose caption count disagrees with
    len(filenames) * CAPTIONS_PER_IMAGE would silently misalign the
    i // embeddings_num class lookup — caption_bank must refuse."""
    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([["a", "b", "c"], []], f, protocol=2)  # 3 caps, 2x2 expected
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(["img_0", "img_1"], f, protocol=2)
    with open(data_dir / "train" / "class_info.pickle", "wb") as f:
        pickle.dump([1, 2], f, protocol=2)
    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    ds = TextImageDataset(cfg, "train")
    with pytest.raises(ValueError, match="misalign"):
        ds.caption_bank()


def test_caption_bank_classes_align():
    ds = SyntheticDataset(CFG, size=12)
    caps, cls = ds.caption_bank()
    assert len(caps) == 12 and cls.shape == (12,)
    np.testing.assert_array_equal(cls, ds.class_id)
    assert all(isinstance(c, str) and c for c in caps)


def test_text_dataset_caption_bank(tmp_path):
    """caption_bank over the reference pickle layout: one entry per caption,
    class repeated embeddings_num times."""
    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    caps_train = [["a", "small", "bird"], ["bright", "red", "wings"],
                  ["a", "blue", "bird"], ["long", "tail"]]
    ixtoword = {}
    wordtoix = {}
    for c in caps_train:
        for w in c:
            if w not in wordtoix:
                wordtoix[w] = len(wordtoix)
                ixtoword[wordtoix[w]] = w
    enc = [[wordtoix[w] for w in c] for c in caps_train]
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([enc, enc, ixtoword, wordtoix], f)
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(["img0", "img1"], f)
    with open(data_dir / "train" / "class_info.pickle", "wb") as f:
        pickle.dump([3, 5], f)
    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    ds = TextImageDataset(cfg, "train")
    caps, cls = ds.caption_bank()
    assert caps == ["a small bird", "bright red wings",
                    "a blue bird", "long tail"]
    np.testing.assert_array_equal(cls, [3, 3, 5, 5])
