"""Tests for the native async data executor (t2igan/native/image_exec.cc).

The executor is the TPU-native analogue of the reference's torch DataLoader
worker processes (main.py:176-182): native file read + JPEG/PNG decode +
bbox crop + scale/crop/flip + CLIP-normalized pyramid on a C++ thread pool
with a ring of batch slots.  These tests pin:

* decode parity vs PIL (same libjpeg/libpng codecs underneath),
* pixel equality vs the sync native pyramid for the same plan,
* FIFO batch ordering, slot recycling and the per-sample error protocol,
* the 75%-padded CUB bbox crop (datasets.py:91-98) matching the Python
  implementation,
* the DataLoader 'native' engine producing the same set of batches as the
  thread engine does over an on-disk dataset.
"""

import os
import pickle

import numpy as np
import pytest

from t2igan import native
from t2igan.config import Config, cfg_replace
from t2igan.data.dataset import TextImageDataset, crop_to_bbox
from t2igan.data.pipeline import DataLoader
from t2igan.data.synthetic import SyntheticDataset
from t2igan.data.tokenizer import ClipTokenizer

pytestmark = pytest.mark.skipif(not native.exec_available(),
                                reason="native exec library unavailable")

CFG = cfg_replace(Config(), TREE={"BASE_SIZE": 16, "BRANCH_NUM": 3})


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = (rng.random((123, 89, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "a.png")
    Image.fromarray(img).save(d / "a.jpg", quality=95)
    big = (rng.random((200, 160, 3)) * 255).astype(np.uint8)
    Image.fromarray(big).save(d / "big.jpg", quality=92)
    gray = (rng.random((90, 110)) * 255).astype(np.uint8)
    Image.fromarray(gray, mode="L").save(d / "gray.jpg", quality=90)
    return d


def test_decode_png_exact(img_dir):
    from PIL import Image

    ref = np.asarray(Image.open(img_dir / "a.png").convert("RGB"))
    got = native.decode_image(str(img_dir / "a.png"))
    np.testing.assert_array_equal(got, ref)


def test_decode_jpeg_matches_pil(img_dir):
    from PIL import Image

    ref = np.asarray(Image.open(img_dir / "a.jpg").convert("RGB"))
    got = native.decode_image(str(img_dir / "a.jpg"))
    # PIL wraps the same libjpeg: decode should be bit-identical
    np.testing.assert_array_equal(got, ref)


def test_decode_grayscale_jpeg(img_dir):
    from PIL import Image

    ref = np.asarray(Image.open(img_dir / "gray.jpg").convert("RGB"))
    got = native.decode_image(str(img_dir / "gray.jpg"))
    # libjpeg's in-codec gray->RGB replicates the luma channel; PIL converts
    # after decode — identical result.
    np.testing.assert_array_equal(got, ref)


def _executor(branch_sizes=(16, 32, 64), scale=76, crop=64, batch=4,
              slots=2, threads=3):
    return native.AsyncExecutor(branch_sizes=list(branch_sizes),
                                scale_size=scale, crop=crop,
                                max_batch=batch, n_threads=threads,
                                n_slots=slots)


def test_exec_matches_sync_pyramid(img_dir):
    """Same plan through the executor and the sync native pyramid —
    bit-identical output (shared image_core.h math)."""
    ex = _executor()
    try:
        path = str(img_dir / "big.jpg")
        uv = np.asarray([[0.0, 0.0], [0.999, 0.999], [0.5, 0.25]],
                        np.float32)
        ex.submit(1, [path] * 3, None, uv, [False, True, False])
        bid, branches, errs = ex.wait()
        assert bid == 1 and not errs.any()
        rgb = native.decode_image(path)
        h, w = rgb.shape[:2]
        # replicate the fraction -> offset mapping (floor(u * (range + 1)))
        if w < h:
            nw, nh = 76, int(round(76 * h / w))
        else:
            nh, nw = 76, int(round(76 * w / h))
        for i, (u, v, flip) in enumerate([(0.0, 0.0, False),
                                          (0.999, 0.999, True),
                                          (0.5, 0.25, False)]):
            x0 = min(nw - 64, int(u * (nw - 64 + 1)))
            y0 = min(nh - 64, int(v * (nh - 64 + 1)))
            ref = native.pyramid(rgb, 76, 64, x0, y0, flip, [16, 32, 64])
            for b in range(3):
                np.testing.assert_array_equal(branches[b][i], ref[b])
        ex.release(bid)
    finally:
        ex.close()


def test_exec_bbox_crop_matches_python(img_dir):
    """The in-executor 75%-padded square bbox crop (datasets.py:91-98)
    matches crop_to_bbox + sync pyramid."""
    from PIL import Image

    ex = _executor()
    try:
        path = str(img_dir / "big.jpg")
        bbox = [30, 40, 60, 80]
        ex.submit(0, [path], [bbox], np.asarray([[0.25, 0.75]], np.float32),
                  [True])
        bid, branches, errs = ex.wait()
        assert not errs.any()
        img = Image.open(path).convert("RGB")
        cropped = np.asarray(crop_to_bbox(img, bbox))
        h, w = cropped.shape[:2]
        if w < h:
            nw, nh = 76, int(round(76 * h / w))
        else:
            nh, nw = 76, int(round(76 * w / h))
        x0 = min(nw - 64, int(0.25 * (nw - 64 + 1)))
        y0 = min(nh - 64, int(0.75 * (nh - 64 + 1)))
        ref = native.pyramid(cropped, 76, 64, x0, y0, True, [16, 32, 64])
        for b in range(3):
            np.testing.assert_array_equal(branches[b][0], ref[b])
        ex.release(bid)
    finally:
        ex.close()


def test_exec_fifo_order_and_slot_reuse(img_dir):
    """More batches than ring slots: wait() returns them in submission
    order and recycled slots carry no stale pixels."""
    ex = _executor(slots=2)
    try:
        path = str(img_dir / "a.jpg")
        seen = []
        submitted = 0
        uv = np.zeros((2, 2), np.float32)
        for bid in range(3):  # fills both slots, third waits for a release
            if submitted - len(seen) == 2:
                got, branches, errs = ex.wait()
                seen.append(got)
                first = branches[0].copy()
                ex.release(got)
            ex.submit(bid, [path] * 2, None, uv, [False, False])
            submitted += 1
        while len(seen) < 3:
            got, branches, errs = ex.wait()
            assert not errs.any()
            seen.append(got)
            ex.release(got)
        assert seen == [0, 1, 2]
    finally:
        ex.close()


def test_exec_error_protocol(img_dir):
    """Missing file -> EXEC_ERR_READ + zero-filled pixels; good samples in
    the same batch are unaffected."""
    ex = _executor()
    try:
        good = str(img_dir / "a.jpg")
        ex.submit(5, [good, str(img_dir / "nope.jpg")], None,
                  np.zeros((2, 2), np.float32), [False, False])
        bid, branches, errs = ex.wait()
        assert bid == 5
        assert errs[0] == 0 and errs[1] == native.EXEC_ERR_READ
        assert np.abs(branches[0][1]).max() == 0.0
        assert np.abs(branches[0][0]).max() > 0.0
        ex.release(bid)
    finally:
        ex.close()


def test_exec_rejects_corrupt_image(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8not really a jpeg")
    ex = _executor()
    try:
        ex.submit(0, [str(bad)], None, np.zeros((1, 2), np.float32), [False])
        _, _, errs = ex.wait()
        assert errs[0] == native.EXEC_ERR_DECODE
        ex.release(0)
    finally:
        ex.close()


@pytest.fixture
def disk_dataset(tmp_path):
    """On-disk COCO-layout dataset with real JPEGs."""
    from PIL import Image

    data_dir = tmp_path / "fake"
    (data_dir / "train").mkdir(parents=True)
    (data_dir / "train2014").mkdir()
    rng = np.random.default_rng(1)
    names, caps = [], []
    for i in range(6):
        img = (rng.random((100 + 7 * i, 90, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(data_dir / "train2014" / f"img_{i}.jpg",
                                  quality=95)
        names.append(f"img_{i}")
        caps += [f"bird number {i} first", f"bird number {i} second"]
    with open(data_dir / "captions.pickle", "wb") as f:
        pickle.dump([caps, []], f, protocol=2)
    with open(data_dir / "train" / "filenames.pickle", "wb") as f:
        pickle.dump(names, f, protocol=2)
    with open(data_dir / "train" / "class_info.pickle", "wb") as f:
        pickle.dump(list(range(6)), f, protocol=2)
    cfg = cfg_replace(CFG, DATA_DIR=str(data_dir),
                      TEXT={"CAPTIONS_PER_IMAGE": 2})
    return TextImageDataset(cfg, "train")


def test_loader_native_engine_end_to_end(disk_dataset):
    """engine='native' produces correctly shaped, finite, normalized batches
    covering the epoch, and is seed-reproducible."""
    tok = ClipTokenizer.fallback()

    def run():
        ds = disk_dataset
        ds.rng = np.random.default_rng(0)  # reset the plan rng
        loader = DataLoader(ds, tok, batch_size=2, words_num=16, seed=11,
                            num_workers=2, engine="native")
        return list(loader)

    batches = run()
    assert len(batches) == 3
    keys = [k for b in batches for k in b.keys]
    assert sorted(keys) == sorted(f"img_{i}" for i in range(6))
    for b in batches:
        assert [im.shape for im in b.images] == [
            (2, 16, 16, 3), (2, 32, 32, 3), (2, 64, 64, 3)]
        for im in b.images:
            assert np.isfinite(im).all()
            assert im.std() > 0.01  # CLIP-normalized real pixels, not zeros
        assert b.input_ids.shape == (2, 16)
    again = run()
    for b1, b2 in zip(batches, again):
        assert b1.keys == b2.keys
        for im1, im2 in zip(b1.images, b2.images):
            np.testing.assert_array_equal(im1, im2)
        np.testing.assert_array_equal(b1.input_ids, b2.input_ids)


def test_loader_auto_falls_back_without_plans():
    """SyntheticDataset has no plan_record: engine='auto' must use threads
    (and engine='native' must refuse loudly)."""
    ds = SyntheticDataset(CFG, size=8)
    tok = ClipTokenizer.fallback()
    loader = DataLoader(ds, tok, batch_size=4, words_num=16, engine="auto")
    assert not loader._native_usable()
    assert len(list(loader)) == 2
    strict = DataLoader(ds, tok, batch_size=4, words_num=16, engine="native")
    with pytest.raises(RuntimeError, match="plan_record"):
        list(strict)


def test_loader_native_reuses_executor_across_epochs(disk_dataset):
    """The executor (threads + slot buffers) is created once and drained —
    not destroyed — between epochs, including when the consumer abandons an
    epoch mid-way."""
    tok = ClipTokenizer.fallback()
    loader = DataLoader(disk_dataset, tok, batch_size=2, words_num=16,
                        num_workers=2, engine="native")
    it = iter(loader)
    next(it)  # leave two batches in flight, then abandon the epoch
    it.close()
    ex1 = loader._exec
    assert ex1 is not None and ex1.inflight() == 0
    assert len(list(loader)) == 3  # full second epoch on the same executor
    assert loader._exec is ex1
    loader.close()
    assert loader._exec is None


@pytest.mark.slow
def test_exec_stress_many_batches(img_dir):
    """Hammer the ring: hundreds of mixed-size batches with interleaved
    waits/releases and intentional failures — FIFO order and per-sample
    errors must hold throughout (this is the race-condition canary for the
    C++ executor)."""
    rng = np.random.default_rng(0)
    paths = [str(img_dir / n) for n in ("a.jpg", "big.jpg", "gray.jpg")]
    ex = _executor(batch=8, slots=3, threads=4)
    try:
        plans = {}
        next_id = 0
        waited = []

        def submit():
            nonlocal next_id
            n = int(rng.integers(1, 9))
            ps, bad = [], []
            for i in range(n):
                if rng.random() < 0.1:
                    ps.append(str(img_dir / "missing.jpg"))
                    bad.append(i)
                else:
                    ps.append(paths[int(rng.integers(0, len(paths)))])
            ex.submit(next_id, ps, None,
                      rng.random((n, 2)).astype(np.float32),
                      list(rng.random(n) < 0.5))
            plans[next_id] = (n, bad)
            next_id += 1

        for _ in range(3):
            submit()
        for _ in range(200):
            bid, branches, errs = ex.wait()
            n, bad = plans.pop(bid)
            waited.append(bid)
            assert branches[0].shape[0] == n
            assert sorted(np.nonzero(errs)[0].tolist()) == bad
            ok = [i for i in range(n) if i not in bad]
            if ok:
                assert np.abs(branches[-1][ok]).max() > 0
            ex.release(bid)
            submit()
        assert waited == sorted(waited)  # strict FIFO
    finally:
        ex.close()


def test_loader_rejects_unknown_engine():
    ds = SyntheticDataset(CFG, size=4)
    with pytest.raises(ValueError, match="engine"):
        DataLoader(ds, ClipTokenizer.fallback(), batch_size=2, words_num=16,
                   engine="warp")
