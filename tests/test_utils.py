"""Utility tests: metrics logger, step timer, viz helpers, profiling."""

import json
import os
import time

import numpy as np

from t2igan.utils.logging import MetricsLogger, StepTimer
from t2igan.utils.viz import (attention_grid, denormalize_clip,
                              save_image_grid, tanh_to01)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), print_every=1000, console=False)
    logger.log(1, {"loss": 1.5, "acc": np.float32(0.25)})
    logger.log(2, {"loss": 1.25, "skipme": "not-a-number"})
    logger.close()
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
    assert lines[0]["acc"] == 0.25
    assert "skipme" not in lines[1]
    assert "sec_per_step" in lines[1]


def test_step_timer():
    t = StepTimer(batch_size=8, window=4)
    for _ in range(5):
        t.tick()
        time.sleep(0.01)
    assert t.ms_per_step > 0
    assert t.images_per_sec > 0


def test_attention_grid_shapes(rng):
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    attn = rng.random((2, 8, 8, 5)).astype(np.float32)
    words = [["a", "b", "c", "d", "e"], ["x", "y", "z", "w", "v"]]
    grid = attention_grid(imgs, attn, words, max_words=4, cell=48)
    assert grid.dtype == np.uint8
    assert grid.shape[1] == 5 * 48        # image + 4 word tiles
    # flat [B, P, L] layout also accepted
    grid2 = attention_grid(imgs, attn.reshape(2, 64, 5), words, max_words=2)
    assert grid2.shape[0] > 0


def test_save_image_grid(tmp_path, rng):
    imgs = rng.random((5, 16, 16, 3)).astype(np.float32)
    path = os.path.join(str(tmp_path), "grid.png")
    save_image_grid(imgs, path, ncol=3)
    from PIL import Image
    im = Image.open(path)
    assert im.size == (3 * 16, 2 * 16)


def test_denormalize_roundtrip(rng):
    from t2igan.data.dataset import normalize_clip
    img = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    x = normalize_clip(img)
    back = denormalize_clip(x)
    np.testing.assert_allclose(back, img.astype(np.float32) / 255.0,
                               atol=1e-5)


def test_tanh_to01():
    x = np.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(tanh_to01(x), [0.0, 0.5, 1.0, 1.0])


def test_profiling_timed():
    from t2igan.utils.profiling import timed
    out = {}
    with timed("block", out):
        time.sleep(0.01)
    assert out["block"] >= 0.01
