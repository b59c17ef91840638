"""Native image library tests: build, resize parity vs PIL, pipeline parity
vs the Python path, and batch consistency."""

import numpy as np
import pytest

from t2igan import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resize_matches_pil_downscale(rng):
    from PIL import Image

    img = (rng.random((97, 123, 3)) * 255).astype(np.uint8)
    ours = native.resize_rgb(img, 32, 48)
    ref = np.asarray(
        Image.fromarray(img).resize((48, 32), Image.BILINEAR), np.float32)
    # PIL uses fixed-point coefficients; agree within quantization noise
    assert np.abs(ours - ref).max() <= 2.0


def test_resize_matches_pil_upscale(rng):
    from PIL import Image

    img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    ours = native.resize_rgb(img, 64, 64)
    ref = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BILINEAR), np.float32)
    assert np.abs(ours - ref).max() <= 2.0


def test_pyramid_matches_python_path(rng):
    from PIL import Image

    from t2igan.data.dataset import build_pyramid, normalize_clip

    img = (rng.random((150, 200, 3)) * 255).astype(np.uint8)
    scale, crop = 76, 64
    cx, cy = 5, 3
    sizes = (16, 32, 64)

    outs = native.pyramid(img, scale, crop, cx, cy, False, sizes)
    assert [o.shape for o in outs] == [(16, 16, 3), (32, 32, 3), (64, 64, 3)]

    # python oracle: same ops via PIL
    pim = Image.fromarray(img)
    w, h = pim.size
    if w < h:
        nw, nh = scale, round(scale * h / w)
    else:
        nw, nh = round(scale * w / h), scale
    pim = pim.resize((nw, nh), Image.BILINEAR)
    pim = pim.crop((cx, cy, cx + crop, cy + crop))
    ref = build_pyramid(pim, sizes)
    for o, r in zip(outs, ref):
        # normalized space; CLIP std ~0.27 so 2/255 quantization ≈ 0.03
        assert np.abs(o - r).max() < 0.06


def test_pyramid_flip(rng):
    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    a = native.pyramid(img, 76, 64, 0, 0, False, (64,))[0]
    b = native.pyramid(img, 76, 64, 0, 0, True, (64,))[0]
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-4)


def test_pyramid_batch_matches_single(rng):
    imgs = [(rng.random((80 + i, 90, 3)) * 255).astype(np.uint8)
            for i in range(4)]
    sizes = (32, 64)
    crops = [(1, 2), (0, 0), (3, 1), (2, 2)]
    flips = [False, True, False, True]
    batch = native.pyramid_batch(imgs, 76, 64, crops, flips, sizes)
    for i in range(4):
        single = native.pyramid(imgs[i], 76, 64, crops[i][0], crops[i][1],
                                flips[i], sizes)
        for a, b in zip(batch[i], single):
            np.testing.assert_array_equal(a, b)


def test_invalid_crop_raises(rng):
    img = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
    with pytest.raises(ValueError):
        native.pyramid(img, 76, 64, 50, 50, False, (64,))
