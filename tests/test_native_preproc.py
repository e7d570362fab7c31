"""Native preprocessing library tests: builds, matches the Python path."""
import numpy as np
import pytest

from ovmono3d_tpu.data.mapper import resize_shortest_edge
from ovmono3d_tpu.data.native import (
    native_available,
    preprocess_batch_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_geometry_matches_python():
    rng = np.random.RandomState(0)
    imgs = [
        (rng.rand(480, 640, 3) * 255).astype(np.uint8),
        (rng.rand(300, 400, 3) * 255).astype(np.uint8),
    ]
    out, hw, ratios = preprocess_batch_native(
        imgs, out_size=896, short_side=532, max_size=896
    )
    assert out.shape == (2, 896, 896, 3)
    for i, im in enumerate(imgs):
        nh, nw, s = resize_shortest_edge(im.shape[:2], 532, 896)
        assert tuple(hw[i]) == (nh, nw)
        np.testing.assert_allclose(ratios[i], 1.0 / s, rtol=1e-5)
        # Padding region is zero.
        assert np.all(out[i, nh:, :] == 0)
        assert np.all(out[i, :, nw:] == 0)


def test_pixels_match_cv2():
    import cv2

    rng = np.random.RandomState(1)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    out, hw, _ = preprocess_batch_native(
        [img], out_size=896, short_side=532, max_size=896
    )
    nh, nw = hw[0]
    want = cv2.resize(img.astype(np.float32), (nw, nh),
                      interpolation=cv2.INTER_LINEAR)
    got = out[0, :nh, :nw]
    # Same half-pixel bilinear convention; allow small fixed-point diffs
    # (cv2 uses fixed-point arithmetic internally).
    assert np.mean(np.abs(got - want)) < 0.5
    assert np.max(np.abs(got - want)) < 4.0


def test_identity_when_no_resize():
    img = (np.random.RandomState(2).rand(100, 100, 3) * 255).astype(np.uint8)
    out, hw, ratios = preprocess_batch_native(
        [img], out_size=128, short_side=100, max_size=128
    )
    assert tuple(hw[0]) == (100, 100)
    np.testing.assert_allclose(out[0, :100, :100], img.astype(np.float32),
                               atol=1e-4)
    np.testing.assert_allclose(ratios[0], 1.0, rtol=1e-6)


def test_large_batch_parallel():
    rng = np.random.RandomState(3)
    imgs = [
        (rng.rand(rng.randint(200, 500), rng.randint(200, 500), 3) * 255)
        .astype(np.uint8)
        for _ in range(16)
    ]
    out, hw, ratios = preprocess_batch_native(
        imgs, out_size=896, short_side=532, max_size=896
    )
    assert out.shape == (16, 896, 896, 3)
    assert np.all(np.isfinite(out))
    assert np.all(hw > 0)
