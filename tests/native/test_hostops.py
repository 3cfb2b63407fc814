"""Native hostops parity vs the numpy pipeline implementations."""

import io

import numpy as np
import pytest

from vidar_tpu import native
from vidar_tpu.data import pipeline
from vidar_tpu.data.prefetch import PrefetchLoader


needs_native = pytest.mark.skipif(not native.available(),
                                  reason='hostops lib not built')


@needs_native
def test_voxel_downsample_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (20000, 5)).astype(np.float32)
    pc_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
    want = pipeline.voxel_downsample_points(pts, pc_range, (1., 1., 1.), 500)
    got = native.voxel_downsample_points(pts, pc_range, (1., 1., 1.), 500)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_point_filter_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-10, 10, (5000, 5)).astype(np.float32)
    box = [-2.0, -1.5, 2.0, 1.5]
    want = pipeline.ego_mask_filter(pts, box)
    want = pipeline.remove_close(want, 1.0)
    got = native.point_filter(pts, box, radius=1.0)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_transform_points():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(100, 5)).astype(np.float32)
    th = 0.3
    rot = np.array([[np.cos(th), np.sin(th), 0],
                    [-np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    t = np.array([1., 2., 3.], np.float32)
    want = pts.copy()
    want[:, :3] = want[:, :3] @ rot + t
    got = native.transform_points(pts.copy(), rot, t)
    np.testing.assert_allclose(got, want, atol=1e-5)


@needs_native
def test_normalize_pad_matches_numpy():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (30, 41, 3)).astype(np.float32)
    want = pipeline.pad_images(
        pipeline.normalize_images(img[None])[None][0], 32)[0]
    got = native.normalize_pad(img, 32, 64)
    np.testing.assert_allclose(got, want, atol=1e-4)


@needs_native
def test_jpeg_roundtrip():
    from PIL import Image
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format='JPEG', quality=95)
    data = buf.getvalue()
    got = native.jpeg_decode(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    assert got.shape == want.shape
    # libjpeg IDCT variants may differ by a few LSBs from PIL's
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


@needs_native
def test_knn_matches_bruteforce():
    rng = np.random.default_rng(5)
    src = rng.normal(size=(300, 3)).astype(np.float32)
    dst = rng.normal(size=(400, 3)).astype(np.float32)
    d2 = ((src[:, None] - dst[None]) ** 2).sum(-1)
    want_i = d2.argmin(1)
    want_d = d2[np.arange(len(src)), want_i]
    got_d, got_i = native.knn_1nn(src, dst)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)


def test_prefetch_loader_order_and_errors():
    def fetch(i):
        if i == 13:
            raise ValueError('boom')
        return i * i

    out = list(PrefetchLoader(fetch, range(10), num_threads=3, depth=4))
    assert out == [i * i for i in range(10)]

    with pytest.raises(ValueError):
        list(PrefetchLoader(fetch, [1, 13, 2], num_threads=2))
