"""Geometry tests for the host-side image/BEV augmentations
(reference RandomCropResizeFlipImage augmentation.py:204,
GlobalRotScaleTransImage augmentation.py:304,
RandomScaleImageMultiViewImage transform_3d.py:294)."""

import numpy as np
import pytest

from vidar_tpu.data import pipeline as pl


def _project(l2i, xyz):
    p = l2i @ np.append(np.asarray(xyz, np.float64), 1.0)
    return p[:2] / p[2]


def _make_cam(h, w, fx=200.0):
    """lidar2img = viewpad @ [R|t] with identity extrinsics: camera looks
    down +z, principal point at image center."""
    k = np.eye(4)
    k[0, 0] = k[1, 1] = fx
    k[0, 2] = w / 2
    k[1, 2] = h / 2
    return k


def test_scale_images_geometry_and_shape():
    h, w = 90, 160
    l2i = _make_cam(h, w)[None]
    imgs = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, 3))[None]
    pt = np.array([2.0, 1.0, 10.0])
    u0 = _project(l2i[0], pt)

    out, l2i2 = pl.scale_images(imgs, l2i, 0.5)
    assert out.shape == (1, 45, 80, 3)
    u1 = _project(l2i2[0], pt)
    np.testing.assert_allclose(u1, u0 * 0.5, atol=1e-6)
    # gradient image: pixel value at the projected point tracks x-coordinate
    x, y = int(round(u1[0])), int(round(u1[1]))
    assert abs(out[0, y, x, 0] - u0[0]) < 2.5


def test_sample_rcrf_train_window_and_determinism():
    conf = {'reisze': [72, 90, 108], 'crop': (0, 0, 160, 90),
            'H': 90, 'W': 160, 'rand_flip': True}
    rng = np.random.default_rng(0)
    seen_resize = set()
    for _ in range(32):
        p = pl.sample_random_crop_resize_flip(rng, conf, training=True)
        seen_resize.add(p.resize_dims[1])
        # crop window is always the configured (fW, fH)
        assert p.crop[2] - p.crop[0] == 160
        assert p.crop[3] - p.crop[1] == 90
        # bottom crop: crop_h = max(0, newH - fH)
        assert p.crop[1] == max(0, p.resize_dims[1] - 90)
    assert seen_resize == {72, 90, 108}


def test_sample_rcrf_eval_branch_keeps_crop():
    conf = {'reisze': [90], 'crop': (0, 0, 160, 90), 'H': 90, 'W': 160,
            'rand_flip': True}
    p = pl.sample_random_crop_resize_flip(
        np.random.default_rng(0), conf, training=False)
    assert p.crop == (0, 0, 160, 90)
    assert not p.flip
    assert p.resize == 1.0


@pytest.mark.parametrize('flip', [False, True])
def test_random_crop_resize_flip_geometry(flip):
    h, w = 90, 160
    l2i = _make_cam(h, w)[None]
    # horizontal-gradient image so content checks are position checks
    imgs = np.tile(np.arange(w, dtype=np.float32)[None, :, None],
                   (h, 1, 3))[None]
    p = pl.RandomCropResizeFlipParams(
        resize=1.2, resize_dims=(192, 108), crop=(20, 18, 180, 108),
        flip=flip)
    out, l2i2 = pl.random_crop_resize_flip(imgs, l2i, p)
    assert out.shape == (1, 90, 160, 3)

    pt = np.array([0.5, 0.3, 10.0])
    u0 = _project(l2i[0], pt)
    u1 = _project(l2i2[0], pt)
    # expected pixel affine: scale then crop offset, then mirror if flipped
    exp = u0 * 1.2 - np.array([20.0, 18.0])
    if flip:
        exp[0] = 160 - exp[0]
    np.testing.assert_allclose(u1, exp, atol=1e-6)

    # content at the new projection equals content at the old projection
    x, y = int(round(u1[0])), int(round(u1[1]))
    assert abs(out[0, y, x, 0] - u0[0]) < 2.5


def test_random_crop_resize_flip_pads_outside():
    """Crop windows larger than the resized image zero-pad (PIL crop
    semantics) — the small-resize branch of the mem-efficient config."""
    h, w = 90, 160
    imgs = np.full((1, h, w, 3), 200.0, np.float32)
    p = pl.RandomCropResizeFlipParams(
        resize=0.8, resize_dims=(128, 72), crop=(0, 0, 160, 90), flip=False)
    out, _ = pl.random_crop_resize_flip(imgs, _make_cam(h, w)[None], p)
    assert out.shape == (1, 90, 160, 3)
    assert out[0, :70, :126].min() > 150  # interior kept
    assert out[0, 80:, :].max() == 0.0    # padded rows
    assert out[0, :, 130:].max() == 0.0   # padded cols


def test_bev_aug_lidar2img_inverse_consistency():
    rng = np.random.default_rng(1)
    p = pl.sample_bev_aug(rng, rot_range=(-22.5, 22.5))
    l2i = _make_cam(90, 160)[None]
    pt = np.array([3.0, -1.0, 12.0, 1.0])
    moved = p.mat4 @ pt
    u_ref = _project(l2i[0], pt[:3])
    u_new = _project(pl.bev_aug_lidar2img(l2i, p)[0], moved[:3])
    np.testing.assert_allclose(u_new, u_ref, atol=1e-9)


def test_bev_aug_boxes_and_points():
    p = pl.BEVAugParams(rot_angle=np.pi / 6, scale_ratio=1.1,
                        flip_dx=False, flip_dy=True)
    boxes = np.array([[4.0, 2.0, -1.0, 2.0, 4.0, 1.5, 0.3, 1.0, 0.5]])
    out = pl.bev_aug_boxes(boxes, p)
    # center follows mat4
    exp_c = (p.mat4 @ np.append(boxes[0, :3], 1.0))[:3]
    np.testing.assert_allclose(out[0, :3], exp_c, atol=1e-12)
    # dims scale
    np.testing.assert_allclose(out[0, 3:6], boxes[0, 3:6] * 1.1, atol=1e-12)
    # yaw: rotate then flip_dy negates
    assert np.isclose(out[0, 6], -(0.3 + np.pi / 6))
    # velocity rotates/scales/flips with no translation
    exp_v = (p.mat4[:3, :3] @ np.array([1.0, 0.5, 0.0]))[:2]
    np.testing.assert_allclose(out[0, 7:9], exp_v, atol=1e-12)

    pts = np.array([[4.0, 2.0, -1.0, 0.9]])
    outp = pl.bev_aug_points(pts, p)
    np.testing.assert_allclose(outp[0, :3], exp_c, atol=1e-12)
    assert outp[0, 3] == 0.9  # intensity untouched

    # velocity direction consistency: a point moving with the box stays
    # on the box center's trajectory after the transform
    dt = 0.1
    future = boxes.copy()
    future[0, :2] += boxes[0, 7:9] * dt
    fut_out = pl.bev_aug_boxes(future, p)
    np.testing.assert_allclose(
        fut_out[0, :2], out[0, :2] + out[0, 7:9] * dt, atol=1e-9)


def test_bev_aug_empty_inputs():
    p = pl.sample_bev_aug(np.random.default_rng(0))
    assert pl.bev_aug_boxes(np.zeros((0, 9)), p).shape == (0, 9)
    assert pl.bev_aug_points(np.zeros((0, 4)), p).shape == (0, 4)


def test_dataset_applies_random_aug(tmp_path):
    """NuScenesViDARDataset with random_aug_conf emits crop-window-sized
    images with geometry-consistent lidar2img across the temporal queue."""
    from tests.data.fake_nuscenes import make_fake_nuscenes
    from vidar_tpu.data.nuscenes import NuScenesViDARDataset

    pkl = make_fake_nuscenes(str(tmp_path), num_samples=6, num_cams=2,
                             img_hw=(64, 96))
    conf = {'reisze': [48, 64, 80], 'crop': (0, 0, 96, 64),
            'H': 64, 'W': 96, 'rand_flip': True}
    ds = NuScenesViDARDataset(
        pkl, queue_length=2, future_length=1, ida_aug_conf=None,
        random_aug_conf=conf, max_points=512)
    sample = ds[0]
    imgs = np.asarray(sample.images)
    # (bs, T, cams, H, W, 3) after pad32: 64x96 stays 64x96
    assert imgs.shape[-3:] == (64, 96, 3)
    assert np.isfinite(np.asarray(sample.lidar2img)).all()
