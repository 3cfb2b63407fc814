"""Mono (per-camera) dataset tests for DD3D co-training."""

import numpy as np
import pytest

from tests.data.fake_nuscenes import make_fake_nuscenes
from vidar_tpu.data.nuscenes_mono import NuScenesMonoDataset


@pytest.fixture(scope='module')
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('nusc_mono')
    pkl = make_fake_nuscenes(str(root), num_samples=6, num_cams=3)
    return str(root), pkl


def test_mono_dataset_shapes(fake_root):
    root, pkl = fake_root
    ds = NuScenesMonoDataset(pkl, cam_names=('CAM0', 'CAM1', 'CAM2'),
                             max_gt=8, img_hw=(64, 96), min_depth=0.01,
                             min_box_pixels=1.0)
    assert len(ds) == 18
    item = ds[0]
    assert item['boxes2d'].shape == (8, 4)
    assert item['quat'].shape == (8, 4)
    assert item['proj_ctr'].shape == (8, 2)
    assert item['depth'].shape == (8, 1)
    assert item['size'].shape == (8, 3)
    assert item['intrinsics'].shape == (3, 3)
    # quats are unit norm
    np.testing.assert_allclose(np.linalg.norm(item['quat'], axis=-1), 1.0,
                               atol=1e-5)
    # 2D boxes inside the image
    assert (item['boxes2d'][:, [0, 2]] <= 95).all()
    assert (item['boxes2d'][:, [1, 3]] <= 63).all()
    assert (item['boxes2d'] >= 0).all()


def test_mono_dataset_visible_targets(tmp_path):
    """A forward-facing camera sees a box straight ahead with the right
    depth and projected center."""
    import pickle
    # camera axes in lidar coords: x_cam=(0,-1,0), y_cam=(0,0,-1),
    # z_cam=(1,0,0) (z looks along lidar +x)
    r = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    info = dict(
        token='t0', scene_token='s0', frame_idx=0, prev='', next='',
        timestamp=0, lidar_path='', lidar2ego_translation=[0, 0, 0],
        lidar2ego_rotation=[1, 0, 0, 0], ego2global_translation=[0, 0, 0],
        ego2global_rotation=[1, 0, 0, 0], can_bus=np.zeros(18), sweeps=[],
        cams=dict(CAM_FRONT=dict(
            data_path='x.jpg', sample_data_token='sd0',
            sensor2lidar_rotation=r,
            sensor2lidar_translation=np.zeros(3),
            cam_intrinsic=np.array([[500.0, 0, 48], [0, 500.0, 32],
                                    [0, 0, 1]]), timestamp=0)),
        gt_boxes=np.array([[10.0, 0.0, -0.75, 2.0, 4.0, 1.5, 0.0]]),
        gt_names=np.array(['car'], object),
        gt_velocity=np.zeros((1, 2)))
    pkl = tmp_path / 'infos.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(dict(infos=[info]), f)
    ds = NuScenesMonoDataset(str(pkl), cam_names=('CAM_FRONT',), max_gt=4,
                             img_hw=(64, 96))
    item = ds[0]
    assert int(item['num_valid']) == 1
    np.testing.assert_allclose(item['depth'][0, 0], 10.0, atol=1e-5)
    # gravity center on the optical axis -> principal point
    np.testing.assert_allclose(item['proj_ctr'][0], [48.0, 32.0], atol=1e-4)
    np.testing.assert_allclose(item['size'][0], [2.0, 4.0, 1.5], atol=1e-6)
    # pad slots untouched
    np.testing.assert_allclose(item['boxes2d'][1:], 0.0)


def test_mono_addressing(fake_root):
    root, pkl = fake_root
    ds = NuScenesMonoDataset(pkl, cam_names=('CAM0', 'CAM1', 'CAM2'),
                             max_gt=8, img_hw=(64, 96), min_depth=0.01)
    a = ds.getitem_by_sample_cam(2, 'CAM1')
    b = ds[2 * 3 + 1]
    np.testing.assert_allclose(a['boxes2d'], b['boxes2d'])
    assert a['image_path'] == b['image_path']
