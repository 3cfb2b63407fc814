"""NuScenesDetDataset over the on-disk fake fixture: gt padding, class/range
filters, use_pretrain_data index filter."""

import numpy as np
import pytest

from vidar_tpu.data.nuscenes import NuScenesDetDataset

import sys
sys.path.insert(0, __file__.rsplit("/", 1)[0])
from fake_nuscenes import make_fake_nuscenes


@pytest.fixture(scope='module')
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('fakenusc')
    make_fake_nuscenes(str(root), num_samples=12, num_cams=3)
    return str(root)


def test_det_sample(fake_root):
    ds = NuScenesDetDataset(
        f'{fake_root}/nuscenes_infos_temporal_train.pkl',
        queue_length=2, classes=('car', 'truck', 'pedestrian'),
        max_gt=16, test_mode=False)
    assert len(ds) > 0
    b = ds[0]
    assert b.gt_bboxes.shape == (1, 16, 9)
    assert b.gt_labels.shape == (1, 16)
    g = int(b.num_valid_gt[0])
    assert 0 <= g <= 16
    gt = np.asarray(b.gt_bboxes)[0, :g]
    labels = np.asarray(b.gt_labels)[0, :g]
    # 'ignoreme' boxes and invalid (0-point) boxes were filtered
    assert (labels < 3).all()
    # gravity-centre z = bottom z + h/2 keeps z within range +h margin
    assert np.isfinite(gt).all()
    # camera stream present (queue 2 + current)
    assert b.frames.images.shape[1] == 3


def test_use_pretrain_data_filter(fake_root):
    full = NuScenesDetDataset(
        f'{fake_root}/nuscenes_infos_temporal_train.pkl', queue_length=2)
    sub = NuScenesDetDataset(
        f'{fake_root}/nuscenes_infos_temporal_train.pkl', queue_length=2,
        use_pretrain_data=True)
    # the pretrain-aligned filter strides by 4 and requires history+future
    assert len(sub) <= max(1, len(full) // 2)
    for idx in sub.usable_index:
        assert idx >= sub.queue_length
