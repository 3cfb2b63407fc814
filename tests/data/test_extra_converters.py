"""Tests for the auxiliary converters (gt database, kitti2waymo, nuimages)."""

import json
import os
import pickle

import numpy as np
import pytest

from tests.data.fake_nuscenes import make_fake_nuscenes
from vidar_tpu.tools.extra_converters import (
    create_groundtruth_database, points_in_rbbox, kitti2waymo,
    nuimage_to_coco)


def test_points_in_rbbox_axis_aligned():
    pts = np.array([[0.0, 0, 0], [5, 0, 0], [0.9, 0, 0], [0, 0, 3]])
    # box at origin, w=2 (y extent), l=4 (x extent), h=2, yaw 0, bottom at -1
    boxes = np.array([[0.0, 0, -1, 2, 4, 2, 0]])
    m = points_in_rbbox(pts, boxes)
    assert m[:, 0].tolist() == [True, False, True, False]
    # rotate 90deg: x/y extents swap
    boxes_r = np.array([[0.0, 0, -1, 2, 4, 2, np.pi / 2]])
    m = points_in_rbbox(np.array([[1.5, 0, 0], [0, 1.5, 0]]), boxes_r)
    assert m[:, 0].tolist() == [False, True]


def test_create_gt_database(tmp_path):
    pkl = make_fake_nuscenes(str(tmp_path), num_samples=4, num_cams=2)
    out = create_groundtruth_database(pkl, str(tmp_path), data_root='')
    with open(out, 'rb') as f:
        db = pickle.load(f)
    assert db, 'expected at least one class in the db'
    total = sum(len(v) for v in db.values())
    assert total > 0
    first = next(iter(db.values()))[0]
    for k in ('name', 'path', 'image_idx', 'gt_idx', 'box3d_lidar',
              'num_points_in_gt', 'difficulty', 'group_id'):
        assert k in first
    bin_path = os.path.join(str(tmp_path), first['path'])
    assert os.path.exists(bin_path)
    pts = np.fromfile(bin_path, np.float32).reshape(-1, 5)
    assert len(pts) == first['num_points_in_gt']


def test_kitti2waymo_records(tmp_path):
    res = [dict(name=['Car', 'Pedestrian'],
                dimensions=np.array([[4.0, 1.6, 1.9], [0.8, 1.8, 0.7]]),
                location=np.array([[1.0, 1.0, 10.0], [-2.0, 1.5, 5.0]]),
                rotation_y=np.array([0.0, np.pi / 2]),
                score=np.array([0.9, 0.5]),
                sample_idx=7)]
    out = str(tmp_path / 'out.bin')
    kitti2waymo(res, out, prefix='ctx')
    with open(out, 'rb') as f:
        objs = pickle.load(f)
    assert len(objs) == 2
    o = objs[0]
    # camera (x,y,z)=(1,1,10) -> vehicle (10, -1, -1 + h/2)
    assert o['center_x'] == 10.0 and o['center_y'] == -1.0
    np.testing.assert_allclose(o['center_z'], -1.0 + 0.8, atol=1e-9)
    assert o['type'] == 1 and objs[1]['type'] == 2
    assert -np.pi <= o['heading'] <= np.pi


def test_nuimage_to_coco(tmp_path):
    tdir = tmp_path / 'v1.0-mini'
    tdir.mkdir()
    (tdir / 'sample_data.json').write_text(json.dumps([
        dict(token='sd0', filename='a.jpg', is_key_frame=True,
             width=1600, height=900),
        dict(token='sd1', filename='b.jpg', is_key_frame=False)]))
    (tdir / 'category.json').write_text(json.dumps([
        dict(token='c0', name='vehicle.car'),
        dict(token='c1', name='animal')]))
    (tdir / 'object_ann.json').write_text(json.dumps([
        dict(sample_data_token='sd0', category_token='c0',
             bbox=[10, 20, 110, 80]),
        dict(sample_data_token='sd0', category_token='c1',
             bbox=[0, 0, 5, 5]),
        dict(sample_data_token='sd1', category_token='c0',
             bbox=[1, 1, 2, 2])]))
    out = str(tmp_path / 'coco.json')
    nuimage_to_coco(str(tmp_path), 'v1.0-mini', out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco['images']) == 1          # key frames only
    assert len(coco['annotations']) == 1     # unmapped class dropped
    ann = coco['annotations'][0]
    assert ann['bbox'] == [10, 20, 100, 60]
    assert coco['categories'][0]['name'] == 'car'
