"""Map-expansion converter on a synthetic map json + fake infos."""

import json
import os
import pickle

import numpy as np

from vidar_tpu.tools.map_converter import (create_map_anns,
                                           load_map_elements,
                                           sample_map_boxes)


def _fake_map(path):
    nodes = []
    for i, (x, y) in enumerate([(0, 0), (40, 0),           # divider line
                                (5, 5), (8, 5), (8, 8), (5, 8),  # crossing
                                (-20, -20), (60, -20), (60, 60),
                                (-20, 60)]):               # road polygon
        nodes.append(dict(token=f'n{i}', x=float(x), y=float(y)))
    m = dict(
        node=nodes,
        line=[dict(token='l0', node_tokens=['n0', 'n1'])],
        polygon=[dict(token='p0',
                      exterior_node_tokens=['n2', 'n3', 'n4', 'n5']),
                 dict(token='p1',
                      exterior_node_tokens=['n6', 'n7', 'n8', 'n9'])],
        road_divider=[dict(token='rd0', line_token='l0')],
        lane_divider=[],
        ped_crossing=[dict(token='pc0', polygon_token='p0')],
        road_segment=[dict(token='rs0', polygon_token='p1')],
    )
    with open(path, 'w') as f:
        json.dump(m, f)


def test_map_elements_and_boxes(tmp_path):
    mp = os.path.join(tmp_path, 'loc.json')
    _fake_map(mp)
    els = load_map_elements(mp)
    assert len(els['divider']) == 1
    assert len(els['ped_crossing']) == 1
    assert len(els['boundary']) == 1

    g2l = np.eye(4)  # ego at origin
    boxes, labels, polylines, closed = sample_map_boxes(
        els, g2l, (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0))
    assert len(polylines) == len(boxes) == len(closed)
    assert all(p.shape[1] == 2 and len(p) <= 64 for p in polylines)
    assert set(labels.tolist()) == {0, 1, 2}
    assert ((boxes >= 0) & (boxes <= 1)).all()
    # rings are flagged closed, the divider open
    np.testing.assert_array_equal(closed, labels != 0)
    # the crossing is a 3x3 box around (6.5, 6.5)
    pc = boxes[labels == 1][0]
    np.testing.assert_allclose(pc[2:], [3 / 102.4, 3 / 102.4], atol=1e-5)


def test_create_map_anns_end_to_end(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, 'maps', 'expansion'))
    os.makedirs(os.path.join(root, 'v1.0-mini'))
    _fake_map(os.path.join(root, 'maps', 'expansion', 'townX.json'))
    with open(os.path.join(root, 'v1.0-mini', 'scene.json'), 'w') as f:
        json.dump([dict(token='scene0', log_token='log0')], f)
    with open(os.path.join(root, 'v1.0-mini', 'log.json'), 'w') as f:
        json.dump([dict(token='log0', location='townX')], f)
    infos = [dict(token='tok0', scene_token='scene0',
                  lidar2ego_translation=[0, 0, 0],
                  lidar2ego_rotation=[1, 0, 0, 0],
                  ego2global_translation=[0, 0, 0],
                  ego2global_rotation=[1, 0, 0, 0])]
    ip = os.path.join(root, 'infos.pkl')
    with open(ip, 'wb') as f:
        pickle.dump(dict(infos=infos), f)
    op = os.path.join(root, 'map_anns.pkl')
    n = create_map_anns(root, 'v1.0-mini', ip, op)
    assert n == 1
    with open(op, 'rb') as f:
        anns = pickle.load(f)
    assert len(anns['tok0']['boxes']) == 3
