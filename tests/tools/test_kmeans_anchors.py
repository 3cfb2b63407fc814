"""k-means motion-anchor generator (reference base_motion_head.py:33-45
loads the pickle this tool rebuilds)."""

import pickle

import numpy as np

from vidar_tpu.tools.data_tools import kmeans_motion_anchors, _kmeans


def _make_infos(path, steps=12, n_frames=16):
    """One scene, two constant-velocity cars (+2 m/s x / +1 m/s y in the
    agent frame) and one stationary pedestrian; identity ego pose chain so
    lidar == global."""
    infos = []
    for i in range(n_frames):
        boxes = np.zeros((3, 7))
        # car A heading +x moving +x at 2 m/s per frame
        boxes[0, :2] = [2.0 * i, 0.0]
        boxes[0, 6] = 0.0
        # car B heading +y moving +y at 1 m/s per frame
        boxes[1, :2] = [10.0, 1.0 * i]
        boxes[1, 6] = np.pi / 2
        # pedestrian static
        boxes[2, :2] = [-5.0, -5.0]
        infos.append(dict(
            token=f't{i}', scene_token='s0', timestamp=float(i),
            lidar2ego_translation=[0.0, 0.0, 0.0],
            lidar2ego_rotation=[1.0, 0.0, 0.0, 0.0],
            ego2global_translation=[0.0, 0.0, 0.0],
            ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
            gt_boxes=boxes,
            gt_names=np.asarray(['car', 'car', 'pedestrian']),
            gt_instance_tokens=np.asarray(['a', 'b', 'p']),
        ))
    with open(path, 'wb') as f:
        pickle.dump(dict(infos=infos), f)
    return str(path)


def test_kmeans_anchor_pickle_format(tmp_path):
    src = _make_infos(tmp_path / 'infos.pkl')
    out = str(tmp_path / 'anchors.pkl')
    res = kmeans_motion_anchors(src, out, num_modes=6, steps=12)
    # reference format: anchors_all = list of per-group [P, T, 2] arrays
    with open(out, 'rb') as f:
        loaded = pickle.load(f)
    assert len(loaded['anchors_all']) == 4
    for a in loaded['anchors_all']:
        assert a.shape == (6, 12, 2) and a.dtype == np.float32
    assert res['meta']['counts'][0] > 0      # vehicle trajectories found
    assert res['meta']['counts'][2] > 0      # pedestrian trajectories


def test_kmeans_anchor_agent_frame(tmp_path):
    """Constant-velocity agents -> anchors are straight lines along the
    agent's own heading (+x in the agent frame for BOTH cars, despite
    different global headings)."""
    src = _make_infos(tmp_path / 'infos.pkl')
    out = str(tmp_path / 'anchors.pkl')
    res = kmeans_motion_anchors(src, out, num_modes=2, steps=4)
    veh = res['anchors_all'][0]              # [2, 4, 2]
    # every vehicle anchor: displacement along +x (agent frame), ~0 in y
    speeds = veh[:, -1, 0] / 4.0             # per-step x speed
    assert np.all(np.abs(veh[..., 1]) < 1e-4)
    assert sorted(np.round(speeds).tolist()) == [1.0, 2.0]
    ped = res['anchors_all'][2]
    assert np.all(np.abs(ped) < 1e-4)        # stationary


def test_load_motion_anchors_roundtrip(tmp_path):
    from vidar_tpu.uniad.motion_head import load_motion_anchors
    src = _make_infos(tmp_path / 'infos.pkl')
    out = str(tmp_path / 'anchors.pkl')
    kmeans_motion_anchors(src, out, num_modes=6, steps=12)
    anc = load_motion_anchors(out)
    assert anc.shape == (4, 6, 12, 2) and anc.dtype == np.float32


def test_kmeans_basic_separation():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.05, (40, 2)) + [0, 0]
    b = rng.normal(0, 0.05, (40, 2)) + [10, 10]
    c = _kmeans(np.concatenate([a, b]), 2, seed=1)
    c = c[np.argsort(c[:, 0])]
    np.testing.assert_allclose(c[0], [0, 0], atol=0.2)
    np.testing.assert_allclose(c[1], [10, 10], atol=0.2)
