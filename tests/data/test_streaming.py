"""StreamingRebase: the reference prev_frame_info state machine
(bevformer.py:291-324) — deltas vs the cached frame, scene reset."""

import numpy as np

from vidar_tpu.evals.streaming import StreamingRebase


def _meta(pos, angle, scene, rot=None):
    cb = np.zeros(18)
    cb[:3] = pos
    cb[-1] = angle
    return dict(can_bus=cb, scene_token=scene,
                l2g_rot=rot if rot is not None else np.eye(3))


def test_first_frame_zeroed():
    rb = StreamingRebase()
    out = rb.step(_meta([10.0, 20.0, 0.0], 45.0, 'sceneA'))
    assert not out['has_prev']
    np.testing.assert_allclose(out['can_bus'][:3], 0.0)
    assert out['rotate_angle'] == 0.0
    np.testing.assert_allclose(out['shift'], 0.0)


def test_delta_vs_cached_raw_pose():
    rb = StreamingRebase(bev_size=(100, 100),
                         pc_range=(-50, -50, -5, 50, 50, 3))
    rb.step(_meta([10.0, 20.0, 0.0], 45.0, 'sceneA'))
    out = rb.step(_meta([13.0, 24.0, 0.0], 50.0, 'sceneA'))
    assert out['has_prev']
    np.testing.assert_allclose(out['can_bus'][:3], [3.0, 4.0, 0.0])
    np.testing.assert_allclose(out['rotate_angle'], 5.0)
    # identity l2g_rot: shift = delta / cell / n = (3/1)/100, (4/1)/100
    np.testing.assert_allclose(out['shift'], [0.03, 0.04], atol=1e-6)


def test_cache_updates_from_raw_not_delta():
    rb = StreamingRebase()
    rb.step(_meta([0.0, 0.0, 0.0], 0.0, 'sceneA'))
    rb.step(_meta([1.0, 0.0, 0.0], 1.0, 'sceneA'))
    out = rb.step(_meta([3.0, 0.0, 0.0], 4.0, 'sceneA'))
    np.testing.assert_allclose(out['can_bus'][:3], [2.0, 0.0, 0.0])
    np.testing.assert_allclose(out['rotate_angle'], 3.0)


def test_scene_change_resets():
    rb = StreamingRebase()
    rb.step(_meta([5.0, 5.0, 0.0], 10.0, 'sceneA'))
    out = rb.step(_meta([100.0, 100.0, 0.0], 90.0, 'sceneB'))
    assert not out['has_prev']
    np.testing.assert_allclose(out['can_bus'][:3], 0.0)
    # and the next sceneB frame rebases against the first sceneB frame
    out2 = rb.step(_meta([101.0, 100.0, 0.0], 91.0, 'sceneB'))
    assert out2['has_prev']
    np.testing.assert_allclose(out2['can_bus'][:3], [1.0, 0.0, 0.0])


def test_l2g_rotation_applied_to_shift():
    # 90 deg rotation about z: global delta [1,0] -> lidar-frame [0,-1]...
    rot = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    rb = StreamingRebase(bev_size=(100, 100),
                         pc_range=(-50, -50, -5, 50, 50, 3))
    rb.step(_meta([0.0, 0.0, 0.0], 0.0, 's', rot))
    out = rb.step(_meta([1.0, 0.0, 0.0], 0.0, 's', rot))
    want = np.linalg.inv(rot) @ np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(out['shift'],
                               [want[0] / 100.0, want[1] / 100.0], atol=1e-6)
