"""Tests for the DD3D monocular 3D detection stack (SURVEY §2.2 dd3d)."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.models.dd3d import (
    NuScenesDD3D, FCOS2DHead, FCOS3DHead, quaternion_to_matrix,
    matrix_to_quaternion, boxes3d_corners, allocentric_to_egocentric,
    compute_locations, prepare_targets, compute_ctrness_targets,
    fcos2d_loss, iou_ltrb, NUSCENES_CANON_SIZES)


def _rand_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quaternion_matrix_roundtrip():
    q = jnp.asarray(_rand_unit_quats(32))
    m = quaternion_to_matrix(q)
    # rotation matrices: orthonormal, det 1
    eye = jnp.einsum('nij,nkj->nik', m, m)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), (32, 3, 3)),
                               atol=1e-5)
    q2 = matrix_to_quaternion(m)
    # recover up to sign
    dot = np.abs((np.asarray(q) * np.asarray(q2)).sum(-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_boxes3d_corners_axis_aligned():
    # identity rotation, camera looking down +z with identity intrinsics
    q = jnp.asarray([[1.0, 0, 0, 0]])
    ctr = jnp.asarray([[0.0, 0.0]])
    depth = jnp.asarray([[10.0]])
    size = jnp.asarray([[2.0, 4.0, 1.5]])  # w, l, h
    inv_k = jnp.eye(3)[None]
    c = np.asarray(boxes3d_corners(q, ctr, depth, size, inv_k))[0]
    assert c.shape == (8, 3)
    # extents = l, w, h about the center at (0, 0, 10)
    np.testing.assert_allclose(c.mean(0), [0, 0, 10], atol=1e-5)
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 4.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 2.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 2].max() - c[:, 2].min(), 1.5, atol=1e-5)


def test_allocentric_identity_on_axis():
    # for an object exactly on the optical axis the viewing-ray frame is
    # the camera frame => allocentric == egocentric
    q = jnp.asarray(_rand_unit_quats(4, seed=1))
    ctr = jnp.zeros((4, 2))
    inv_k = jnp.broadcast_to(jnp.eye(3)[None], (4, 3, 3))
    out = allocentric_to_egocentric(q, ctr, inv_k)
    m_in = np.asarray(quaternion_to_matrix(q))
    m_out = np.asarray(quaternion_to_matrix(out))
    # local frame: x = (-1,0,0)? gram-schmidt with z=(0,0,1), y=(0,1,0)
    # gives x = y x z = (1,0,0) => identity local frame
    np.testing.assert_allclose(m_out, m_in, atol=1e-4)


def test_prepare_targets_assigns_center():
    strides = (8, 16)
    shapes = [(16, 16), (8, 8)]
    locs = compute_locations(shapes, strides)
    # a 40x40 box centred at (64, 64): max ltrb = 20 -> level 0 (soi 64)
    gt_boxes = jnp.asarray([[44.0, 44.0, 84.0, 84.0],
                            [0, 0, 0, 0]])
    gt_labels = jnp.asarray([3, 0], jnp.int32)
    tgt = prepare_targets(locs, strides, gt_boxes, gt_labels,
                          jnp.asarray(1, jnp.int32), num_classes=10,
                          sizes_of_interest=((-1, 64), (64, 1e8)))
    labels = np.asarray(tgt['labels'])
    pos = np.asarray(tgt['pos'])
    assert pos.any()
    assert (labels[pos] == 3).all()
    # positives only on level 0 (first 256 locations)
    assert not pos[256:].any()
    # centerness of a centred location is 1
    ctr = compute_ctrness_targets(jnp.asarray([[10.0, 10.0, 10.0, 10.0]]))
    np.testing.assert_allclose(np.asarray(ctr), [1.0], atol=1e-6)


def test_iou_ltrb_identity():
    b = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
    np.testing.assert_allclose(np.asarray(iou_ltrb(b, b)), [1.0], atol=1e-6)


def test_nuscenes_dd3d_forward_loss_inference():
    model = NuScenesDD3D(num_classes=10, strides=(8, 16),
                         pre_nms_topk=64, post_nms_topk=16)
    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.normal(size=(1, 16, 16, 32)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))]
    params = model.init(jax.random.PRNGKey(0), feats)
    preds = model.apply(params, feats)
    assert preds['logits'][0].shape == (1, 16, 16, 10)
    assert preds['box2d_reg'][1].shape == (1, 8, 8, 4)
    assert preds['quat'][0].shape == (1, 16, 16, 4)

    g = 4
    gt = dict(
        boxes2d=jnp.asarray([[40, 40, 90, 90]] * g, jnp.float32),
        labels=jnp.zeros((g,), jnp.int32),
        num_valid=jnp.asarray(2, jnp.int32),
        quat=jnp.asarray(_rand_unit_quats(g, seed=3)),
        proj_ctr=jnp.full((g, 2), 64.0),
        depth=jnp.full((g, 1), 20.0),
        size=jnp.asarray([[2.0, 4.5, 1.6]] * g))
    inv_k = jnp.asarray(np.linalg.inv(
        np.asarray([[800.0, 0, 64], [0, 800.0, 64], [0, 0, 1]])))
    losses = model.apply(params, preds, gt, inv_k, method=model.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert 'loss_box3d_quat' in losses and 'loss_conf3d' in losses

    out = model.apply(params, preds, inv_k, method=model.inference)
    assert out['scores'].shape == (16,)
    assert out['corners3d'].shape == (16, 8, 3)
    assert np.isfinite(np.asarray(out['corners3d'])).all()
