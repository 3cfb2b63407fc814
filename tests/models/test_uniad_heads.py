"""Unit tests for the deepened UniAD task heads (SURVEY §2.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vidar_tpu.uniad.motion_head import (MotionHead, default_anchors,
                                         traj_loss)
from vidar_tpu.uniad.occ_head import (OccHead, fiery_binary_seg_loss,
                                      dice_loss_with_masks,
                                      bev_feature_slicer)
from vidar_tpu.uniad.panseg_head import (PansegformerHead,
                                         panseg_loss_single, giou)
from vidar_tpu.uniad.planning_head import (PlanningHeadSingleMode,
                                           collision_optimize,
                                           planning_loss, collision_loss)
from vidar_tpu.uniad.functional import (pos2posemb2d, norm_points,
                                        bivariate_gaussian_activation,
                                        anchor_coordinate_transform,
                                        trajectory_coordinate_transform)
from vidar_tpu.uniad.metrics import (IntersectionOverUnion, PanopticMetric,
                                     PlanningMetric, MotionMetric)
from vidar_tpu.uniad.motion_optimization import (MotionNonlinearSmoother,
                                                 nonlinear_smoother)


D = 32
BEV = 8
PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_functional_transforms_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(rng.normal(size=(2, 3, 4, 2)).astype(np.float32))
    centers = jnp.asarray(rng.normal(size=(1, 5, 2)).astype(np.float32))
    yaw = jnp.asarray(rng.normal(size=(1, 5)).astype(np.float32))
    out = anchor_coordinate_transform(anchors, centers, yaw)
    assert out.shape == (1, 5, 2, 3, 4, 2)
    # rotation by yaw then inverse rotation recovers the anchors
    rot = anchor_coordinate_transform(anchors, centers, yaw,
                                      with_translation=False)
    back = trajectory_coordinate_transform(
        rot[:, :, 0], centers, yaw, with_translation=False)
    np.testing.assert_allclose(np.asarray(back),
                               np.broadcast_to(np.asarray(anchors[0]),
                                               (1, 5, 3, 4, 2)),
                               atol=1e-4)
    emb = pos2posemb2d(norm_points(centers, PC), num_pos_feats=8)
    assert emb.shape == (1, 5, 16)
    g = bivariate_gaussian_activation(jnp.zeros((2, 5)))
    np.testing.assert_allclose(np.asarray(g), [[0, 0, 1, 1, 0]] * 2,
                               atol=1e-6)


def test_motion_head_shapes_and_loss():
    head = MotionHead(embed_dims=D, num_layers=2, num_anchor=2,
                      num_anchor_group=4, predict_steps=4, bev_h=BEV,
                      bev_w=BEV, pc_range=PC)
    rng = np.random.default_rng(1)
    a, m = 5, 6
    tq = jnp.asarray(rng.normal(size=(1, a, D)).astype(np.float32))
    labels = jnp.zeros((1, a), jnp.int32)
    centers = jnp.asarray(rng.uniform(-40, 40, (1, a, 2)).astype(np.float32))
    yaw = jnp.zeros((1, a))
    lane_q = jnp.asarray(rng.normal(size=(1, m, D)).astype(np.float32))
    bev = jnp.asarray(rng.normal(size=(1, BEV * BEV, D)).astype(np.float32))
    anchors = jnp.asarray(default_anchors(4, 2, 4))

    params = head.init(jax.random.PRNGKey(0), tq, labels, centers, yaw,
                       lane_q, lane_q, bev, anchors)
    out = head.apply(params, tq, labels, centers, yaw, lane_q, lane_q, bev,
                     anchors)
    assert out['all_traj_scores'].shape == (2, 1, a, 2)
    assert out['all_traj_preds'].shape == (2, 1, a, 2, 4, 5)
    # log-softmax scores
    np.testing.assert_allclose(
        np.exp(np.asarray(out['all_traj_scores'][0, 0])).sum(-1), 1.0,
        atol=1e-4)

    gt = jnp.asarray(rng.normal(size=(1, a, 4, 2)).astype(np.float32))
    valid = jnp.ones((1, a, 4))
    mask = jnp.ones((1, a))
    losses = traj_loss(out['all_traj_scores'][-1], out['all_traj_preds'][-1],
                       gt, valid, mask)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_traj_loss_picks_best_mode():
    t = 4
    gt = jnp.zeros((1, 1, t, 2))
    good = jnp.zeros((t, 5)).at[:, 2:4].set(0.0)  # mu=0 sig=1 (raw zeros)
    bad = jnp.ones((t, 5)) * 5.0
    trajs = jnp.stack([bad, good])[None, None]  # [1, 1, 2, T, 5]
    scores = jnp.log(jnp.asarray([[[0.5, 0.5]]]))
    out = traj_loss(scores, trajs, gt, jnp.ones((1, 1, t)), jnp.ones((1, 1)))
    assert float(out['l_minade']) < 1e-5
    assert float(out['l_mr']) == 0.0


def test_occ_head_shapes():
    head = OccHead(embed_dims=D, n_future=1, bev_h=BEV, bev_w=BEV,
                   bev_proj_dim=D, bev_proj_nlayers=2, num_trans_layers=2,
                   query_dim=D)
    rng = np.random.default_rng(2)
    bev = jnp.asarray(rng.normal(size=(1, BEV * BEV, D)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(1, 3, D)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev, q)
    out = head.apply(params, bev, q)
    assert out['ins_occ_logits'].shape == (1, 3, 2, BEV, BEV)
    assert out['mask_preds'].shape == (1, 3, 2, BEV, BEV)
    assert out['seg_out'].shape == (1, 2, BEV, BEV)

    tgt = (np.asarray(out['ins_occ_logits']) > 0).astype(np.float32)
    l1 = fiery_binary_seg_loss(out['ins_occ_logits'], jnp.asarray(tgt))
    l2 = dice_loss_with_masks(out['ins_occ_logits'], jnp.asarray(tgt))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_bev_feature_slicer_identity_and_resample():
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 8, 8, 4)).astype(np.float32))
    assert bev_feature_slicer(x, None, None) is x
    conf_a = dict(xbound=[-51.2, 51.2, 12.8], ybound=[-51.2, 51.2, 12.8],
                  zbound=[-10, 10, 20])
    conf_b = dict(xbound=[-50.0, 50.0, 12.5], ybound=[-50.0, 50.0, 12.5],
                  zbound=[-10, 10, 20])
    out = bev_feature_slicer(x, conf_a, conf_b)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_panseg_head_shapes_and_loss():
    head = PansegformerHead(embed_dims=D, num_query=12, num_enc_layers=2,
                            num_dec_layers=2, num_thing_mask_layers=2,
                            num_stuff_mask_layers=2, bev_h=BEV, bev_w=BEV,
                            feedforward=64)
    rng = np.random.default_rng(3)
    bev = jnp.asarray(rng.normal(size=(1, BEV * BEV, D)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev, with_masks=True)
    out = head.apply(params, bev, with_masks=True)
    assert out['outputs_classes'].shape == (2, 1, 12, 3)
    assert out['outputs_coords'].shape == (2, 1, 12, 4)
    assert float(np.asarray(out['outputs_coords']).min()) >= 0.0
    assert float(np.asarray(out['outputs_coords']).max()) <= 1.0

    masks = out['masks']
    k = head.num_mask_queries if head.num_mask_queries < 12 else 12
    assert masks['thing_masks'].shape == (1, k, BEV, BEV)
    assert masks['stuff_masks'].shape == (1, 1, BEV, BEV)

    gt_boxes = jnp.asarray([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1],
                            [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    gt_labels = jnp.asarray([0, 2, 0], jnp.int32)
    losses = panseg_loss_single(out['outputs_classes'][-1, 0],
                                out['outputs_coords'][-1, 0],
                                gt_labels, gt_boxes,
                                jnp.asarray(2, jnp.int32))
    for k in ('loss_cls', 'loss_bbox', 'loss_iou'):
        assert np.isfinite(float(losses[k])), k


def test_giou_identity():
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(giou(b, b)), [1.0], atol=1e-6)
    far = jnp.asarray([[2.0, 2.0, 3.0, 3.0]])
    assert float(giou(b, far)[0]) < 0.0


def test_planning_head_and_collision_optim():
    head = PlanningHeadSingleMode(embed_dims=D, planning_steps=6, bev_h=BEV,
                                  bev_w=BEV, use_col_optim=False)
    rng = np.random.default_rng(4)
    bev = jnp.asarray(rng.normal(size=(1, BEV * BEV, D)).astype(np.float32))
    traj_q = jnp.asarray(rng.normal(size=(2, 1, 3, D)).astype(np.float32))
    track_q = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    cmd = jnp.zeros((1,), jnp.int32)
    params = head.init(jax.random.PRNGKey(0), bev, None, None, traj_q,
                       track_q, cmd)
    out = head.apply(params, bev, None, None, traj_q, track_q, cmd)
    assert out['sdc_traj'].shape == (1, 6, 2)

    # collision optimization pushes waypoints away from occupied cells
    traj = jnp.asarray([[[0.5, 0.5]] * 6], jnp.float32)
    occ = np.zeros((1, 5, 200, 200), np.float32)
    occ[0, :, 100, 100] = 1.0  # cell center (0.25, 0.25)
    refined = collision_optimize(traj, jnp.asarray(occ))
    d_before = float(jnp.linalg.norm(
        traj[0, 0] - jnp.asarray([0.25, 0.25])))
    d_after = float(jnp.linalg.norm(
        refined[0, 0] - jnp.asarray([0.25, 0.25])))
    assert d_after > d_before
    assert np.isfinite(np.asarray(refined)).all()


def test_planning_and_collision_losses():
    traj = jnp.zeros((1, 6, 2))
    gt = jnp.ones((1, 6, 3))
    mask = jnp.ones((1, 6))
    l = planning_loss(traj, gt, mask)
    np.testing.assert_allclose(float(l), np.sqrt(2.0), atol=1e-5)

    corners = jnp.zeros((1, 6, 2, 4, 2))  # two agents sitting at origin
    corners = corners.at[..., 0, :].add(jnp.asarray([-1.0, -1.0]))
    corners = corners.at[..., 1, :].add(jnp.asarray([1.0, 1.0]))
    valid = jnp.ones((1, 6, 2))
    c = collision_loss(traj, gt * 0.0, mask, corners, valid)
    assert float(c) > 0.0  # ego box overlaps agents at origin


def test_metrics_accumulators():
    iou = IntersectionOverUnion(2)
    pred = np.zeros((4, 4), np.int64)
    pred[:2] = 1
    iou.update(pred, pred)
    np.testing.assert_allclose(iou.compute(), [1.0, 1.0])

    pan = PanopticMetric()
    inst = np.zeros((2, 4, 4), np.int64)
    inst[:, :2, :2] = 1
    pan.update(inst, inst)
    res = pan.compute()
    assert res['pq'][1] > 0.99

    pm = PlanningMetric(n_future=6)
    trajs = np.zeros((1, 6, 3))
    seg = np.zeros((1, 6, 200, 200))
    pm.update(trajs, trajs.copy(), np.ones((1, 6)), seg)
    out = pm.compute()
    np.testing.assert_allclose(out['L2'], 0.0)
    np.testing.assert_allclose(out['obj_box_col'], 0.0)

    mm = MotionMetric()
    tr = np.zeros((2, 3, 4, 2))
    sc = np.zeros((2, 3))
    gt = np.zeros((2, 4, 2))
    mm.update(tr, sc, gt, np.ones((2, 4)))
    res = mm.compute()
    assert res['minADE'] == 0.0 and res['MR'] == 0.0 and res['EPA'] == 1.0


def test_motion_smoother_tracks_reference():
    n = 6
    t = np.arange(n + 1) * 0.5
    ref = np.stack([4.0 * t, np.zeros_like(t),
                    np.zeros_like(t)], -1)  # straight 4 m/s
    sm = MotionNonlinearSmoother(trajectory_len=n, dt=0.5)
    sm.set_reference_trajectory([0.0, 0.0, 0.0, 4.0], ref)
    sol = sm.solve()
    x = sol.value(sm.position_x)
    y = sol.value(sm.position_y)
    np.testing.assert_allclose(x, ref[:, 0], atol=0.3)
    np.testing.assert_allclose(y, ref[:, 1], atol=0.3)


def test_nonlinear_smoother_gating():
    # static agent: returned trajectory must be the plain gt offsets
    gt_boxes = np.zeros((1, 7))
    fut = np.zeros((1, 12, 2))
    mask = np.ones((1, 12, 2))
    bbox = np.zeros((1, 9))
    out, m = nonlinear_smoother(gt_boxes, fut, mask, bbox)
    assert out.shape == (1, 12, 2)
    np.testing.assert_allclose(out, 0.0, atol=1e-9)
