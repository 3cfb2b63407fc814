"""Detection head: forward shapes, Hungarian matching, loss/decode sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.models.detection import BEVFormerHead
from vidar_tpu.core import bbox as bbox_core


def test_hungarian_assign_identity():
    # cost strongly favouring q_i <-> gt_i
    q, g = 6, 3
    cost = np.full((q, g), 10.0, np.float32)
    for i in range(g):
        cost[i, i] = 0.0
    out = np.asarray(bbox_core.hungarian_assign(
        jnp.asarray(cost), jnp.asarray(3)))
    assert (out[:3] == np.arange(3)).all()
    assert (out[3:] == -1).all()


def test_auction_matches_scipy_cost():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(0)
    q, g = 40, 7
    cost = rng.uniform(0, 10, (q, g)).astype(np.float32)
    owner = np.asarray(bbox_core.auction_assign(
        jnp.asarray(cost), jnp.asarray(g)))
    # every gt assigned to exactly one query
    assigned = owner[owner >= 0]
    assert len(assigned) == g and len(set(assigned)) == g
    total = sum(cost[i, owner[i]] for i in range(q) if owner[i] >= 0)
    rows, cols = linear_sum_assignment(cost[:, :g])
    opt = cost[rows, cols].sum()
    assert total <= opt + 0.05 * g, (total, opt)


def test_normalize_denormalize_roundtrip():
    rng = np.random.default_rng(0)
    boxes = np.concatenate([
        rng.uniform(-50, 50, (7, 3)),      # cx cy cz
        rng.uniform(0.5, 5.0, (7, 3)),     # w l h
        rng.uniform(-np.pi, np.pi, (7, 1)),
        rng.uniform(-3, 3, (7, 2)),
    ], -1).astype(np.float32)
    norm = bbox_core.normalize_bbox(jnp.asarray(boxes))
    rec = np.asarray(bbox_core.denormalize_bbox(norm))
    np.testing.assert_allclose(rec, boxes, rtol=1e-4, atol=1e-4)


def test_head_forward_loss_decode():
    head = BEVFormerHead(num_classes=4, num_query=32, embed_dims=32,
                         bev_h=8, bev_w=8, num_decoder_layers=2,
                         bbox_coder_max_num=16)
    bev = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 32)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    assert preds['all_cls_scores'].shape == (2, 1, 32, 4)
    assert preds['all_bbox_preds'].shape == (2, 1, 32, 10)

    gt_boxes = jnp.asarray([[[1.0, 2.0, 0.0, 2.0, 4.0, 1.5, 0.3, 0.0, 0.0],
                             [0.0] * 9]])
    gt_labels = jnp.asarray([[1, 0]], jnp.int32)
    n_valid = jnp.asarray([1], jnp.int32)
    losses = head.apply(params, preds, gt_boxes, gt_labels, n_valid,
                        method=head.loss)
    assert 'loss_cls' in losses and 'd0.loss_cls' in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = head.apply(params, preds, method=head.get_bboxes)
    assert det['bboxes'].shape == (1, 16, 9)
    assert det['scores'].shape == (1, 16)
