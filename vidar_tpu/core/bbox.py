"""3D bbox core for the detection fine-tune path (jittable).

Capability match for reference projects/mmdet3d_plugin/core/bbox/:
  * normalize_bbox / denormalize_bbox  (util.py:4-55)
  * HungarianAssigner3D with FocalLossCost + BBox3DL1Cost
    (assigners/hungarian_assigner_3d.py:17-135) — the LAP itself runs via
    ``jax.pure_callback`` into scipy (the reference also solves it on CPU),
    with padded-GT masking for static shapes.
  * NMSFreeCoder top-k decode (coders/nms_free_coder.py:10-122)
  * sigmoid focal loss + weighted L1 (the mmdet losses the head builds).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 9] (cx cy cz w l h rot vx vy) -> [..., 10] network format."""
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    vx = bboxes[..., 7:8]
    vy = bboxes[..., 8:9]
    return jnp.concatenate(
        [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot), vx, vy], axis=-1)


def denormalize_bbox(nb: jnp.ndarray) -> jnp.ndarray:
    """[..., 10] network format -> [..., 9] (cx cy cz w l h rot vx vy)."""
    rot = jnp.arctan2(nb[..., 6:7], nb[..., 7:8])
    cx, cy, cz = nb[..., 0:1], nb[..., 1:2], nb[..., 4:5]
    w = jnp.exp(nb[..., 2:3])
    l = jnp.exp(nb[..., 3:4])
    h = jnp.exp(nb[..., 5:6])
    return jnp.concatenate([cx, cy, cz, w, l, h, rot,
                            nb[..., 8:9], nb[..., 9:10]], axis=-1)


def sigmoid_focal_loss(logits, labels, num_classes: int,
                       alpha: float = 0.25, gamma: float = 2.0):
    """Per-element focal loss; ``labels == num_classes`` is background.

    Returns [..., num_classes] elementwise losses (sum = mmdet behaviour).
    """
    onehot = jax.nn.one_hot(labels, num_classes)
    p = jax.nn.sigmoid(logits)
    ce = (-onehot * jax.nn.log_sigmoid(logits) -
          (1 - onehot) * jax.nn.log_sigmoid(-logits))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def focal_loss_cost(cls_logits, gt_labels, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-12,
                    weight: float = 2.0):
    """mmdet FocalLossCost: cost[q, g] = pos_cost[q, label_g] - neg_cost[q, label_g]."""
    scores = jax.nn.sigmoid(cls_logits)  # [Q, C]
    neg_cost = (1 - alpha) * (scores ** gamma) * (-jnp.log(1 - scores + eps))
    pos_cost = alpha * ((1 - scores) ** gamma) * (-jnp.log(scores + eps))
    cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]  # [Q, G]
    return cost * weight


def bbox3d_l1_cost(bbox_pred, gt_normalized, weight: float = 0.25):
    """cdist-L1 over the first 8 code dims (reference :115-119)."""
    diff = jnp.abs(bbox_pred[:, None, :8] - gt_normalized[None, :, :8])
    return diff.sum(-1) * weight


def _lap_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """scipy LAP over the first n_valid columns; returns per-query gt index
    (-1 = unassigned)."""
    from scipy.optimize import linear_sum_assignment
    q = cost.shape[0]
    out = np.full((q,), -1, np.int32)
    n = int(n_valid)
    if n > 0:
        rows, cols = linear_sum_assignment(cost[:, :n])
        out[rows] = cols.astype(np.int32)
    return out


def auction_assign(cost: jnp.ndarray, num_valid_gt: jnp.ndarray,
                   eps_scale: float = 1e-3, max_iters: int = 512):
    """Jittable auction algorithm for the (tall) LAP.

    GTs bid for queries over value = -cost; epsilon-scaling single pass.
    Near-optimal (within G*eps of the optimum) — used where host callbacks
    are unavailable. cost [Q, G]; returns [Q] int32 gt index or -1.
    """
    qn, g = cost.shape
    value = -cost.T  # [G, Q] bidder-major
    rng_span = jnp.maximum(jnp.max(value) - jnp.min(value), 1.0)
    eps = rng_span * eps_scale

    gt_valid = jnp.arange(g) < num_valid_gt

    def body(state):
        prices, owner, it = state  # owner: [Q] int32 gt or -1
        assigned = jnp.zeros((g,), bool).at[
            jnp.where(owner >= 0, owner, g)].set(True, mode='drop')
        net = value - prices[None, :]  # [G, Q]
        best_q = jnp.argmax(net, axis=1)
        best_v = jnp.max(net, axis=1)
        net2 = net.at[jnp.arange(g), best_q].set(-jnp.inf)
        second_v = jnp.max(net2, axis=1)
        bid = best_v - second_v + eps

        bidder_mask = gt_valid & ~assigned
        # highest bid per query wins (resolve via scatter-max over bids)
        bid_amount = jnp.where(bidder_mask, bid, -jnp.inf)
        winners_bid = jnp.full((qn,), -jnp.inf).at[best_q].max(
            bid_amount, mode='drop')
        is_winner = bidder_mask & (bid_amount >= winners_bid[best_q]) & \
            jnp.isfinite(bid_amount)
        # break ties: lowest gt index wins
        winner_gt = jnp.full((qn,), g, jnp.int32).at[best_q].min(
            jnp.where(is_winner, jnp.arange(g), g), mode='drop')
        has_winner = winner_gt < g

        # displace previous owners of contested queries
        owner = jnp.where(has_winner, winner_gt, owner)
        prices = jnp.where(has_winner,
                           prices + jnp.maximum(winners_bid, eps), prices)
        return prices, owner, it + 1

    def cond(state):
        prices, owner, it = state
        assigned = jnp.zeros((g,), bool).at[
            jnp.where(owner >= 0, owner, g)].set(True, mode='drop')
        unassigned = (gt_valid & ~assigned).any()
        return unassigned & (it < max_iters)

    init = (jnp.zeros((qn,)), jnp.full((qn,), -1, jnp.int32),
            jnp.zeros((), jnp.int32))
    _, owner, _ = jax.lax.while_loop(cond, body, init)
    return owner


def hungarian_assign(cost: jnp.ndarray, num_valid_gt: jnp.ndarray,
                     impl: str = 'auto'):
    """Padded LAP: scipy on host (exact, reference parity) when host
    callbacks are available, jittable auction otherwise.

    cost: [Q, G_max]; num_valid_gt: [] int32. Returns [Q] int32 gt index or -1.
    """
    # the assignment is discrete: no gradient flows through it (the reference
    # detaches via no-grad target building, bevformer_head.py get_targets)
    cost = jax.lax.stop_gradient(cost)
    if impl == 'auction' or (impl == 'auto' and _no_host_callbacks()):
        return auction_assign(cost, num_valid_gt)
    q = cost.shape[0]
    return jax.pure_callback(
        _lap_host, jax.ShapeDtypeStruct((q,), jnp.int32),
        cost, num_valid_gt, vmap_method='sequential')


def _no_host_callbacks() -> bool:
    """axon-tunnelled TPUs don't support jax host callbacks."""
    try:
        return jax.devices()[0].platform == 'axon'
    except Exception:
        return False


def nms_free_decode(cls_logits, bbox_preds, *, max_num: int = 300,
                    num_classes: int = 10,
                    post_center_range: Sequence[float] = (
                        -61.2, -61.2, -10.0, 61.2, 61.2, 10.0)):
    """Top-k decode of one sample (reference nms_free_coder.py:41-100).

    cls_logits [Q, C], bbox_preds [Q, 10] ->
    dict(bboxes [K, 9], scores [K], labels [K], valid [K]).
    """
    scores = jax.nn.sigmoid(cls_logits).reshape(-1)
    top_scores, idx = jax.lax.top_k(scores, min(max_num, scores.size))
    labels = idx % num_classes
    box_idx = idx // num_classes
    boxes = denormalize_bbox(bbox_preds[box_idx])
    pcr = jnp.asarray(post_center_range)
    valid = (jnp.all(boxes[:, :3] >= pcr[:3], -1) &
             jnp.all(boxes[:, :3] <= pcr[3:], -1))
    return dict(bboxes=boxes, scores=top_scores, labels=labels, valid=valid)
