"""FreeAnchor bag-loss oracle: an independent torch implementation written
to the mmdet3d free_anchor3d_head structure (per-image loop, sparse box
prob, topk bags, mean-max) compared against the fixed-shape JAX loss in
``models/bev_head.Anchor3DHead`` (reference dense_heads/bev_head.py:28
delegates to mmdet3d's FreeAnchor3DHead)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.models.bev_head import Anchor3DHead

TOPK = 8
BBOX_THR = 0.6
GAMMA = 2.0
ALPHA = 0.5


def _aa(xy, dx, dy):
    return np.concatenate([xy - np.stack([dx, dy], -1) / 2,
                           xy + np.stack([dx, dy], -1) / 2], -1)


def _iou_np(b1, b2):
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1]))[:, None]
    a2 = ((b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1]))[None, :]
    return inter / np.maximum(a1 + a2 - inter, 1e-6)


def torch_free_anchor(cls_l, reg_p, dir_l, anchors, gt, labels, k):
    """Per-image torch oracle, mmdet3d free_anchor3d_head.py loss structure
    (variable shapes, python loops — no masking tricks)."""
    import torch
    cls_l = torch.as_tensor(cls_l)
    reg_p = torch.as_tensor(reg_p)
    dir_l = torch.as_tensor(dir_l)
    anchors_t = torch.as_tensor(anchors)
    gt_t = torch.as_tensor(gt)
    labels_t = torch.as_tensor(labels)
    n = anchors.shape[0]
    g = gt.shape[0]

    cls_prob = torch.sigmoid(cls_l)
    a_diag = torch.sqrt(anchors_t[:, 3] ** 2 + anchors_t[:, 4] ** 2)
    pred_xy = anchors_t[:, :2] + reg_p[:, :2] * a_diag[:, None]
    pred_lw = anchors_t[:, 3:5] * torch.exp(reg_p[:, 3:5])
    pred_aa = torch.as_tensor(_aa(pred_xy.numpy(), pred_lw[:, 0].numpy(),
                                  pred_lw[:, 1].numpy()))
    gt_aa = torch.as_tensor(_aa(gt[:, :2], gt[:, 4], gt[:, 3]))
    anchor_aa = torch.as_tensor(_aa(anchors[:, :2], anchors[:, 3],
                                    anchors[:, 4]))

    if g == 0:
        box_prob = torch.zeros(n, k, dtype=cls_prob.dtype)
        pos_loss = torch.zeros(())
    else:
        iou = torch.as_tensor(_iou_np(gt_aa.numpy(), pred_aa.numpy()))
        t1 = BBOX_THR
        # f32-safe eps (mmdet3d's 1e-12 underflows the gap at t1~0.6)
        t2 = iou.max(dim=1, keepdim=True).values.clamp(min=t1 + 1e-6)
        obj_box_prob = ((iou - t1) / (t2 - t1).clamp(min=1e-6)).clamp(0, 1)
        # sparse image-level box prob: per (anchor, class) max over gts
        box_prob = torch.zeros(n, k, dtype=cls_prob.dtype)
        for gi in range(g):
            c = int(labels[gi])
            box_prob[:, c] = torch.maximum(box_prob[:, c], obj_box_prob[gi])

        qual = torch.as_tensor(_iou_np(gt_aa.numpy(), anchor_aa.numpy()))
        _, matched = torch.topk(qual, TOPK, dim=1)
        pos_losses = []
        for gi in range(g):
            m = matched[gi]
            m_cls = cls_prob[m, int(labels[gi])]
            a_sel = anchors_t[m]
            diag = torch.sqrt(a_sel[:, 3] ** 2 + a_sel[:, 4] ** 2)
            t_xyz = (gt_t[gi, :3] - a_sel[:, :3]) / diag.clamp(
                min=1e-3)[:, None]
            t_dim = torch.log((gt_t[gi, [4, 3, 5]] /
                               a_sel[:, 3:6]).clamp(min=1e-3))
            t_yaw = (gt_t[gi, 6] - a_sel[:, 6])[:, None]
            t_vel = gt_t[gi, 7:9].expand(TOPK, 2)
            tgt = torch.cat([t_xyz, t_dim, t_yaw, t_vel], -1)
            diff = (reg_p[m] - tgt).abs()
            sl1 = torch.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5)
            loss_bbox = sl1.sum(-1)
            dir_tgt = int(gt[gi, 6] > 0)
            ce = -torch.log_softmax(dir_l[m], dim=-1)[:, dir_tgt]
            m_prob = m_cls * torch.exp(-(loss_bbox + ce))
            w = 1.0 / (1.0 - m_prob).clamp(min=1e-12)
            w = w / w.sum()
            bag = (w * m_prob).sum()
            pos_losses.append(-ALPHA * torch.log(bag.clamp(1e-12, 1.0)))
        pos_loss = torch.stack(pos_losses).sum() / max(g, 1)

    neg_prob = cls_prob * (1 - box_prob)
    neg = ((1 - ALPHA) * neg_prob ** GAMMA *
           -torch.log((1 - neg_prob).clamp(min=1e-12)))
    neg_loss = neg.sum() / max(g * TOPK, 1)
    return float(pos_loss), float(neg_loss)


@pytest.mark.parametrize('nv', [3, 1, 0])
def test_free_anchor_matches_torch_oracle(nv):
    torch = pytest.importorskip('torch')
    del torch
    rng = np.random.default_rng(0)
    head = Anchor3DHead(num_classes=4, embed_dims=16,
                        pc_range=(-8, -8, -5, 8, 8, 3),
                        assigner='free_anchor', pre_anchor_topk=TOPK,
                        bbox_thr=BBOX_THR, fa_gamma=GAMMA, fa_alpha=ALPHA)
    h = w = 8
    n = h * w * head.num_anchors
    g = 5
    cls_l = rng.standard_normal((1, n, 4)).astype(np.float32)
    reg_p = (rng.standard_normal((1, n, 9)) * 0.2).astype(np.float32)
    dir_l = rng.standard_normal((1, n, 2)).astype(np.float32)
    gt = np.zeros((1, g, 9), np.float32)
    gt[0, :, :2] = rng.uniform(-6, 6, (g, 2))
    gt[0, :, 2] = -1.0
    gt[0, :, 3:6] = rng.uniform(1.0, 4.0, (g, 3))
    gt[0, :, 6] = rng.uniform(-np.pi, np.pi, g)
    labels = rng.integers(0, 4, (1, g)).astype(np.int32)

    preds = (jnp.asarray(cls_l), jnp.asarray(reg_p), jnp.asarray(dir_l),
             (h, w))
    losses = head.loss(preds, jnp.asarray(gt), jnp.asarray(labels),
                       jnp.asarray([nv], jnp.int32))

    anchors = np.asarray(head.anchors(h, w).reshape(-1, 7))
    pos_t, neg_t = torch_free_anchor(cls_l[0], reg_p[0], dir_l[0], anchors,
                                     gt[0, :nv], labels[0, :nv], k=4)
    assert float(losses['positive_bag_loss']) == pytest.approx(pos_t,
                                                               rel=1e-4)
    assert float(losses['negative_bag_loss']) == pytest.approx(neg_t,
                                                               rel=1e-4)


def test_free_anchor_grads_finite():
    rng = np.random.default_rng(1)
    head = Anchor3DHead(num_classes=3, embed_dims=8,
                        pc_range=(-8, -8, -5, 8, 8, 3),
                        assigner='free_anchor', pre_anchor_topk=4)
    h = w = 4
    n = h * w * head.num_anchors
    gt = np.zeros((1, 2, 9), np.float32)
    gt[0, :, 3:6] = 2.0
    gt[0, 0, :2] = (1.0, -1.0)

    def f(x):
        preds = (x[..., :3], x[..., 3:12], x[..., 12:14], (h, w))
        losses = head.loss(preds, jnp.asarray(gt),
                           jnp.zeros((1, 2), jnp.int32),
                           jnp.asarray([2], jnp.int32))
        return losses['positive_bag_loss'] + losses['negative_bag_loss']

    x = jnp.asarray(rng.standard_normal((1, n, 14)) * 0.1, jnp.float32)
    val, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
