"""Torch-oracle parity for the loss stacks (VERDICT r1 item 8).

* ViDARHead.loss CE path — re-anchoring 4x4 chains, voxelization, ray
  waypoint sampling via torch's own 5D grid_sample, CE along the ray,
  channel gating (reference vidar_head_v1.py:94-219,
  vidar_head_base.py:420-509,586-592).
* BEVFormerHead loss — scipy Hungarian on focal+L1 costs, sigmoid focal
  classification with num_pos averaging, code-weighted L1
  (reference dense_heads/bevformer_head.py:325-482).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vidar_tpu.models.vidar_head import ViDARHead

NEG_INF = -1e9


# --------------------------------------------------------------- ViDAR head

def _rand_se3(rng, scale=0.5):
    th = rng.uniform(-0.2, 0.2)
    c, s = np.cos(th), np.sin(th)
    m = np.eye(4, dtype=np.float64)
    m[:2, :2] = [[c, s], [-s, c]]
    m[3, :3] = rng.uniform(-scale, scale, 3)  # row-vector translation
    return m


def torch_vidar_ce_loss(sigma_per_channel, gt_points, gt_tindex, cur2ref,
                        ref2cur, num_rollout, full_prev, cfg):
    """Reference ray-CE path in torch (vidar_head_v1.py:150-219)."""
    hq = cfg['hq']
    ph = cfg['pred_hist']
    bev_h, bev_w, zdim = cfg['bev_h'], cfg['bev_w'], cfg['z']
    pc = cfg['pc_range']
    g = cfg['ray_grid_num']
    step = cfg['ray_grid_step']
    lw = np.asarray(cfg['loss_weight'], np.float32)[:, 0]
    pf = cfg['per_frame_loss_weight']
    channels = sigma_per_channel.shape[0]
    cur = ph
    losses = {}
    for ch in range(channels):
        sigma = torch.from_numpy(sigma_per_channel[ch].copy()).float()
        v, bs, n, _ = sigma.shape
        vol = sigma.permute(1, 0, 3, 2).reshape(bs, v, zdim, bev_h, bev_w)

        start = hq - ph + ch
        src = torch.from_numpy(cur2ref[:, start:start + num_rollout].copy())
        tgt = torch.from_numpy(ref2cur[:, hq:hq + num_rollout].copy())
        s2t = torch.einsum('bvij,bvjk->bvik', src, tgt).float()

        ti = torch.from_numpy(gt_tindex.copy())
        v_idx = ti - start
        valid = (v_idx >= 0) & (v_idx < num_rollout) & (ti >= 0)
        v_safe = v_idx.clamp(0, num_rollout - 1)
        mats = torch.stack([s2t[b, v_safe[b]] for b in range(bs)])
        gp = torch.from_numpy(gt_points.copy()).float()
        homo = torch.cat([gp, torch.ones_like(gp[..., :1])], -1)
        pts = torch.einsum('bpj,bpjk->bpk', homo, mats)[..., :3]
        origins = s2t[:, :, 3, :3]  # row [0,0,0,1] @ mat

        def to_grid(xyz):
            gx = (xyz[..., 0] - pc[0]) / (pc[3] - pc[0]) * bev_w
            gy = (xyz[..., 1] - pc[1]) / (pc[4] - pc[1]) * bev_h
            gz = (xyz[..., 2] - pc[2]) / (pc[5] - pc[2]) * zdim
            return torch.stack([gx, gy, gz], -1)

        gt_g = to_grid(pts)
        org_g = to_grid(origins)
        fi_safe = v_safe[..., None]
        origin = torch.gather(org_g, 1,
                              fi_safe.expand(-1, -1, 3))  # [bs, P, 3]
        r = gt_g - origin
        rn = r / torch.sqrt((r ** 2).sum(-1, keepdim=True).clamp(min=1e-12))
        steps = (torch.arange(g).float() + 0.5) * step
        march = origin[:, :, None] + rn[:, :, None] * steps[None, None, :,
                                                           None]
        way = torch.cat([gt_g[:, :, None], march], 2)  # [bs, P, G+1, 3]
        lengths = torch.sqrt(((way - origin[:, :, None]) ** 2).sum(-1))

        size = torch.tensor([bev_w, bev_h, zdim], dtype=torch.float32)
        normc = way / size * 2 - 1
        outside = ((normc <= -1) | (normc >= 1)).any(-1)
        ray_valid = ((normc[:, :, 0] > -1) & (normc[:, :, 0] < 1)).all(-1)

        # frame-indexed trilinear sampling with torch's 5D grid_sample
        feats = torch.zeros(way.shape[:3])
        for b in range(bs):
            for f in range(num_rollout):
                sel = (v_idx[b] == f) & (ti[b] >= 0)
                if not sel.any():
                    continue
                grid = normc[b, sel][None, None]      # [1, 1, Pf, G+1, 3]
                out = F.grid_sample(vol[b, f][None, None], grid,
                                    mode='bilinear', padding_mode='zeros',
                                    align_corners=False)
                feats[b, sel] = out[0, 0, 0]
        feats = torch.where(outside, torch.tensor(NEG_INF), feats)

        if ch != cur:
            fw = np.zeros_like(lw)
            fw[0] = 1.0
        else:
            fw = lw
        fw_t = torch.from_numpy(fw[:num_rollout].copy())
        ray_w = torch.where(valid, fw_t[v_safe], torch.tensor(0.0))
        ray_w = ray_w * ray_valid.float()

        gate = 1.0 if (full_prev or ch == cur) else 0.0
        scale = pf[ch] * gate
        ce = torch.logsumexp(feats, -1) - feats[..., 0]
        loss = (ce * ray_w).sum() / ray_w.sum().clamp(min=1.0)
        losses[f'frame.{ch}.regularization.loss.loss'] = float(loss) * scale
    return losses


def test_vidar_head_ce_loss_matches_torch_oracle():
    rng = np.random.default_rng(0)
    bs, bev_h, bev_w, zdim = 1, 8, 8, 4
    hq, ph, pfut, vroll = 2, 1, 1, 2
    channels = 1 + ph + pfut
    n, p = bev_h * bev_w, 64
    tq = hq + vroll + 2
    pc_range = (-8.0, -8.0, -2.0, 8.0, 8.0, 2.0)

    sigma = rng.standard_normal((channels, vroll, bs, n, zdim)) \
        .astype(np.float32)
    gt_points = rng.uniform(-7, 7, (bs, p, 3)).astype(np.float32)
    gt_points[..., 2] = rng.uniform(-1.5, 1.5, (bs, p))
    gt_tindex = rng.integers(-1, tq, (bs, p)).astype(np.int32)
    cur2ref = np.stack([[_rand_se3(rng) for _ in range(tq)]
                        for _ in range(bs)])
    ref2cur = np.linalg.inv(cur2ref)
    # keep the row-vector convention: inverse of each 4x4 in the same layout
    cur2ref = cur2ref.astype(np.float32)
    ref2cur = ref2cur.astype(np.float32)

    cfg = dict(hq=hq, pred_hist=ph, bev_h=bev_h, bev_w=bev_w, z=zdim,
               pc_range=pc_range, ray_grid_num=12, ray_grid_step=0.5,
               loss_weight=((1.0,), (0.5,)),
               per_frame_loss_weight=(0.4, 1.0, 1.2))

    head = ViDARHead(
        embed_dims=32, bev_h=bev_h, bev_w=bev_w, pc_range=pc_range,
        num_pred_height=zdim, history_queue_length=hq,
        pred_history_frame_num=ph, pred_future_frame_num=pfut,
        per_frame_loss_weight=cfg['per_frame_loss_weight'],
        loss_weight=cfg['loss_weight'], ray_grid_num=12, ray_grid_step=0.5,
        use_ce_loss=True, use_dist_loss=False, use_dense_loss=False,
        decoder_num_layers=1)

    args = (jnp.asarray(sigma), jnp.asarray(gt_points),
            jnp.asarray(gt_tindex), jnp.asarray(cur2ref),
            jnp.asarray(ref2cur), vroll, jnp.asarray(True))
    variables = head.init(jax.random.PRNGKey(0), *args, method=head.loss)
    for full_prev in (True, False):
        got = head.apply(variables, jnp.asarray(sigma),
                         jnp.asarray(gt_points), jnp.asarray(gt_tindex),
                         jnp.asarray(cur2ref), jnp.asarray(ref2cur), vroll,
                         jnp.asarray(full_prev), method=head.loss)
        want = torch_vidar_ce_loss(sigma, gt_points, gt_tindex, cur2ref,
                                   ref2cur, vroll, full_prev, cfg)
        assert set(want) == {k for k in got
                             if k.endswith('regularization.loss.loss')}
        for k, v in want.items():
            np.testing.assert_allclose(float(got[k]), v, atol=1e-4,
                                       rtol=1e-4), k


# ------------------------------------------------------------ detection head

def torch_det_loss_single(cls_scores, bbox_preds, gt_bboxes, gt_labels,
                          num_valid, num_classes, code_weights,
                          cls_w=2.0, bbox_w=0.25):
    """Reference BEVFormerHead loss_single (bevformer_head.py:325-432)."""
    from scipy.optimize import linear_sum_assignment
    bs, q, _ = cls_scores.shape
    gmax = gt_bboxes.shape[1]

    def normalize(b):
        return np.concatenate([
            b[..., 0:2], np.log(b[..., 3:5]), b[..., 2:3],
            np.log(b[..., 5:6]), np.sin(b[..., 6:7]), np.cos(b[..., 6:7]),
            b[..., 7:9]], -1)

    total_cls = 0.0
    total_bbox = 0.0
    num_pos_total = 0
    per_sample = []
    for b in range(bs):
        n = int(num_valid[b])
        gt_n = normalize(gt_bboxes[b])
        scores = 1 / (1 + np.exp(-cls_scores[b]))
        alpha, gamma, eps = 0.25, 2.0, 1e-12
        neg = (1 - alpha) * scores ** gamma * (-np.log(1 - scores + eps))
        pos = alpha * (1 - scores) ** gamma * (-np.log(scores + eps))
        cost_cls = (pos[:, gt_labels[b]] - neg[:, gt_labels[b]]) * cls_w
        cost_reg = np.abs(bbox_preds[b][:, None, :8] -
                          gt_n[None, :, :8]).sum(-1) * bbox_w
        cost = cost_cls + cost_reg
        assigned = np.full((q,), -1, np.int64)
        if n > 0:
            rows, cols = linear_sum_assignment(cost[:, :n])
            assigned[rows] = cols
        per_sample.append((assigned, gt_n))
        num_pos_total += (assigned >= 0).sum()

    num_pos = max(num_pos_total, 1.0)
    for b in range(bs):
        assigned, gt_n = per_sample[b]
        labels = np.where(assigned >= 0,
                          gt_labels[b][np.clip(assigned, 0, gmax - 1)],
                          num_classes)
        onehot = np.eye(num_classes)[np.clip(labels, 0, num_classes - 1)]
        onehot[labels == num_classes] = 0
        logits = cls_scores[b]
        pr = 1 / (1 + np.exp(-logits))
        ce = -(onehot * np.log(pr + 1e-12) +
               (1 - onehot) * np.log(1 - pr + 1e-12))
        p_t = pr * onehot + (1 - pr) * (1 - onehot)
        alpha_t = 0.25 * onehot + 0.75 * (1 - onehot)
        total_cls += (alpha_t * (1 - p_t) ** 2 * ce).sum()

        tgt = gt_n[np.clip(assigned, 0, gmax - 1)]
        fin = np.isfinite(tgt).all(-1) & (assigned >= 0)
        l1 = np.abs(bbox_preds[b] - tgt) * np.asarray(code_weights)
        total_bbox += (l1 * fin[:, None]).sum()
    return total_cls * 2.0 / num_pos, total_bbox * 0.25 / num_pos


def test_det_head_loss_matches_torch_oracle():
    from vidar_tpu.core import bbox as bbox_core
    rng = np.random.default_rng(1)
    bs, q, gmax, ncls = 2, 24, 6, 10
    code_weights = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2)
    cls_scores = rng.standard_normal((bs, q, ncls)).astype(np.float32)
    bbox_preds = rng.standard_normal((bs, q, 10)).astype(np.float32)
    gt = np.zeros((bs, gmax, 9), np.float32)
    gt[..., :3] = rng.uniform(-5, 5, (bs, gmax, 3))
    gt[..., 3:6] = rng.uniform(0.5, 3.0, (bs, gmax, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (bs, gmax))
    gt[..., 7:9] = rng.uniform(-2, 2, (bs, gmax, 2))
    gt_labels = rng.integers(0, ncls, (bs, gmax)).astype(np.int32)
    num_valid = np.asarray([4, 6], np.int32)

    from vidar_tpu.models.detection import BEVFormerHead
    head = BEVFormerHead(num_classes=ncls, num_query=q,
                         code_weights=code_weights)
    gl, bl = head._loss_single(
        jnp.asarray(cls_scores), jnp.asarray(bbox_preds),
        jnp.asarray(gt), jnp.asarray(gt_labels), jnp.asarray(num_valid))

    want_cls, want_bbox = torch_det_loss_single(
        cls_scores, bbox_preds, gt, gt_labels, num_valid, ncls,
        code_weights)
    np.testing.assert_allclose(float(gl), want_cls, rtol=1e-4)
    np.testing.assert_allclose(float(bl), want_bbox, rtol=1e-4)
