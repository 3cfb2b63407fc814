"""Planning head: single-mode ego trajectory + collision optimization.

Layer-for-layer TPU-native counterpart of
UniAD/projects/mmdet3d_plugin/uniad/dense_heads/planning_head.py:17-250,
planning_head_plugin/collision_optimization.py:16-116 and
losses/planning_loss.py:16-110.

TPU re-design of the collision post-process: the reference extracts
occupied pixels with ``torch.nonzero`` and solves an IPOPT problem on the
host (casadi). Here the same objective — tracking L2 + Gaussian collision
potential — is minimized by a fixed-iteration gradient descent directly on
device over the dense occupancy grid (no dynamic shapes, no host round
trip); see :func:`collision_optimize`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import TorchLinear
from .blocks import TorchDecoder, LinLNReLU
from .functional import bivariate_gaussian_activation


class PlanningHeadSingleMode(nn.Module):
    """Command-conditioned ego planner (planning_head.py:17-201)."""
    embed_dims: int = 256
    planning_steps: int = 6
    bev_h: int = 200
    bev_w: int = 200
    with_adapter: bool = True
    use_col_optim: bool = True
    occ_filter_range: float = 5.0
    sigma: float = 1.0
    alpha_collision: float = 5.0
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.embed_dims
        self.navi_embed = self.param('navi_embed',
                                     nn.initializers.normal(1.0), (3, d))
        self.pos_embed = self.param('pos_embed',
                                    nn.initializers.normal(1.0), (1, d))
        self.mlp_fuser = _MLPFuser(d, dtype=self.dtype, name='mlp_fuser')
        self.attn_module = TorchDecoder(3, d, 8, d * 2, dropout=0.1,
                                        dtype=self.dtype, name='attn_module')
        self.reg_fc0 = TorchLinear(d, dtype=self.dtype, name='reg_fc0')
        self.reg_fc1 = TorchLinear(self.planning_steps * 2, dtype=self.dtype,
                                   name='reg_fc1')
        if self.with_adapter:
            self.bev_adapter = [
                _AdapterBlock(d, dtype=self.dtype, name=f'bev_adapter_{i}')
                for i in range(3)]

    def __call__(self, bev, occ_mask, bev_pos, sdc_traj_query,
                 sdc_track_query, command, *, deterministic: bool = True):
        """
        Args:
          bev: [B, HW, D]; bev_pos: [B, HW, D] positional map (or None).
          occ_mask: [B, T_occ, H, W] occupancy (test-time collision optim)
            or None.
          sdc_traj_query: [L, B, P, D] per-layer SDC motion queries (the
            last layer is used); sdc_track_query: [B, D].
          command: [B] int in {0, 1, 2}.
        """
        sdc_track_query = jax.lax.stop_gradient(sdc_track_query)
        traj_q = sdc_traj_query[-1]  # [B, P, D]
        bs, p, d = traj_q.shape
        track_q = jnp.broadcast_to(sdc_track_query[:, None], (bs, p, d))
        navi = self.navi_embed[command]  # [B, D]
        navi = jnp.broadcast_to(navi[:, None], (bs, p, d))
        plan_q = self.mlp_fuser(jnp.concatenate([traj_q, track_q, navi], -1))
        plan_q = plan_q.max(axis=1, keepdims=True)  # [B, 1, D]

        feat = bev + bev_pos if bev_pos is not None else bev
        if self.with_adapter:
            x = feat.reshape(bs, self.bev_h, self.bev_w, d)
            for blk in self.bev_adapter:
                x = x + blk(x)
            feat = x.reshape(bs, -1, d)

        plan_q = plan_q + self.pos_embed[None]
        plan_q = self.attn_module(plan_q, feat, deterministic=deterministic)

        traj = self.reg_fc1(nn.relu(self.reg_fc0(plan_q[:, 0])))
        traj = traj.reshape(bs, self.planning_steps, 2)
        traj = jnp.cumsum(traj, axis=1)
        if self.use_col_optim and deterministic and occ_mask is not None:
            traj = collision_optimize(
                traj, occ_mask, bev_h=self.bev_h, bev_w=self.bev_w,
                occ_filter_range=self.occ_filter_range, sigma=self.sigma,
                alpha_collision=self.alpha_collision,
                pc_range=self.pc_range)
        return dict(sdc_traj=traj, sdc_traj_all=traj)


class _MLPFuser(nn.Module):
    """Linear(3D->D)+LN+ReLU (planning_head.py:66-70)."""
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return LinLNReLU(self.out, dtype=self.dtype, name='fuse')(x)


class _AdapterBlock(nn.Module):
    """Conv3x3+ReLU+Conv1x1 residual adapter (planning_head.py:85-94)."""
    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels // 2, (3, 3), padding=1, dtype=self.dtype,
                    name='conv0')(x)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name='conv1')(nn.relu(h))


# ---------------------------------------------------------------------------
# Collision optimization (collision_optimization.py:16-116, device-native)
# ---------------------------------------------------------------------------

def collision_optimize(traj, occ_mask, *, bev_h: int = 200, bev_w: int = 200,
                       occ_filter_range: float = 5.0, sigma: float = 1.0,
                       alpha_collision: float = 5.0, n_iters: int = 50,
                       lr: float = 0.1,
                       pc_range: Sequence[float] = (-51.2, -51.2, -5.0,
                                                    51.2, 51.2, 3.0)):
    """Refine [B, T, 2] waypoints against [B, T_occ, H, W] occupancy.

    Objective (collision_optimization.py:93-110):
      sum_t ||p_t - ref_t||^2
      + alpha / (2.507 * sigma) * sum_occupied exp(-||p_t - c||^2 / 2 sigma^2)
    restricted to occupied cells within ``occ_filter_range`` of the
    waypoint. Dense-grid gradient descent replaces IPOPT. Cell centres are
    derived from ``pc_range`` and the occupancy grid shape (the reference
    hardcodes its [-50, 50] x 0.5 m grid, planning_head.py:222-227; the
    occupancy we receive lives on the encoder BEV grid spanning pc_range).
    """
    b, t_occ = occ_mask.shape[:2]
    steps = traj.shape[1]
    ref = jax.lax.stop_gradient(traj)

    cell_h = (pc_range[4] - pc_range[1]) / bev_h
    cell_w = (pc_range[3] - pc_range[0]) / bev_w
    ys = pc_range[1] + (jnp.arange(bev_h, dtype=jnp.float32) + 0.5) * cell_h
    xs = pc_range[0] + (jnp.arange(bev_w, dtype=jnp.float32) + 0.5) * cell_w
    cx = jnp.broadcast_to(xs[None, :], (bev_h, bev_w))
    cy = jnp.broadcast_to(ys[:, None], (bev_h, bev_w))

    # per-step occupancy slice: cur_t = min(t+1, t_occ-1)
    tidx = jnp.minimum(jnp.arange(steps) + 1, t_occ - 1)
    occ_t = occ_mask[:, tidx]  # [B, steps, H, W]
    norm = alpha_collision / (2.507 * sigma)

    def cost(p):
        track = ((p - ref) ** 2).sum()
        dx = p[..., 0][:, :, None, None] - cx[None, None]
        dy = p[..., 1][:, :, None, None] - cy[None, None]
        d2 = dx * dx + dy * dy
        in_range = (d2 < occ_filter_range ** 2).astype(jnp.float32)
        pot = norm * jnp.exp(-d2 / (2.0 * sigma ** 2))
        return track + (pot * occ_t * in_range).sum()

    grad = jax.grad(cost)

    def body(_, p):
        return p - lr * grad(p)

    return jax.lax.fori_loop(0, n_iters, body, traj)


# ---------------------------------------------------------------------------
# Losses (losses/planning_loss.py:16-110)
# ---------------------------------------------------------------------------

def planning_loss(sdc_traj, gt_traj, mask):
    """Masked L2 ADE (PlanningLoss)."""
    err = jnp.linalg.norm(sdc_traj[..., :2] - gt_traj[..., :2], axis=-1)
    m = mask.astype(jnp.float32)
    return (err * m).sum() / (m.sum() + 1e-5)


def _to_corners(xy, w, l, yaw):
    """BEV rectangle corners [..., 4, 2] (CollisionLoss.to_corners)."""
    base = jnp.asarray([[w / 2, -l / 2], [w / 2, l / 2],
                        [-w / 2, l / 2], [-w / 2, -l / 2]], jnp.float32)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.stack([jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], -2)
    return base @ rot + xy[..., None, :]


def collision_loss(sdc_traj, gt_planning, gt_planning_mask, agent_corners,
                   agent_valid, delta: float = 0.5, weight: float = 1.0):
    """Axis-aligned bbox-overlap collision penalty (CollisionLoss).

    sdc_traj: [B, T, 2]; gt_planning: [B, T, 3] (x, y, yaw);
    agent_corners: [B, T, A, 4, 2] future gt agent BEV corners;
    agent_valid: [B, T, A].
    """
    w = 1.85 + delta
    l = 4.084 + delta
    yaw = gt_planning[..., 2]
    sdc_c = _to_corners(sdc_traj[..., :2], w, l, yaw)  # [B, T, 4, 2]

    def aabb(c):
        return c.min(-2), c.max(-2)
    smin, smax = aabb(sdc_c)
    amin, amax = aabb(agent_corners)
    lo = jnp.maximum(smin[:, :, None], amin)
    hi = jnp.minimum(smax[:, :, None], amax)
    inter = jnp.clip(hi - lo, 0.0, None)
    area = inter[..., 0] * inter[..., 1]  # [B, T, A]
    m = agent_valid.astype(jnp.float32) * \
        gt_planning_mask.astype(jnp.float32)[:, :, None]
    return (area * m).sum() * weight
