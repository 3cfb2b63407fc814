"""MotionFormer: agent-centric multi-modal trajectory forecasting head.

Layer-for-layer TPU-native counterpart of the reference motion stack
(UniAD/projects/mmdet3d_plugin/uniad/dense_heads/motion_head.py:22-420,
motion_head_plugin/base_motion_head.py:14-139, modules.py:20-280,
motion_deformable_attn.py:25-489, losses/traj_loss.py:16-230).

Key TPU re-design decisions:
  * Agents are fixed-capacity ``[B, A]`` arrays with a validity mask — the
    reference's per-sample python lists (``bbox_results``) become
    ``centers [B, A, 2]``, ``yaw [B, A]``, ``labels [B, A]``; everything
    traces once under ``jit``.
  * ``MotionDeformableAttention`` rides the shared packed-corner
    ``ops.msda.msdeform_attn`` gather kernel (steps folded into the query
    axis, one big MXU-friendly batch) instead of the mmcv CUDA op.
  * k-means anchors are an input array (the reference loads a pickle at
    ``base_motion_head.py:33-45``); :func:`default_anchors` provides a
    deterministic radial-fan fallback with the same shape contract.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..models.layers import TorchLinear, FFN
from ..ops.msda import msdeform_attn
from .blocks import TorchEncoderLayer, TorchDecoderLayer, FuserMLP
from .functional import (anchor_coordinate_transform,
                         bivariate_gaussian_activation, norm_points,
                         pos2posemb2d, trajectory_coordinate_transform)


def load_motion_anchors(path: str) -> np.ndarray:
    """Load a k-means anchor pickle -> [G, P, T, 2] float32.

    Same format as the reference's ``motion_anchor_infos_mode6.pkl``
    (base_motion_head.py:41-44: ``anchors_all`` list of per-group [P, T, 2]
    arrays); generate one from any infos pkl with
    ``python -m vidar_tpu.tools.data_tools kmeans-anchors``.

    The cache is keyed on (path, mtime) so regenerating the pickle
    in-process serves the fresh anchors, and the cached array is
    write-protected so callers can't corrupt it.
    """
    import os
    return _load_motion_anchors_cached(path, os.stat(path).st_mtime_ns)


@functools.lru_cache(maxsize=8)
def _load_motion_anchors_cached(path: str, _mtime_ns: int) -> np.ndarray:
    import pickle
    with open(path, 'rb') as f:
        infos = pickle.load(f)
    arr = np.stack([np.asarray(a, np.float32)
                    for a in infos['anchors_all']])
    arr.flags.writeable = False
    return arr


def default_anchors(num_groups: int = 4, num_modes: int = 6,
                    steps: int = 12) -> np.ndarray:
    """Deterministic radial-fan anchors [G, P, T, 2].

    Stand-in for the k-means anchor pickle
    (``anchor_info_path='data/others/motion_anchor_infos_mode6.pkl'``,
    base_e2e.py:415); per mode a straight ray fanned over heading, speed
    scaled per group (vehicle / bike / pedestrian / other).
    """
    speeds = (8.0, 4.0, 1.5, 3.0)
    out = np.zeros((num_groups, num_modes, steps, 2), np.float32)
    t = np.arange(1, steps + 1, dtype=np.float32) * 0.5
    for g in range(num_groups):
        v = speeds[g % len(speeds)]
        for p in range(num_modes):
            ang = (p - (num_modes - 1) / 2.0) * (math.pi / 6.0) - math.pi / 2
            out[g, p, :, 0] = v * t * math.cos(ang)
            out[g, p, :, 1] = v * t * math.sin(ang)
    return out


def _offset_grid_bias(num_heads: int, num_steps: int, num_levels: int,
                      num_points: int):
    """Directional sampling-offset bias init (motion_deformable_attn.py:329-346)."""
    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(num_heads, dtype=np.float32) * (
            2.0 * math.pi / num_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, None, :],
                       (1, num_steps, num_levels, num_points, 1))
        for i in range(num_points):
            grid[:, :, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)
    return init


class MotionDeformableAttention(nn.Module):
    """Deformable goal-point attention over the BEV map.

    Reference: motion_deformable_attn.py:243-489. Each (agent, mode) query
    samples ``num_steps`` groups of ``num_points`` offsets around its
    current trajectory endpoint (``sample_index=-1``), projected to ego/BEV
    coordinates; outputs of all steps are concatenated and fused by
    ``Linear(S*D -> D) + LN + ReLU``.
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_steps: int = 12
    sample_index: int = -1
    dropout: float = 0.1
    bev_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, value, reference_trajs, centers,
                 spatial_shapes: Sequence[Tuple[int, int]],
                 query_pos=None, identity=None, *,
                 deterministic: bool = True):
        """
        Args:
          query: [B, A, P, D] per-(agent, mode) queries.
          value: [B, HW, D] flattened BEV features.
          reference_trajs: [B, A, P, T, 2] agent-offset trajectories.
          centers: [B, A, 2] agent centers (ego frame, metres).
        """
        bs, a, p, d = query.shape
        nq = a * p
        h, s, lv, pt = (self.num_heads, self.num_steps, self.num_levels,
                        self.num_points)
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        q = query.reshape(bs, nq, d)

        offsets = nn.Dense(
            h * s * lv * pt * 2, kernel_init=nn.initializers.zeros,
            bias_init=_offset_grid_bias(h, s, lv, pt), dtype=self.dtype,
            name='sampling_offsets')(q).reshape(bs, nq, h, s, lv, pt, 2)
        weights = nn.Dense(
            h * s * lv * pt, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name='attention_weights')(q).reshape(bs, nq, h, s, lv * pt)
        weights = jax.nn.softmax(weights.astype(jnp.float32), -1)
        weights = weights.reshape(bs, nq, h, s, lv, pt)

        head_dim = self.embed_dims // h
        value_p = TorchLinear(self.embed_dims, dtype=self.dtype,
                              name='value_proj')(value)
        value_p = value_p.reshape(bs, value.shape[1], h, head_dim)

        # endpoint in ego coords, normalized to [0, 1] over the BEV range
        # (motion_deformable_attn.py:428-444)
        end = reference_trajs[:, :, :, self.sample_index, :]
        end = jax.lax.stop_gradient(end + centers[:, :, None, :])
        ex = (end[..., 0] - self.bev_range[0]) / (
            self.bev_range[3] - self.bev_range[0])
        ey = (end[..., 1] - self.bev_range[1]) / (
            self.bev_range[4] - self.bev_range[1])
        ref = jnp.stack([ex, ey], -1).reshape(bs, nq, 1, 1, 1, 1, 2)

        normalizer = jnp.asarray([[w_, h_] for (h_, w_) in spatial_shapes],
                                 jnp.float32)
        loc = ref + offsets / normalizer[None, None, None, None, :, None, :]

        # fold steps into the query axis: one msda call for all S groups
        loc = loc.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
            bs, nq * s, h, lv, pt, 2)
        w = weights.transpose(0, 1, 3, 2, 4, 5).reshape(bs, nq * s, h, lv, pt)
        out = msdeform_attn(value_p, list(spatial_shapes), loc, w)
        out = out.reshape(bs, nq, s * self.embed_dims).astype(query.dtype)

        out = TorchLinear(self.embed_dims, dtype=self.dtype,
                          name='output_proj_fc')(out)
        out = nn.relu(nn.LayerNorm(name='output_proj_ln')(out))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out.reshape(bs, a, p, d) + identity


class MotionTransformerAttentionLayer(nn.Module):
    """('cross_attn', 'norm', 'ffn', 'norm') layer (base_e2e.py:419-439)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_steps: int = 12
    feedforward: int = 512
    dropout: float = 0.1
    bev_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, value, reference_trajs, centers,
                 spatial_shapes, query_pos=None, *,
                 deterministic: bool = True):
        x = MotionDeformableAttention(
            self.embed_dims, self.num_heads, self.num_levels,
            self.num_points, self.num_steps, dropout=self.dropout,
            bev_range=self.bev_range, dtype=self.dtype, name='cross_attn')(
                query, value, reference_trajs, centers, spatial_shapes,
                query_pos=query_pos, deterministic=deterministic)
        x = nn.LayerNorm(name='norm0')(x)
        x = FFN(self.feedforward, self.embed_dims, self.dropout,
                dtype=self.dtype, name='ffn')(x, deterministic=deterministic)
        return nn.LayerNorm(name='norm1')(x)


class MotionHead(nn.Module):
    """MotionFormer head: intention/track/map/BEV interaction decoder.

    Reference: motion_head.py:22-420 + modules.py:20-173. Outputs per layer
    log-mode-scores ``[L, B, A, P]`` and bivariate-Gaussian trajectories
    ``[L, B, A, P, T, 5]`` (cumsum speed parameterization,
    modules.py:142-148).
    """
    embed_dims: int = 256
    num_heads: int = 8
    num_layers: int = 3
    num_anchor: int = 6
    num_anchor_group: int = 4
    num_classes: int = 10
    predict_steps: int = 12
    num_cls_fcs: int = 3
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    group_id_list: Sequence[Sequence[int]] = ((0, 1, 2, 3, 4), (6, 7), (8,),
                                              (5, 9))
    vehicle_id_list: Sequence[int] = (0, 1, 2, 3, 4, 6, 7)
    dtype: jnp.dtype | None = None

    def setup(self):
        d = self.embed_dims
        self.learnable_motion_query_embedding = self.param(
            'learnable_motion_query_embedding',
            nn.initializers.normal(1.0),
            (self.num_anchor * self.num_anchor_group, d))
        self.boxes_query_embedding_layer = FuserMLP(
            2 * d, d, dtype=self.dtype, name='boxes_query_embedding_layer')
        self.agent_level_embedding_layer = FuserMLP(
            2 * d, d, dtype=self.dtype, name='agent_level_embedding_layer')
        self.scene_level_ego_embedding_layer = FuserMLP(
            2 * d, d, dtype=self.dtype,
            name='scene_level_ego_embedding_layer')
        self.scene_level_offset_embedding_layer = FuserMLP(
            2 * d, d, dtype=self.dtype,
            name='scene_level_offset_embedding_layer')

        self.intention_interaction = TorchEncoderLayer(
            d, self.num_heads, 2 * d, dtype=self.dtype,
            name='intention_interaction')
        self.track_agent_interaction = [
            TorchDecoderLayer(d, self.num_heads, 2 * d, dtype=self.dtype,
                              name=f'track_agent_interaction_{i}')
            for i in range(self.num_layers)]
        self.map_interaction = [
            TorchDecoderLayer(d, self.num_heads, 2 * d, dtype=self.dtype,
                              name=f'map_interaction_{i}')
            for i in range(self.num_layers)]
        self.bev_interaction = [
            MotionTransformerAttentionLayer(
                d, self.num_heads, num_steps=self.predict_steps,
                feedforward=2 * d, bev_range=self.pc_range,
                dtype=self.dtype, name=f'bev_interaction_{i}')
            for i in range(self.num_layers)]

        self.static_dynamic_fuser = FuserMLP(2 * d, d, dtype=self.dtype,
                                             name='static_dynamic_fuser')
        self.dynamic_embed_fuser = FuserMLP(2 * d, d, dtype=self.dtype,
                                            name='dynamic_embed_fuser')
        self.in_query_fuser = FuserMLP(2 * d, d, dtype=self.dtype,
                                       name='in_query_fuser')
        self.out_query_fuser = FuserMLP(2 * d, d, dtype=self.dtype,
                                        name='out_query_fuser')

        self.traj_cls_branches = [
            _ClsBranch(d, self.num_cls_fcs - 1, dtype=self.dtype,
                       name=f'traj_cls_branches_{i}')
            for i in range(self.num_layers)]
        self.traj_reg_branches = [
            _RegBranch(d, self.num_cls_fcs - 1, self.predict_steps * 5,
                       dtype=self.dtype, name=f'traj_reg_branches_{i}')
            for i in range(self.num_layers)]

    def _cls2group(self, labels: jnp.ndarray) -> jnp.ndarray:
        table = np.zeros((self.num_classes,), np.int32)
        for gi, ids in enumerate(self.group_id_list):
            for cid in ids:
                table[cid] = gi
        return jnp.asarray(table)[jnp.clip(labels, 0, self.num_classes - 1)]

    def __call__(self, track_query, labels, centers, yaw, lane_query,
                 lane_query_pos, bev, anchors, *,
                 deterministic: bool = True):
        """
        Args:
          track_query: [B, A, D] last-layer track/detection queries
            (incl. the SDC query at slot -1, per uniad_e2e convention).
          labels: [B, A] int class ids; centers [B, A, 2]; yaw [B, A].
          lane_query/lane_query_pos: [B, M, D] from the panseg head.
          bev: [B, HW, D]; anchors: [G, P, T, 2] k-means anchors.
        """
        bs, a, d = track_query.shape
        g, p, t, _ = anchors.shape

        ref_track = norm_points(centers, self.pc_range)
        track_query_pos = self.boxes_query_embedding_layer(
            pos2posemb2d(ref_track))

        learnable_pos = self.learnable_motion_query_embedding.reshape(
            g, self.num_anchor, d)

        scene_ego = anchor_coordinate_transform(anchors, centers, yaw,
                                                with_translation=True)
        scene_off = anchor_coordinate_transform(anchors, centers, yaw,
                                                with_translation=False)

        agent_emb = self.agent_level_embedding_layer(
            pos2posemb2d(norm_points(anchors[..., -1, :], self.pc_range)))
        scene_ego_emb = self.scene_level_ego_embedding_layer(
            pos2posemb2d(norm_points(scene_ego[..., -1, :], self.pc_range)))
        scene_off_emb = self.scene_level_offset_embedding_layer(
            pos2posemb2d(norm_points(scene_off[..., -1, :], self.pc_range)))

        # group-select per agent class (motion_head.py:354-381 vectorized)
        gidx = self._cls2group(labels)  # [B, A]
        sel = lambda x: jnp.take_along_axis(
            x, gidx[:, :, None, None, None], axis=2).squeeze(2)
        agent_emb_b = jnp.broadcast_to(agent_emb[None, None],
                                       (bs, a, g, p, d))
        learn_b = jnp.broadcast_to(learnable_pos[None, None],
                                   (bs, a, g, p, d))
        agent_emb = sel(agent_emb_b)
        scene_ego_emb = sel(scene_ego_emb)
        scene_off_emb = sel(scene_off_emb)
        learnable_emb = sel(learn_b)
        init_ref = jnp.take_along_axis(
            scene_off, gidx[:, :, None, None, None, None], axis=2).squeeze(2)
        init_ref = jax.lax.stop_gradient(init_ref)  # [B, A, P, T, 2]

        # ---- decoder loop (modules.py:96-173) ----
        spatial_shapes = ((self.bev_h, self.bev_w),)
        track_q_bc = jnp.broadcast_to(track_query[:, :, None, :],
                                      (bs, a, p, d))
        track_pos_bc = jnp.broadcast_to(track_query_pos[:, :, None, :],
                                        (bs, a, p, d))

        agent_emb = self.intention_interaction(
            agent_emb.reshape(bs * a, p, d),
            deterministic=deterministic).reshape(bs, a, p, d)
        static_intention = agent_emb + scene_off_emb + learnable_emb
        reference = init_ref

        query = jnp.zeros_like(static_intention)
        inter_states, inter_refs = [], []
        for lid in range(self.num_layers):
            dyn = self.dynamic_embed_fuser(jnp.concatenate(
                [agent_emb, scene_off_emb, scene_ego_emb], -1))
            intention = self.static_dynamic_fuser(jnp.concatenate(
                [static_intention, dyn], -1))
            query = self.in_query_fuser(jnp.concatenate([query, intention],
                                                        -1))

            tq = self.track_agent_interaction[lid](
                (query + track_pos_bc).reshape(bs * a, p, d),
                jnp.broadcast_to((track_query + track_query_pos)[:, None],
                                 (bs, a, a, d)).reshape(bs * a, a, d),
                deterministic=deterministic).reshape(bs, a, p, d)
            m = lane_query.shape[1]
            mq = self.map_interaction[lid](
                (query + track_pos_bc).reshape(bs * a, p, d),
                jnp.broadcast_to((lane_query + lane_query_pos)[:, None],
                                 (bs, a, m, d)).reshape(bs * a, m, d),
                deterministic=deterministic).reshape(bs, a, p, d)
            bq = self.bev_interaction[lid](
                query, bev, reference, centers, spatial_shapes,
                query_pos=track_pos_bc, deterministic=deterministic)

            query = self.out_query_fuser(jnp.concatenate(
                [tq, mq, bq, track_q_bc + track_pos_bc], -1))

            # reference update via the reg branch (modules.py:141-170)
            tmp = self.traj_reg_branches[lid](query).reshape(
                bs, a, p, t, 5)
            new_ref = jnp.cumsum(tmp[..., :2], axis=3)
            reference = jax.lax.stop_gradient(new_ref)

            ep_off = reference
            ep_ego = trajectory_coordinate_transform(
                reference, centers, yaw, with_translation=True,
                with_rotation=False)
            ep_agent = trajectory_coordinate_transform(
                reference, centers, yaw, with_translation=False,
                with_rotation=True)
            agent_emb = self.agent_level_embedding_layer(pos2posemb2d(
                norm_points(ep_agent[..., -1, :], self.pc_range)))
            scene_ego_emb = self.scene_level_ego_embedding_layer(
                pos2posemb2d(norm_points(ep_ego[..., -1, :], self.pc_range)))
            scene_off_emb = self.scene_level_offset_embedding_layer(
                pos2posemb2d(norm_points(ep_off[..., -1, :], self.pc_range)))

            inter_states.append(query)
            inter_refs.append(reference)

        # ---- per-layer outputs (motion_head.py:324-352) ----
        scores, trajs = [], []
        for lid in range(self.num_layers):
            cls = self.traj_cls_branches[lid](inter_states[lid])[..., 0]
            tmp = self.traj_reg_branches[lid](inter_states[lid]).reshape(
                bs, a, p, t, 5)
            tmp = tmp.at[..., :2].set(jnp.cumsum(tmp[..., :2], axis=3))
            scores.append(jax.nn.log_softmax(cls, axis=-1))
            trajs.append(bivariate_gaussian_activation(tmp))
        out = dict(
            all_traj_scores=jnp.stack(scores),    # [L, B, A, P]
            all_traj_preds=jnp.stack(trajs),      # [L, B, A, P, T, 5]
            traj_query=jnp.stack(inter_states),   # [L, B, A, P, D]
            track_query=track_query,
            track_query_pos=track_query_pos,
            inter_references=jnp.stack(inter_refs))
        return out


class _ClsBranch(nn.Module):
    """Linear-LN-ReLU x n + Linear(1) (base_motion_head.py:91-103)."""
    embed_dims: int
    num_fcs: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = TorchLinear(self.embed_dims, dtype=self.dtype,
                            name=f'fc{i}')(x)
            x = nn.relu(nn.LayerNorm(name=f'ln{i}')(x))
        return TorchLinear(1, dtype=self.dtype, name='out')(x)


class _RegBranch(nn.Module):
    """Linear-ReLU x n + Linear(T*5) (base_motion_head.py:105-112)."""
    embed_dims: int
    num_fcs: int
    out_dims: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.relu(TorchLinear(self.embed_dims, dtype=self.dtype,
                                    name=f'fc{i}')(x))
        return TorchLinear(self.out_dims, dtype=self.dtype, name='out')(x)


# ---------------------------------------------------------------------------
# TrajLoss (losses/traj_loss.py:16-230) — masked, fixed-capacity
# ---------------------------------------------------------------------------

def min_ade(traj, traj_gt, valid):
    """[N, P, T, >=2] x [N, T, 2] x [N, T] -> (err [N], inds [N])."""
    err = jnp.linalg.norm(traj[..., :2] - traj_gt[:, None], axis=-1)
    cnt = jnp.clip(valid.sum(-1), 1, None)[:, None]
    err = (err * valid[:, None]).sum(-1) / cnt
    return err.min(-1), err.argmin(-1)


def min_fde(traj, traj_gt, valid):
    """Final (last-valid-step) displacement error of the best mode."""
    last = jnp.clip(valid.sum(-1).astype(jnp.int32) - 1, 0, None)
    idx = last[:, None, None, None]
    tl = jnp.take_along_axis(traj[..., :2], idx, axis=2).squeeze(2)
    gl = jnp.take_along_axis(traj_gt, last[:, None, None], axis=1).squeeze(1)
    err = jnp.linalg.norm(tl - gl[:, None], axis=-1)
    return err.min(-1), err.argmin(-1)


def miss_rate(traj, traj_gt, valid, dist_thresh: float = 2.0):
    """Fraction whose best-mode max in-horizon displacement > thresh."""
    d = jnp.linalg.norm(traj[..., :2] - traj_gt[:, None], axis=-1)
    d = jnp.where(valid[:, None] > 0, d, -jnp.inf)
    worst = d.max(-1).min(-1)
    return (worst > dist_thresh).astype(jnp.float32)


def traj_nll(pred, traj_gt, valid):
    """Bivariate-Gaussian NLL per agent (traj_loss.py:122-165)."""
    mu_x, mu_y = pred[..., 0], pred[..., 1]
    sig_x = jnp.clip(pred[..., 2], 1e-4, 1e4)
    sig_y = jnp.clip(pred[..., 3], 1e-4, 1e4)
    rho = jnp.clip(pred[..., 4], -0.99, 0.99)
    ohr = (1.0 - rho ** 2) ** -0.5
    dx = traj_gt[..., 0] - mu_x
    dy = traj_gt[..., 1] - mu_y
    nll = 0.5 * ohr ** 2 * (sig_x ** 2 * dx ** 2 + sig_y ** 2 * dy ** 2 -
                            2.0 * rho * sig_x * sig_y * dx * dy) \
        - jnp.log(sig_x * sig_y * ohr) + 1.8379
    nll = jnp.where(jnp.isfinite(nll), nll, 0.0)
    return (nll * valid).sum(-1) / (valid.sum(-1) + 1e-5)


def traj_loss(log_scores, trajs, gt_traj, gt_valid, agent_mask,
              use_variance: bool = True, cls_loss_weight: float = 0.5,
              nll_loss_weight: float = 0.5, loss_weight_minade: float = 0.0,
              loss_weight_minfde: float = 0.25):
    """Single-layer MTP loss over valid agents.

    Args:
      log_scores: [B, A, P] log mode probabilities.
      trajs: [B, A, P, T, 5]; gt_traj: [B, A, T, 2]; gt_valid: [B, A, T];
      agent_mask: [B, A] (1 = supervise this slot).

    Returns dict(loss_traj, l_class, l_reg, l_minade, l_minfde, l_mr).
    """
    b, a_, p_, t_, _ = trajs.shape
    traj = trajs.reshape(b * a_, p_, t_, 5)
    gt = gt_traj.reshape(b * a_, t_, 2)
    valid = gt_valid.reshape(b * a_, t_).astype(jnp.float32)
    m = (agent_mask.reshape(b * a_).astype(jnp.float32) *
         (valid.sum(-1) > 0))
    denom = m.sum() + 1e-5

    l_minfde, _ = min_fde(traj, gt, valid)
    l_minade, inds = min_ade(traj, gt, valid)
    l_mr = (miss_rate(traj, gt, valid) * m).sum() / denom

    best = jnp.take_along_axis(
        traj, inds[:, None, None, None], axis=1).squeeze(1)
    l_reg = traj_nll(best, gt, valid) if use_variance else l_minade
    lp = log_scores.reshape(b * a_, p_)
    l_class = -jnp.take_along_axis(lp, inds[:, None], axis=1).squeeze(1)

    l_reg = (l_reg * m).sum() / denom
    l_class = (l_class * m).sum() / denom
    l_minade = (l_minade * m).sum() / denom
    l_minfde = (l_minfde * m).sum() / denom
    loss = (l_class * cls_loss_weight + l_reg * nll_loss_weight +
            l_minade * loss_weight_minade + l_minfde * loss_weight_minfde)
    return dict(loss_traj=loss, l_class=l_class, l_reg=l_reg,
                l_minade=l_minade, l_minfde=l_minfde, l_mr=l_mr)
