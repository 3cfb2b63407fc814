"""UniAD task heads: motion forecasting, occupancy flow, planning, map seg.

Compact functional counterparts of the reference head zoo
(UniAD/projects/mmdet3d_plugin/uniad/dense_heads/, SURVEY §2.5):

* ``MotionHead``  <- motion_head.py + motion_head_plugin (1.9k LoC): agent-
  centric multi-modal trajectory queries attending BEV + track features.
* ``OccHead``     <- occ_head.py + occ_head_plugin (1.2k LoC): future
  instance occupancy decoded from BEV with per-agent mask queries.
* ``PlanningHead`` <- planning_head.py (+ collision optimisation, 0.5k LoC):
  ego trajectory regression from a command-conditioned ego query.
* ``PansegHead``  <- panseg_head.py + seg_head_plugin (3.2k LoC): BEV map
  segmentation (lane/drivable), here a pixel decoder head.

Parity level: architectural capability (query flows, inputs/outputs, losses)
— not yet a layer-for-layer match of every plugin module; deepened in later
rounds.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import FFN, TorchLinear
from ..models.attention import PredictionMSDeformableAttention


class _QueryBEVBlock(nn.Module):
    """Self-attn over queries + deformable cross-attn into BEV + FFN."""
    embed_dims: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, query, ref_points, bev, bev_h, bev_w, *,
                 deterministic: bool = True):
        q = nn.MultiHeadDotProductAttention(
            num_heads=8, qkv_features=self.embed_dims, dtype=self.dtype,
            name='self_attn')(query, query, query)
        query = nn.LayerNorm(name='ln0')(query + q)
        query = PredictionMSDeformableAttention(
            embed_dims=self.embed_dims, num_levels=1, num_points=4,
            dtype=self.dtype, name='cross_attn')(
                query, bev, ref_points[:, :, None, :], ((bev_h, bev_w),),
                deterministic=deterministic)
        query = nn.LayerNorm(name='ln1')(query)
        query = FFN(self.embed_dims * 2, self.embed_dims,
                    dtype=self.dtype, name='ffn')(
                        query, deterministic=deterministic)
        return nn.LayerNorm(name='ln2')(query)


class MotionHead(nn.Module):
    """Multi-modal agent trajectory forecasting.

    Inputs: track queries [bs, A, C] + their BEV reference points [bs, A, 2];
    outputs per-agent per-mode future trajectories [bs, A, modes, T, 2] and
    mode scores [bs, A, modes].
    """
    embed_dims: int = 256
    num_modes: int = 6
    pred_steps: int = 12
    num_layers: int = 3
    bev_h: int = 200
    bev_w: int = 200
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, track_query, track_ref, bev, *,
                 deterministic: bool = True):
        bs, a, c = track_query.shape
        mode_emb = self.param('mode_embedding',
                              nn.initializers.normal(1.0),
                              (self.num_modes, self.embed_dims))
        q = (track_query[:, :, None, :] + mode_emb[None, None]).reshape(
            bs, a * self.num_modes, c)
        ref = jnp.repeat(track_ref, self.num_modes, axis=1)
        for i in range(self.num_layers):
            q = _QueryBEVBlock(self.embed_dims, dtype=self.dtype,
                               name=f'layers_{i}')(
                q, ref, bev, self.bev_h, self.bev_w,
                deterministic=deterministic)
        traj = TorchLinear(self.pred_steps * 2, dtype=self.dtype,
                           name='traj_reg')(q)
        traj = traj.reshape(bs, a, self.num_modes, self.pred_steps, 2)
        score = TorchLinear(1, dtype=self.dtype, name='mode_cls')(q)
        score = score.reshape(bs, a, self.num_modes)
        return dict(trajs=traj, mode_scores=score, motion_query=q.reshape(
            bs, a, self.num_modes, c))


class OccHead(nn.Module):
    """Future instance occupancy from BEV + agent queries.

    Outputs [bs, T_occ, A, H_occ, W_occ] per-agent occupancy logits via
    mask-query dot products against a temporally-evolved BEV (the
    reference's occ flow decoder, occ_head_plugin/modules.py).
    """
    embed_dims: int = 256
    occ_steps: int = 5
    bev_h: int = 200
    bev_w: int = 200
    downsample: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev, agent_query, *, deterministic: bool = True):
        bs, n, c = bev.shape
        h = self.bev_h // self.downsample
        w = self.bev_w // self.downsample
        bev_map = bev.reshape(bs, self.bev_h, self.bev_w, c)
        # strided pooling to the occupancy resolution
        bev_ds = nn.avg_pool(bev_map, (self.downsample, self.downsample),
                             strides=(self.downsample, self.downsample))
        bev_seq = []
        state = bev_ds
        for t in range(self.occ_steps):
            state = state + nn.Conv(self.embed_dims, (3, 3),
                                    padding=[(1, 1), (1, 1)],
                                    dtype=self.dtype,
                                    name=f'temporal_conv_{t}')(nn.relu(state))
            bev_seq.append(state)
        bev_seq = jnp.stack(bev_seq, 1)  # [bs, T, h, w, C]

        mask_q = TorchLinear(self.embed_dims, dtype=self.dtype,
                             name='mask_proj')(agent_query)  # [bs, A, C]
        logits = jnp.einsum('bthwc,bac->btahw', bev_seq, mask_q)
        return dict(occ_logits=logits)


class PlanningHead(nn.Module):
    """Ego trajectory planning from BEV + a command-conditioned ego query.

    Outputs [bs, steps, 2] ego waypoints (the reference's collision
    optimisation post-process operates on the decoded occupancy and is part
    of the eval tooling).
    """
    embed_dims: int = 256
    plan_steps: int = 6
    num_commands: int = 3
    num_layers: int = 2
    bev_h: int = 200
    bev_w: int = 200
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev, command, *, deterministic: bool = True):
        bs = bev.shape[0]
        cmd_emb = self.param('command_embedding',
                             nn.initializers.normal(1.0),
                             (self.num_commands, self.embed_dims))
        q = cmd_emb[command][:, None, :]  # [bs, 1, C]
        ref = jnp.full((bs, 1, 2), 0.5)
        for i in range(self.num_layers):
            q = _QueryBEVBlock(self.embed_dims, dtype=self.dtype,
                               name=f'layers_{i}')(
                q, ref, bev, self.bev_h, self.bev_w,
                deterministic=deterministic)
        traj = TorchLinear(self.plan_steps * 2, dtype=self.dtype,
                           name='plan_reg')(q[:, 0])
        return dict(ego_traj=traj.reshape(bs, self.plan_steps, 2),
                    ego_query=q[:, 0])


class PansegHead(nn.Module):
    """BEV map segmentation (lanes / drivable area / crossing)."""
    embed_dims: int = 256
    num_map_classes: int = 4
    bev_h: int = 200
    bev_w: int = 200
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bev, *, deterministic: bool = True):
        bs, n, c = bev.shape
        x = bev.reshape(bs, self.bev_h, self.bev_w, c)
        x = nn.Conv(self.embed_dims, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name='conv1')(x)
        x = nn.relu(nn.LayerNorm(name='ln')(x))
        logits = nn.Conv(self.num_map_classes, (1, 1), dtype=self.dtype,
                         name='cls')(x)
        return dict(seg_logits=logits)
