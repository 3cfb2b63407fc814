"""OccFormer: future instance occupancy head.

Layer-for-layer TPU-native counterpart of the reference occupancy stack
(UniAD/projects/mmdet3d_plugin/uniad/dense_heads/occ_head.py:23-470,
occ_head_plugin/modules.py:19-340, occ_head_plugin/utils.py,
losses/occflow_loss.py).

Future rollout: ``n_future + 1`` blocks; each block downscales the BEV
state, computes a temporally-evolved instance query, generates a
mask-guided attention mask, runs masked cross-attention (pixels attend
instance queries), and upsamples back (occ_head.py:214-262). All convs are
NHWC; BatchNorm follows the repo convention of GroupNorm(32) (matching
capability — the reference trains with plain BN2d which is
statistics-equivalent at convergence).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..models.layers import TorchLinear
from ..ops.grid_sample import grid_sample_2d
from .blocks import TorchDecoderLayer, LinLNReLU


def _gn(ch: int) -> int:
    g = 32
    while ch % g:
        g //= 2
    return max(g, 1)


class _MLP(nn.Module):
    """ReLU MLP, no activation on the last layer (occ modules.py:62-76)."""
    hidden: int
    out: int
    num_layers: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(TorchLinear(self.hidden, dtype=self.dtype,
                                    name=f'fc{i}')(x))
        return TorchLinear(self.out, dtype=self.dtype,
                           name=f'fc{self.num_layers - 1}')(x)


class SimpleConv2d(nn.Module):
    """(Conv3x3+N+ReLU) x (n-1) + Conv1x1 (occ modules.py:78-133)."""
    out_channels: int
    conv_channels: int = 64
    num_conv: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cc = x.shape[-1] if self.num_conv == 1 else self.conv_channels
        for i in range(self.num_conv - 1):
            x = nn.Conv(cc, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f'conv{i}')(x)
            x = nn.relu(nn.GroupNorm(num_groups=_gn(cc),
                                     name=f'norm{i}')(x))
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name='conv_out')(x)


class Bottleneck(nn.Module):
    """Residual bottleneck with optional stride-2 down/up sampling
    (occ modules.py:239-340)."""
    in_channels: int
    out_channels: Optional[int] = None
    downsample: bool = False
    upsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.in_channels
        mid = self.in_channels // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv_down_project')(x)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(mid), name='abn_down')(h))
        if self.upsample:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), 'bilinear')
            h = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name='conv')(h)
        else:
            stride = 2 if self.downsample else 1
            h = nn.Conv(mid, (3, 3), strides=stride, padding=1,
                        use_bias=False, dtype=self.dtype, name='conv')(h)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(mid), name='abn')(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv_up_project')(h)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(out_ch), name='abn_up')(h))

        if out_ch == self.in_channels and not (self.downsample or
                                               self.upsample):
            skip = x
        else:
            skip = x
            if self.upsample:
                b, hh, ww, c = skip.shape
                skip = jax.image.resize(skip, (b, hh * 2, ww * 2, c),
                                        'bilinear')
            elif self.downsample:
                skip = nn.max_pool(skip, (2, 2), strides=(2, 2))
            skip = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                           name='conv_skip_proj')(skip)
            skip = nn.GroupNorm(num_groups=_gn(out_ch),
                                name='bn_skip_proj')(skip)
        return h + skip


class UpsamplingAdd(nn.Module):
    """Bilinear x2 + Conv1x1 + N, then add skip (occ modules.py:217-228)."""
    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), 'bilinear')
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        x = nn.GroupNorm(num_groups=_gn(self.out_channels), name='norm')(x)
        return x + skip


class CVTDecoderBlock(nn.Module):
    """Upsample conv block with residual skip (occ modules.py:136-177)."""
    out_channels: int
    skip_dim: int
    factor: int = 2
    with_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, skip):
        dim = self.out_channels // self.factor
        b, h, w, c = x.shape
        y = jax.image.resize(x, (b, h * 2, w * 2, c), 'bilinear')
        y = nn.Conv(dim, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name='conv0')(y)
        y = nn.relu(nn.GroupNorm(num_groups=_gn(dim), name='norm0')(y))
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv1')(y)
        y = nn.GroupNorm(num_groups=_gn(self.out_channels), name='norm1')(y)

        up = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name='up')(skip)
        up = jax.image.resize(
            up, (up.shape[0], y.shape[1], y.shape[2], up.shape[-1]),
            'bilinear')
        y = y + up
        return nn.relu(y) if self.with_relu else y


class CVTDecoder(nn.Module):
    """Stack of CVT blocks upsampling /4 -> /1 (occ modules.py:179-214)."""
    dim: int
    blocks: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        """x: [B, T, H, W, C] -> [B, T, 4H, 4W, C_last]."""
        b, t = x.shape[:2]
        y = x.reshape((b * t,) + x.shape[2:])
        skip = y
        for i, out_ch in enumerate(self.blocks):
            y = CVTDecoderBlock(out_ch, self.dim,
                                with_relu=i < len(self.blocks) - 1,
                                dtype=self.dtype, name=f'block{i}')(y, skip)
            skip = y
        return y.reshape((b, t) + y.shape[1:])


def bev_feature_slicer(x: jnp.ndarray, grid_conf: Optional[dict],
                       map_grid_conf: Optional[dict]) -> jnp.ndarray:
    """Resample BEV features between grid definitions (occ modules.py:19-59).

    x: [B, H, W, C] on ``grid_conf``; returns features on ``map_grid_conf``.
    Identity when the confs match (the released configs use identical
    [-50, 50, 0.5] occflow grids vs the encoder's [-51.2, 51.2, 0.512]).
    """
    if grid_conf is None or map_grid_conf is None or \
            grid_conf == map_grid_conf:
        return x
    def axis_points(bound):
        start = bound[0] + bound[2] / 2.0
        n = int(round((bound[1] - bound[0]) / bound[2]))
        return np.arange(n, dtype=np.float32) * bound[2] + start
    mx = axis_points(map_grid_conf['xbound'])
    my = axis_points(map_grid_conf['ybound'])
    norm_x = mx / (-(grid_conf['xbound'][0] + grid_conf['xbound'][2] / 2.0))
    norm_y = my / (-(grid_conf['ybound'][0] + grid_conf['ybound'][2] / 2.0))
    gx, gy = np.meshgrid(norm_x, norm_y)  # 'xy' indexing
    grid = jnp.asarray(np.stack([gx, gy], -1))  # [h, w, 2]
    b = x.shape[0]
    h, w = grid.shape[:2]
    flat = jnp.broadcast_to(grid.reshape(1, h * w, 2), (b, h * w, 2))
    out = grid_sample_2d(x, flat)
    return out.reshape(b, h, w, x.shape[-1])


class OccHead(nn.Module):
    """Future instance occupancy from BEV + fused agent queries.

    Reference: occ_head.py:23-470 with the base_e2e.py:330-394 hyperparams
    (bev_proj_nlayers=4, 5 decoder layers over n_future+1=5 blocks,
    attn_mask_thresh=0.3).
    """
    embed_dims: int = 256
    n_future: int = 4
    bev_h: int = 200
    bev_w: int = 200
    bev_proj_dim: int = 256
    bev_proj_nlayers: int = 4
    num_trans_layers: int = 5
    num_heads: int = 8
    query_dim: int = 256
    query_mlp_layers: int = 3
    temporal_mlp_layer: int = 2
    attn_mask_thresh: float = 0.3
    detach_query_pos: bool = True
    test_seg_thresh: float = 0.1
    receptive_field: int = 3
    grid_conf: Optional[dict] = None
    map_grid_conf: Optional[dict] = None
    dtype: jnp.dtype | None = None

    @property
    def n_future_blocks(self) -> int:
        return self.n_future + 1

    def setup(self):
        d, pd = self.query_dim, self.bev_proj_dim
        self.bev_light_proj = SimpleConv2d(
            pd, conv_channels=self.embed_dims,
            num_conv=self.bev_proj_nlayers, dtype=self.dtype,
            name='bev_light_proj')
        self.base_downscale = [
            Bottleneck(pd, downsample=True, dtype=self.dtype,
                       name='base_downscale_0'),
            Bottleneck(pd, downsample=True, dtype=self.dtype,
                       name='base_downscale_1')]
        self.temporal_mlps = [
            _MLP(d, pd, self.temporal_mlp_layer, dtype=self.dtype,
                 name=f'temporal_mlps_{i}')
            for i in range(self.n_future_blocks)]
        self.downscale_convs = [
            Bottleneck(pd, downsample=True, dtype=self.dtype,
                       name=f'downscale_convs_{i}')
            for i in range(self.n_future_blocks)]
        self.upsample_adds = [
            UpsamplingAdd(pd, dtype=self.dtype, name=f'upsample_adds_{i}')
            for i in range(self.n_future_blocks)]
        self.trans_layers = [
            TorchDecoderLayer(pd, self.num_heads, 2048, dropout=0.0,
                              dtype=self.dtype, name=f'trans_layers_{i}')
            for i in range(self.num_trans_layers)]
        self.dense_decoder = CVTDecoder(pd, (pd, pd), dtype=self.dtype,
                                        name='dense_decoder')
        self.mode_fuser = LinLNReLU(pd, dtype=self.dtype, name='mode_fuser')
        self.multi_query_fuser = _MultiQueryFuser(d, pd, dtype=self.dtype,
                                                  name='multi_query_fuser')
        self.query_to_occ_feat = _MLP(d, pd, self.query_mlp_layers,
                                      dtype=self.dtype,
                                      name='query_to_occ_feat')
        self.temporal_mlp_for_mask = _MLP(d, pd, self.query_mlp_layers,
                                          dtype=self.dtype,
                                          name='temporal_mlp_for_mask')

    def get_attn_mask(self, state, ins_query):
        """state [B, h, w, C]; ins_query [B, Q, C] (occ_head.py:172-198)."""
        ins_embed = self.temporal_mlp_for_mask(ins_query)  # [B, Q, pd]
        mask_pred = jnp.einsum('bqc,bhwc->bqhw', ins_embed, state)
        attn_mask = jax.nn.sigmoid(mask_pred) < self.attn_mask_thresh
        # all-background masks are disabled (occ_head.py:190-192)
        all_bg = attn_mask.all(axis=(-2, -1), keepdims=True)
        attn_mask = jnp.where(all_bg, False, attn_mask)
        attn_mask = jax.lax.stop_gradient(attn_mask)

        b, q, h, w = mask_pred.shape
        up = jax.image.resize(mask_pred.reshape(b * q, h, w, 1),
                              (b * q, self.bev_h, self.bev_w, 1), 'bilinear')
        up = up.reshape(b, q, self.bev_h, self.bev_w)
        return attn_mask, up, ins_embed

    def __call__(self, bev, ins_query, *, deterministic: bool = True):
        """
        Args:
          bev: [B, HW, C] BEV features.
          ins_query: [B, Q, C] fused agent queries (see ``merge_queries``).

        Returns:
          mask_preds: [B, Q, T, bev_h, bev_w] per-block attn mask logits.
          ins_occ_logits: [B, Q, T, bev_h, bev_w] final occupancy logits.
        """
        b = bev.shape[0]
        base = bev.reshape(b, self.bev_h, self.bev_w, -1)
        base = bev_feature_slicer(base, self.grid_conf, self.map_grid_conf)
        base = self.bev_light_proj(base)
        for blk in self.base_downscale:
            base = blk(base)  # /4

        last_state, last_q = base, ins_query
        future_states, mask_preds, ins_embeds = [], [], []
        per_block = self.num_trans_layers // self.n_future_blocks
        for i in range(self.n_future_blocks):
            cur = self.downscale_convs[i](last_state)  # /8
            cur_q = self.temporal_mlps[i](last_q)      # [B, Q, pd]
            attn_mask, mask_pred, ins_emb = self.get_attn_mask(cur, cur_q)
            mask_preds.append(mask_pred)
            ins_embeds.append(ins_emb)

            hh, ww = cur.shape[1:3]
            pix = cur.reshape(b, hh * ww, -1)
            # pixels attend the instance queries under the mask
            # (occ_head.py:227-247). attn_mask True = masked out; flax MHA
            # masks are True = allowed, hence the negation.
            cross = jnp.logical_not(
                attn_mask.transpose(0, 2, 3, 1).reshape(b, hh * ww, -1)
            )[:, None, :, :]  # [B, 1, hw, Q]
            for j in range(per_block):
                pix = self.trans_layers[i * per_block + j](
                    pix, cur_q, cross_mask=cross,
                    deterministic=deterministic)
            cur = pix.reshape(b, hh, ww, -1)
            cur = self.upsample_adds[i](cur, last_state)  # back to /4
            future_states.append(cur)
            last_state = cur
            last_q = cur_q

        future = jnp.stack(future_states, 1)        # [B, T, h/4, w/4, pd]
        mask_preds = jnp.stack(mask_preds, 2)       # [B, Q, T, H, W]
        ins_query_t = jnp.stack(ins_embeds, 1)      # [B, T, Q, pd]

        future = self.dense_decoder(future)          # [B, T, H, W, pd]
        ins_occ_q = self.query_to_occ_feat(ins_query_t)
        logits = jnp.einsum('btqc,bthwc->bqthw', ins_occ_q, future)
        return dict(mask_preds=mask_preds, ins_occ_logits=logits,
                    seg_out=(jax.nn.sigmoid(logits) >
                             self.test_seg_thresh).any(1).astype(jnp.float32))

    def merge_queries(self, traj_query, track_query, track_query_pos):
        """Fuse motion modes + track query (occ_head.py:271-284).

        traj_query: [B, Q, P, D] (last decoder layer); track_query /
        track_query_pos: [B, Q, D].
        """
        if self.detach_query_pos:
            track_query_pos = jax.lax.stop_gradient(track_query_pos)
        ins = self.mode_fuser(traj_query).max(axis=2)
        return self.multi_query_fuser(jnp.concatenate(
            [ins, track_query, track_query_pos], -1))


class _MultiQueryFuser(nn.Module):
    """Linear(3D->2D)+LN+ReLU+Linear(2D->pd) (occ_head.py:137-143)."""
    query_dim: int
    out: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.query_dim * 2, dtype=self.dtype, name='fc0')(x)
        x = nn.relu(nn.LayerNorm(name='ln')(x))
        return TorchLinear(self.out, dtype=self.dtype, name='fc1')(x)


# ---------------------------------------------------------------------------
# Losses (losses/occflow_loss.py: Fiery binary seg + dice)
# ---------------------------------------------------------------------------

def fiery_binary_seg_loss(logits, targets, valid=None, top_k_ratio=0.25,
                          future_discount=0.95):
    """Top-k BCE with future discount over [B, Q, T, H, W] masks.

    Normalized over the *valid* agent slots (reference occflow loss
    averages over matched agents), so the supervision magnitude does not
    shrink as the padded slot capacity grows.
    """
    t_axis = logits.shape[2]
    bce = _bce_logits(logits, targets)
    disc = future_discount ** jnp.arange(t_axis, dtype=jnp.float32)
    bce = bce * disc[None, None, :, None, None]
    if valid is not None:
        bce = bce * valid
    b, q, t, h, w = bce.shape
    flat = bce.reshape(b, q, t, h * w)
    k = max(1, int(h * w * top_k_ratio))
    top, _ = jax.lax.top_k(flat, k)
    per_slot = top.mean(axis=(2, 3))                    # [B, Q]
    if valid is None:
        return per_slot.mean()
    slot_valid = valid.reshape(b, q)                    # [B, Q] 0/1
    return per_slot.sum() / jnp.clip(slot_valid.sum(), 1.0, None)


def dice_loss_with_masks(logits, targets, valid=None, eps: float = 1.0):
    """Naive dice over sigmoid masks (losses/occflow_loss.py:141-200).

    Like :func:`fiery_binary_seg_loss`, normalized over valid agent slots
    when a validity mask is given (invalid slots score ~0 but would still
    dilute a plain mean over the padded capacity).
    """
    p = jax.nn.sigmoid(logits)
    if valid is not None:
        p = p * valid
        targets = targets * valid
    axes = tuple(range(2, logits.ndim))
    num = 2.0 * (p * targets).sum(axes)
    den = p.sum(axes) + targets.sum(axes) + eps
    per = 1.0 - (num + eps) / den
    if valid is None:
        return per.mean()
    b, q = per.shape[:2]
    slot_valid = valid.reshape(b, q)
    per = per.reshape(b, q, -1).mean(-1) * slot_valid
    return per.sum() / jnp.clip(slot_valid.sum(), 1.0, None)


def _bce_logits(logits, targets):
    return jnp.clip(logits, 0, None) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
