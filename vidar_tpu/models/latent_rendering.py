"""Latent rendering: radial ray-marching over BEV features.

Re-derivation of reference
projects/mmdet3d_plugin/bevformer/modules/ray_operations/latent_rendering.py:38-162:
per BEV cell, march a ray from the BEV center through the cell, accumulate
transmittance (cumprod of 1 - occupancy) over sampled waypoints, form the
"first-hit" probability for the cell, then aggregate LoRA-projected features
along the ray weighted by those probabilities and re-scale the cell embedding.

Everything is a fixed-size gather (grid_num waypoints per cell) + cumprod —
fully static, no data-dependent shapes. Channels-last layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.grid_sample import grid_sample_2d
from .layers import TorchLinear


def _scan_cells(block_fn, per_cell_args, n: int, chunk: int, bs: int,
                out_dim: int):
    """Scan a checkpointed block over chunks of BEV cells.

    per_cell_args: tuple of [bs, N, ...] arrays split along axis 1.
    Returns [bs, N, out_dim] fp32.
    """
    if n <= chunk:
        return jax.checkpoint(block_fn)(*per_cell_args)
    num_chunks = (n + chunk - 1) // chunk
    pad = num_chunks * chunk - n
    padded = [jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
              for a in per_cell_args]
    stacked = [jnp.moveaxis(
        a.reshape((bs, num_chunks, chunk) + a.shape[2:]), 1, 0)
        for a in padded]
    blk = jax.checkpoint(block_fn)

    def body(_, xs):
        return None, blk(*xs)

    _, out = jax.lax.scan(body, None, tuple(stacked))
    out = jnp.moveaxis(out, 0, 1).reshape(bs, num_chunks * chunk, out_dim)
    return out[:, :n]


def _bev_center_grids(h: int, w: int):
    """Normalised [0,1] cell-center coordinates, flattened row-major [H*W, 2]."""
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    gx, gy = np.meshgrid(xs, ys)  # [H, W]
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


class LatentRendering(nn.Module):
    """(reference config: embed_dims=256, pred_height=16, num_pred_fcs=0,
    grid_step=0.5, grid_num=256, reduction=16, act='sigmoid';
    projects/configs/.../vidar_1_8_nusc_3future.py:210-212)."""
    embed_dims: int = 256
    num_pred_fcs: int = 0
    pred_height: int = 16
    grid_num: int = 128
    grid_step: float = 0.5
    reduction: int = 16
    act: str = 'exp'
    dtype: jnp.dtype | None = None

    ray_chunk: int = 4096  # cells per scan step (bounds gather residuals)

    @nn.compact
    def __call__(self, embed, eps: float = 1e-3):
        """embed: [bs, bev_h, bev_w, C] -> same shape."""
        bs, bev_h, bev_w, c = embed.shape
        n = bev_h * bev_w
        g = self.grid_num

        # 1. occupancy head (MLP -> pred_height logits per cell).
        h = embed
        for i in range(self.num_pred_fcs):
            h = TorchLinear(self.embed_dims, dtype=self.dtype,
                            name=f'occ_fc{i}')(h)
            h = nn.LayerNorm(name=f'occ_ln{i}')(h)
            h = nn.relu(h)
        occ_pred = TorchLinear(self.pred_height, dtype=self.dtype,
                               name='occ_head')(h)  # [bs, H, W, Z]

        # 2. radial waypoints for each cell, in [0,1] BEV coords.
        grids = jnp.asarray(_bev_center_grids(bev_h, bev_w))  # [N, 2]
        grids = jnp.broadcast_to(grids[None], (bs, n, 2))
        radial = grids - 0.5
        radial_norm = radial / jnp.sqrt((radial ** 2).sum(-1, keepdims=True))
        radial_norm = jnp.nan_to_num(radial_norm)
        step = self.grid_step / (min(bev_h, bev_w) // 2)
        steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) * step

        act = self.act
        if act not in ('exp', 'sigmoid'):
            raise NotImplementedError(act)
        zdim = self.pred_height

        def cell_path(grids_c, radial_norm_c):
            """Waypoint path for a chunk of cells: [bs, Nc, G+1, 2] in [-1,1]."""
            way = 0.5 + radial_norm_c[:, :, None, :] * \
                steps[None, None, :, None]
            path = jnp.concatenate([way, grids_c[:, :, None, :]], axis=2)
            return path * 2.0 - 1.0

        # ---- pass 1 (chunked): per-cell first-hit probability --------------
        def prob_block(grids_c, radial_norm_c):
            nc = grids_c.shape[1]
            path_n = cell_path(grids_c, radial_norm_c)
            per_prob = grid_sample_2d(
                occ_pred, path_n.reshape(bs, nc * (g + 1), 2))
            per_prob = per_prob.reshape(bs, nc, g + 1, zdim)
            if act == 'exp':
                per_prob = 1.0 - jnp.exp(-nn.relu(per_prob))
            else:
                per_prob = jax.nn.sigmoid(per_prob)
            path_len = jnp.sqrt((path_n ** 2).sum(-1, keepdims=True))
            inside = (path_len < path_len[..., -1:, :]).astype(per_prob.dtype)
            trans = jnp.cumprod(1.0 - per_prob * inside, axis=2)
            return trans[..., -1, :] * per_prob[..., -1, :]  # [bs, Nc, Z]

        occ_path_prob = _scan_cells(prob_block, (grids, radial_norm),
                                    n, self.ray_chunk, bs, zdim)

        # ---- pass 2 (chunked): ray-feature aggregation in LoRA space ------
        # The LoRA features and the first-hit prob map are sampled at the
        # SAME waypoints — fused into one packed gather.
        lora_a = TorchLinear(self.embed_dims // self.reduction,
                             dtype=self.dtype, name='lora_a')(embed)
        c_r = self.embed_dims // self.reduction
        prob_map = occ_path_prob.reshape(bs, bev_h, bev_w, zdim)
        fused_map = jnp.concatenate(
            [lora_a.astype(jnp.float32), prob_map], axis=-1)
        group = c_r // zdim  # 1 in the released configs

        def agg_block(grids_c, radial_norm_c):
            nc = grids_c.shape[1]
            path_n = cell_path(grids_c, radial_norm_c)
            way_n = path_n[:, :, :-1, :]  # [bs, Nc, G, 2]
            fused = grid_sample_2d(fused_map, way_n.reshape(bs, nc * g, 2))
            fused = fused.reshape(bs, nc, g, -1)
            feat_way = fused[..., :c_r]
            prob_way = fused[..., c_r:]
            boundary = jnp.minimum(1.0 / jnp.abs(radial_norm_c[..., 0:1]),
                                   1.0 / jnp.abs(radial_norm_c[..., 1:2]))
            way_len = jnp.sqrt((way_n ** 2).sum(-1))
            way_valid = (way_len < boundary).astype(jnp.float32)
            prob_way = prob_way * way_valid[..., None]
            prob_way = prob_way / (prob_way.sum(axis=2, keepdims=True) + eps)
            # LoRA channels split into pred_height groups; group z weighted by
            # height-bin z's ray prob (reference latent_rendering.py:148-151
            # via the view(bs, pred_height, -1, N, G) aliasing).
            feat_g = feat_way.reshape(bs, nc, g, zdim, group)
            ray_feat = (feat_g * prob_way[..., None]).sum(axis=2)
            return ray_feat.reshape(bs, nc, c_r)

        ray_feat = _scan_cells(agg_block, (grids, radial_norm),
                               n, self.ray_chunk, bs, c_r)

        up = TorchLinear(self.embed_dims, dtype=self.dtype,
                         name='lora_b')(ray_feat)  # [bs, N, C]

        # 5. scale by first-hit probability per height group.
        up = up.reshape(bs, n, zdim, self.embed_dims // zdim)
        out = up * occ_path_prob[..., None]
        return out.reshape(bs, bev_h, bev_w, self.embed_dims)
