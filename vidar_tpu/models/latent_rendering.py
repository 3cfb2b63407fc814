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
        way = 0.5 + radial_norm[:, :, None, :] * steps[None, None, :, None]
        # append the cell itself as the final waypoint: [bs, N, G+1, 2]
        path = jnp.concatenate([way, grids[:, :, None, :]], axis=2)
        path_n = path * 2.0 - 1.0  # [-1, 1] for grid sampling

        # 3. per-waypoint occupancy prob along the path.
        per_prob = grid_sample_2d(
            occ_pred, path_n.reshape(bs, n * (g + 1), 2))
        per_prob = per_prob.reshape(bs, n, g + 1, self.pred_height)
        if self.act == 'exp':
            per_prob = 1.0 - jnp.exp(-nn.relu(per_prob))
        elif self.act == 'sigmoid':
            per_prob = jax.nn.sigmoid(per_prob)
        else:
            raise NotImplementedError(self.act)

        # waypoints beyond the cell's own radius don't block it.
        path_len = jnp.sqrt((path_n ** 2).sum(-1, keepdims=True))
        inside = (path_len < path_len[..., -1:, :]).astype(per_prob.dtype)
        # transmittance accumulated to the final (cell) waypoint.
        trans = jnp.cumprod(1.0 - per_prob * inside, axis=2)
        occ_path_prob = trans[..., -1, :] * per_prob[..., -1, :]  # [bs, N, Z]

        # 4. ray-feature aggregation in LoRA space. The LoRA features and the
        # first-hit prob map are sampled at the SAME waypoints — fuse them
        # into one packed gather (channels concatenated).
        way_n = path_n[:, :, :-1, :]  # drop the cell waypoint: [bs, N, G, 2]
        lora_a = TorchLinear(self.embed_dims // self.reduction,
                             dtype=self.dtype, name='lora_a')(embed)
        c_r = self.embed_dims // self.reduction
        prob_map = occ_path_prob.reshape(bs, bev_h, bev_w, self.pred_height)
        fused_map = jnp.concatenate(
            [lora_a.astype(jnp.float32), prob_map], axis=-1)
        fused = grid_sample_2d(fused_map, way_n.reshape(bs, n * g, 2))
        fused = fused.reshape(bs, n, g, -1)
        feat_way = fused[..., :c_r]            # [bs, N, G, C/r]
        prob_way = fused[..., c_r:]            # [bs, N, G, Z]

        # waypoints beyond the BEV boundary along this ray don't contribute.
        boundary = jnp.minimum(1.0 / jnp.abs(radial_norm[..., 0:1]),
                               1.0 / jnp.abs(radial_norm[..., 1:2]))
        way_len = jnp.sqrt((way_n ** 2).sum(-1))  # [bs, N, G]
        way_valid = (way_len < boundary).astype(jnp.float32)
        prob_way = prob_way * way_valid[..., None]
        prob_way = prob_way / (prob_way.sum(axis=2, keepdims=True) + eps)

        # LoRA channels are split into pred_height groups; group z is weighted
        # by height-bin z's prob along the ray (reference latent_rendering.py:
        # 148-151 via the view(bs, pred_height, -1, N, G) aliasing).
        c_r = self.embed_dims // self.reduction
        group = c_r // self.pred_height  # 1 in the released configs
        feat_g = feat_way.reshape(bs, n, g, self.pred_height, group)
        ray_feat = (feat_g * prob_way[..., None]).sum(axis=2)  # [bs,N,Z,grp]
        ray_feat = ray_feat.reshape(bs, n, c_r)
        up = TorchLinear(self.embed_dims, dtype=self.dtype,
                         name='lora_b')(ray_feat)  # [bs, N, C]

        # 5. scale by first-hit probability per height group.
        up = up.reshape(bs, n, self.pred_height,
                        self.embed_dims // self.pred_height)
        out = up * occ_path_prob[..., None]
        return out.reshape(bs, bev_h, bev_w, self.embed_dims)
