"""Bilinear / trilinear grid sampling with PyTorch `F.grid_sample` semantics.

Matches ``torch.nn.functional.grid_sample(..., mode='bilinear',
padding_mode='zeros', align_corners=False)``, which is the exact flavour the
reference uses in its latent rendering
(reference: projects/mmdet3d_plugin/bevformer/modules/ray_operations/latent_rendering.py:109,136,142)
and its ray losses
(reference: projects/mmdet3d_plugin/bevformer/dense_heads/vidar_head_base.py:474-476,726).

Layout convention is channels-last (TPU native): features are ``[..., H, W, C]``
/ ``[..., D, H, W, C]``, grids carry xy(z) in the last dim with x indexing W,
y indexing H, z indexing D, normalised to [-1, 1].

The implementation is a dense gather + weighted-sum, which XLA lowers to TPU
gather ops; values are gathered in the input dtype and accumulated in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """align_corners=False: x_pix = ((x + 1) * size - 1) / 2."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def _corner_weight_1d(pix: jnp.ndarray):
    """Return (i0, i1, w0, w1) for one axis of bilinear interpolation."""
    i0 = jnp.floor(pix)
    w1 = pix - i0
    w0 = 1.0 - w1
    return i0.astype(jnp.int32), (i0 + 1.0).astype(jnp.int32), w0, w1


def _gather_hw(feat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
               h: int, w: int) -> jnp.ndarray:
    """Gather feat[..., iy, ix, :] with zero padding outside [0,h)x[0,w).

    feat: [B, H, W, C]; iy/ix: [B, N] int32. Returns [B, N, C] (feat dtype).
    """
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy_c = jnp.clip(iy, 0, h - 1)
    ix_c = jnp.clip(ix, 0, w - 1)
    flat = feat.reshape(feat.shape[0], h * w, feat.shape[-1])
    idx = iy_c * w + ix_c  # [B, N]
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out * valid[..., None].astype(feat.dtype)


def grid_sample_2d(feat: jnp.ndarray, grid: jnp.ndarray,
                   impl: str = 'packed') -> jnp.ndarray:
    """2-D bilinear sampling.

    Args:
      feat: [B, H, W, C] feature map.
      grid: [B, N, 2] sampling locations in [-1, 1], (x, y) order.
      impl: 'packed' (single-row gather per sample, see ops.gather) or
        'plain' (4 corner gathers, lower memory).

    Returns:
      [B, N, C] sampled features, fp32.
    """
    b, h, w, c = feat.shape
    x = _unnormalize(grid[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), h)

    if impl == 'packed':
        from .gather import pack_corners_2d, bilinear_sample_packed
        packed = pack_corners_2d(feat)
        return bilinear_sample_packed(packed, h, w, x, y)

    ix0, ix1, wx0, wx1 = _corner_weight_1d(x)
    iy0, iy1, wy0, wy1 = _corner_weight_1d(y)

    v00 = _gather_hw(feat, iy0, ix0, h, w).astype(jnp.float32)
    v01 = _gather_hw(feat, iy0, ix1, h, w).astype(jnp.float32)
    v10 = _gather_hw(feat, iy1, ix0, h, w).astype(jnp.float32)
    v11 = _gather_hw(feat, iy1, ix1, h, w).astype(jnp.float32)

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None] +
           v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    return out


def _gather_dhw(feat: jnp.ndarray, iz, iy, ix, d: int, h: int, w: int):
    valid = (iz >= 0) & (iz < d) & (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iz_c = jnp.clip(iz, 0, d - 1)
    iy_c = jnp.clip(iy, 0, h - 1)
    ix_c = jnp.clip(ix, 0, w - 1)
    flat = feat.reshape(feat.shape[0], d * h * w, feat.shape[-1])
    idx = (iz_c * h + iy_c) * w + ix_c
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out * valid[..., None].astype(feat.dtype)


def grid_sample_3d(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """3-D trilinear sampling.

    Args:
      feat: [B, D, H, W, C] feature volume.
      grid: [B, N, 3] sampling locations in [-1, 1], (x, y, z) order with
        x indexing W, y indexing H, z indexing D (torch convention).

    Returns:
      [B, N, C] sampled features, fp32.
    """
    b, d, h, w, c = feat.shape
    x = _unnormalize(grid[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), h)
    z = _unnormalize(grid[..., 2].astype(jnp.float32), d)
    ix0, ix1, wx0, wx1 = _corner_weight_1d(x)
    iy0, iy1, wy0, wy1 = _corner_weight_1d(y)
    iz0, iz1, wz0, wz1 = _corner_weight_1d(z)

    out = jnp.zeros(grid.shape[:-1] + (c,), jnp.float32)
    for iz, wz in ((iz0, wz0), (iz1, wz1)):
        for iy, wy in ((iy0, wy0), (iy1, wy1)):
            for ix, wx in ((ix0, wx0), (ix1, wx1)):
                v = _gather_dhw(feat, iz, iy, ix, d, h, w).astype(jnp.float32)
                out = out + v * (wz * wy * wx)[..., None]
    return out
