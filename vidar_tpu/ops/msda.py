"""Multi-scale deformable attention core op (TPU, XLA gather formulation).

Semantics match mmcv's ``multi_scale_deformable_attn_pytorch`` fallback used by
the reference when CUDA is absent (reference:
projects/mmdet3d_plugin/bevformer/modules/spatial_cross_attention.py:392-394 and
mmcv's CUDA ``ms_deform_attn_forward``): for every (query, head, level, point),
bilinearly sample the per-head value map at the sampling location (grid_sample
with align_corners=False, zero padding) and reduce with the attention weights.

This is THE hot primitive of the whole framework — temporal self-attention,
spatial cross-attention, and the future decoder all reduce to it. The default
implementation is a dense XLA gather (4 corner gathers per sample point) with
fp32 accumulation, which XLA fuses well on TPU; a Pallas VMEM-resident variant
can be swapped in via ``impl='pallas'`` once shapes warrant it.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_sample(value_l: jnp.ndarray, loc: jnp.ndarray, h: int, w: int):
    """Bilinear sample of one level's per-head value maps.

    Args:
      value_l: [B, h*w, heads, dim]
      loc: [B, Q, heads, P, 2] sampling locations in [0, 1] (mmcv convention:
        grid = 2*loc - 1 before grid_sample).
    Returns:
      [B, Q, heads, P, dim] sampled values (fp32).
    """
    b, _, heads, dim = value_l.shape
    q = loc.shape[1]
    p = loc.shape[3]
    # unnormalized pixel coords (align_corners=False): x_pix = loc * size - 0.5
    x = loc[..., 0].astype(jnp.float32) * w - 0.5
    y = loc[..., 1].astype(jnp.float32) * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    # [B, heads, h*w, dim] so the gather axis is per-head.
    v = value_l.transpose(0, 2, 1, 3)

    def gather(iy, ix):
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        # idx: [B, Q, heads, P] -> [B, heads, Q*P]
        idx_t = idx.transpose(0, 2, 1, 3).reshape(b, heads, q * p)
        out = jnp.take_along_axis(v, idx_t[..., None], axis=2)
        out = out.reshape(b, heads, q, p, dim)
        mask = valid.transpose(0, 2, 1, 3)[..., None].astype(out.dtype)
        return out * mask

    v00 = gather(iy0, ix0).astype(jnp.float32)
    v01 = gather(iy0, ix0 + 1).astype(jnp.float32)
    v10 = gather(iy0 + 1, ix0).astype(jnp.float32)
    v11 = gather(iy0 + 1, ix0 + 1).astype(jnp.float32)

    wx1 = wx1.transpose(0, 2, 1, 3)[..., None]
    wy1 = wy1.transpose(0, 2, 1, 3)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (v00 * wy0 * wx0 + v01 * wy0 * wx1 +
           v10 * wy1 * wx0 + v11 * wy1 * wx1)
    # [B, heads, Q, P, dim] -> [B, Q, heads, P, dim]
    return out.transpose(0, 2, 1, 3, 4)


def msdeform_attn(value: jnp.ndarray,
                  spatial_shapes: Sequence[Tuple[int, int]],
                  sampling_locations: jnp.ndarray,
                  attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale deformable attention.

    Args:
      value: [B, V, heads, dim] flattened multi-level per-head values, levels
        concatenated along V in the order of ``spatial_shapes``.
      spatial_shapes: static python sequence of (h, w) per level.
      sampling_locations: [B, Q, heads, L, P, 2] in [0, 1].
      attention_weights: [B, Q, heads, L, P] (already softmaxed over L*P).

    Returns:
      [B, Q, heads * dim] fp32.
    """
    b, v_len, heads, dim = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    assert sampling_locations.shape[3] == num_levels
    assert sum(h * w for h, w in spatial_shapes) == v_len

    out = jnp.zeros((b, q, heads, dim), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + h * w, axis=1)
        sampled = _level_sample(value_l, sampling_locations[:, :, :, lvl], h, w)
        w_l = attention_weights[:, :, :, lvl].astype(jnp.float32)
        out = out + jnp.einsum('bqhpd,bqhp->bqhd', sampled, w_l)
        start += h * w
    return out.reshape(b, q, heads * dim)
