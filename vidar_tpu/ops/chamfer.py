"""Chamfer distance / nearest-neighbour ops (TPU-native).

Replaces the reference's CUDA KNN extension (reference:
third_lib/chamfer_dist/chamferdist/chamferdist/knn.cu and chamfer.py:24-31) and
mmdet3d's pure-torch ``chamfer_distance`` loss (used at reference:
projects/mmdet3d_plugin/bevformer/dense_heads/vidar_head_base.py:654).

Implementation: tiled brute-force pairwise squared distances with a running
min — MXU-friendly (|x|^2 + |y|^2 - 2 x.y^T via matmul) and O(N*M/TILE) memory.
Padding points are handled with explicit masks so all shapes stay static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


def _pairwise_min(src, dst, dst_mask, tile: int):
    """For each src point, min squared distance to any valid dst point.

    src: [N, 3] fp32; dst: [M, 3] fp32; dst_mask: [M] bool.
    Returns (min_dist [N], min_idx [N]).
    """
    n = src.shape[0]
    m = dst.shape[0]
    # Center the clouds: |x-y|^2 is translation-invariant, and a small common
    # offset massively reduces fp32 cancellation in |x|^2+|y|^2-2xy.
    center = jnp.sum(jnp.where(dst_mask[:, None], dst, 0.0), axis=0) / (
        jnp.maximum(jnp.sum(dst_mask.astype(jnp.float32)), 1.0))
    src = src - center
    dst = dst - center
    src_sq = jnp.sum(src * src, axis=-1)  # [N]

    num_tiles = (m + tile - 1) // tile
    pad = num_tiles * tile - m
    dst_p = jnp.pad(dst, ((0, pad), (0, 0)))
    mask_p = jnp.pad(dst_mask, (0, pad))
    dst_tiles = dst_p.reshape(num_tiles, tile, 3)
    mask_tiles = mask_p.reshape(num_tiles, tile)

    def body(carry, inp):
        best_d, best_i = carry
        dst_t, mask_t, t_idx = inp
        dst_sq = jnp.sum(dst_t * dst_t, axis=-1)  # [tile]
        cross = src @ dst_t.T  # [N, tile] (MXU)
        d = src_sq[:, None] + dst_sq[None, :] - 2.0 * cross
        d = jnp.where(mask_t[None, :], d, _BIG)
        tile_best = jnp.min(d, axis=1)
        tile_arg = jnp.argmin(d, axis=1) + t_idx * tile
        take = tile_best < best_d
        return (jnp.where(take, tile_best, best_d),
                jnp.where(take, tile_arg, best_i)), None

    init = (jnp.full((n,), _BIG), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init,
        (dst_tiles, mask_tiles, jnp.arange(num_tiles, dtype=jnp.int32)))
    # The matmul expansion |x|^2+|y|^2-2xy loses a few ulps to cancellation;
    # recompute the exact squared distance at the selected neighbour.
    nearest = jnp.take(dst, jnp.clip(best_i, 0, m - 1), axis=0)
    exact = jnp.sum((src - nearest) ** 2, axis=-1)
    best_d = jnp.where(best_d >= _BIG, best_d, exact)
    return best_d, best_i


@partial(jax.jit, static_argnames=('tile',))
def nearest_neighbor_sq(src: jnp.ndarray, dst: jnp.ndarray,
                        src_mask: jnp.ndarray, dst_mask: jnp.ndarray,
                        tile: int = 2048):
    """Per-src-point nearest squared distance and index into dst.

    All inputs unbatched: src [N,3], dst [M,3], masks [N]/[M] bool. Invalid src
    rows return distance 0 and index 0.
    """
    d, i = _pairwise_min(src.astype(jnp.float32), dst.astype(jnp.float32),
                         dst_mask, tile)
    d = jnp.where(src_mask, d, 0.0)
    i = jnp.where(src_mask, i, 0)
    return d, i


def chamfer_distance_masked(src, dst, src_mask, dst_mask, tile: int = 2048):
    """Bidirectional chamfer with padding masks.

    Returns (loss_src, loss_dst, idx_src, idx_dst) where loss_* are the
    per-point min *squared* distances summed over valid points divided by the
    valid count (i.e. masked mean) — matching mmdet3d's
    ``chamfer_distance(criterion_mode='l2', reduction='mean')``.
    """
    d_src, i_src = nearest_neighbor_sq(src, dst, src_mask, dst_mask, tile=tile)
    d_dst, i_dst = nearest_neighbor_sq(dst, src, dst_mask, src_mask, tile=tile)
    n_src = jnp.maximum(jnp.sum(src_mask.astype(jnp.float32)), 1.0)
    n_dst = jnp.maximum(jnp.sum(dst_mask.astype(jnp.float32)), 1.0)
    return (jnp.sum(d_src) / n_src, jnp.sum(d_dst) / n_dst, i_src, i_dst)


def chamfer_distance(src, dst, tile: int = 2048):
    """Unmasked bidirectional chamfer over full arrays (eval helper).

    Mirrors the reference eval metric (reference:
    projects/mmdet3d_plugin/bevformer/utils/e2e_predictor_utils.py:165-170):
    ``(mean_src(sqdist) + mean_dst(sqdist)) / 2``.
    """
    src_mask = jnp.ones(src.shape[0], bool)
    dst_mask = jnp.ones(dst.shape[0], bool)
    l_src, l_dst, _, _ = chamfer_distance_masked(src, dst, src_mask, dst_mask,
                                                 tile=tile)
    return (l_src + l_dst) / 2.0


class ChamferDistance:
    """API-parity wrapper for the reference's chamferdist module
    (third_lib/chamfer_dist/chamferdist/chamfer.py:24-31):
    ``cd(src, tgt, bidirectional=..., reverse=..., reduction=...)`` over
    batched [B, N, 3] clouds, returning squared-distance losses (+ nearest
    indices like the (dists, idx) info outputs).
    """

    def __call__(self, source, target, *, bidirectional: bool = False,
                 reverse: bool = False, reduction: str = 'mean',
                 tile: int = 2048):
        b = source.shape[0]
        fwd_d = []
        fwd_i = []
        bwd_d = []
        bwd_i = []
        for i in range(b):
            s, t = source[i], target[i]
            sm = jnp.ones(s.shape[0], bool)
            tm = jnp.ones(t.shape[0], bool)
            d, idx = nearest_neighbor_sq(s, t, sm, tm, tile=tile)
            fwd_d.append(d)
            fwd_i.append(idx)
            if bidirectional or reverse:
                d2, i2 = nearest_neighbor_sq(t, s, tm, sm, tile=tile)
                bwd_d.append(d2)
                bwd_i.append(i2)

        def red(ds):
            ds = jnp.stack(ds)
            if reduction == 'sum':
                return ds.sum(axis=1).sum()
            if reduction == 'mean':
                return ds.mean(axis=1).sum()
            return ds

        fwd = red(fwd_d)
        if bidirectional:
            return fwd, red(bwd_d), (jnp.stack(fwd_d), jnp.stack(fwd_i))
        if reverse:
            return red(bwd_d), (jnp.stack(bwd_d), jnp.stack(bwd_i))
        return fwd, (jnp.stack(fwd_d), jnp.stack(fwd_i))
