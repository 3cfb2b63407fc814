"""Packed-corner gather primitives — the TPU formulation of bilinear sampling.

TPU gathers are ROW-RATE bound (measured ~7-14 ns/row on v5e regardless of
row width up to ~256B): four separate corner gathers per bilinear sample waste
4x the row budget. These helpers pre-pack the 4 corners of every pixel into
one row (with a zero ring for out-of-range corners), flatten all leading batch
dims into the row index, and fetch each sample with a single flat ``jnp.take``.

Used by ``ops.msda`` (deformable attention), ``ops.grid_sample`` and the ray
losses (``models.ray_loss``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack_corners_2d(feat: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H+1)*(W+1), 4C] packed corner table.

    Row (y+1)*(W+1)+(x+1) holds [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)]
    where v is zero outside the map.
    """
    b, h, w, c = feat.shape
    vp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate([
        vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:],
    ], axis=-1)
    return packed.reshape(b, (h + 1) * (w + 1), 4 * c)


def bilinear_weights(x_pix: jnp.ndarray, y_pix: jnp.ndarray,
                     h: int, w: int):
    """Corner row index + 4 corner weights for pixel-space coords.

    Returns (row [..] int32 into a (h+1)x(w+1) packed table,
             cw [..., 4] fp32 weights, zeroed when the sample cannot touch
             the map at all).
    """
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    wx1 = x_pix - x0
    wy1 = y_pix - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    row = (jnp.clip(iy0 + 1, 0, h) * (w + 1) + jnp.clip(ix0 + 1, 0, w))
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    cw = cw * valid[..., None].astype(cw.dtype)
    return row, cw


def take_rows(packed_flat: jnp.ndarray, row: jnp.ndarray) -> jnp.ndarray:
    """Flat row gather: packed_flat [R, D], row [...] -> [..., D]."""
    out = jnp.take(packed_flat, row.reshape(-1), axis=0)
    return out.reshape(row.shape + (packed_flat.shape[-1],))


def bilinear_sample_packed(packed: jnp.ndarray, h: int, w: int,
                           x_pix: jnp.ndarray, y_pix: jnp.ndarray
                           ) -> jnp.ndarray:
    """Sample [B, (h+1)(w+1), 4C] packed tables at per-batch pixel coords.

    x_pix/y_pix: [B, N]. Returns [B, N, C] fp32.
    """
    b, rows, c4 = packed.shape
    c = c4 // 4
    row, cw = bilinear_weights(x_pix, y_pix, h, w)  # [B, N], [B, N, 4]
    offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
    flat = packed.reshape(b * rows, c4)
    g = take_rows(flat, row + offs)  # [B, N, 4C]
    g = g.reshape(b, row.shape[1], 4, c).astype(jnp.float32)
    return jnp.einsum('bncd,bnc->bnd', g, cw.astype(jnp.float32))
