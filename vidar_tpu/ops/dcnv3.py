"""DCNv3 (InternImage deformable conv v3) — TPU formulation.

Capability match for reference
projects/mmdet3d_plugin/bevformer/backbones/ops_dcnv3/ (CUDA im2col kernels +
functions/dcnv3_func.py + modules/dcnv3.py — registered for the InternImage
backbone, unused by released configs): grouped deformable aggregation where
each of G groups samples K=kernel*kernel points at learned offsets with
SOFTMAX-normalised modulation masks, aggregating group channels:

  out[b, p, g, :] = sum_k  mask[b, p, g, k] * bilinear(x_g, p0_k + off_k)

Reuses the packed-corner gather core (ops/gather.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .gather import pack_corners_2d, bilinear_weights, take_rows


def dcnv3_core(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
               kernel: Tuple[int, int] = (3, 3),
               stride: Tuple[int, int] = (1, 1),
               dilation: Tuple[int, int] = (1, 1),
               groups: int = 1) -> jnp.ndarray:
    """DCNv3 sampling/aggregation core.

    Args:
      x: [B, H, W, C] input (C = groups * gc).
      offset: [B, Ho, Wo, G*K*2] (dy, dx) per group/tap.
      mask: [B, Ho, Wo, G*K] modulation logits, softmaxed over K per group.
      Returns [B, Ho, Wo, C].
    """
    b, h, w, c = x.shape
    kh, kw = kernel
    k = kh * kw
    sh, sw = stride
    dh, dw = dilation
    ho, wo = offset.shape[1], offset.shape[2]
    gc = c // groups

    off = offset.reshape(b, ho, wo, groups, k, 2).astype(jnp.float32)
    m = jax.nn.softmax(
        mask.reshape(b, ho, wo, groups, k).astype(jnp.float32), axis=-1)

    ys = jnp.arange(ho, dtype=jnp.float32) * sh
    xs = jnp.arange(wo, dtype=jnp.float32) * sw
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=jnp.float32) * dh - dh * (kh // 2),
        jnp.arange(kw, dtype=jnp.float32) * dw - dw * (kw // 2),
        indexing='ij')
    base_y = gy[None, :, :, None, None] + ky.reshape(-1)
    base_x = gx[None, :, :, None, None] + kx.reshape(-1)

    sy = (base_y + off[..., 0]).reshape(b, -1)  # [B, Ho*Wo*G*K]
    sx = (base_x + off[..., 1]).reshape(b, -1)

    # per-group packed tables: [B*G, (h+1)(w+1), 4*gc]
    xg = x.reshape(b, h, w, groups, gc).transpose(0, 3, 1, 2, 4)
    packed = pack_corners_2d(xg.reshape(b * groups, h, w, gc))
    rows_per = packed.shape[1]

    row, cw = bilinear_weights(sx, sy, h, w)  # [B, N], [B, N, 4]
    row = row.reshape(b, ho * wo, groups, k)
    cw = cw.reshape(b, ho * wo, groups, k, 4)
    g_off = (jnp.arange(b, dtype=jnp.int32)[:, None] * groups +
             jnp.arange(groups, dtype=jnp.int32)[None, :]) * rows_per
    row = row + g_off[:, None, :, None]

    flat = packed.reshape(b * groups * rows_per, 4 * gc)
    gathered = take_rows(flat, row)  # [B, HoWo, G, K, 4*gc]
    gathered = gathered.reshape(b, ho * wo, groups, k, 4, gc)
    weighted = jnp.einsum('bngkcd,bngkc->bngkd',
                          gathered.astype(jnp.float32), cw)
    out = jnp.einsum('bngkd,bngk->bngd', weighted, m.reshape(
        b, ho * wo, groups, k))
    return out.reshape(b, ho, wo, c)
