"""BEV-plane rotation (torchvision ``rotate`` parity).

The reference rotates the previous BEV feature map by the ego yaw delta with
``torchvision.transforms.functional.rotate(..., center=[100, 100])`` (reference:
projects/mmdet3d_plugin/bevformer/modules/transformer.py:136-151). torchvision's
default interpolation is NEAREST, so that is our parity default; 'bilinear' is
available as a (smoother, usually better) option.

Convention: positive ``angle_deg`` rotates the image content counter-clockwise
(in the usual x-right / y-down image frame). Inverse-mapping an output pixel
(x, y) around center (cx, cy):
  sx =  cos(a) * (x - cx) + sin(a) * (y - cy) + cx
  sy = -sin(a) * (x - cx) + cos(a) * (y - cy) + cy
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid_sample import grid_sample_2d


def rotate_bev(feat: jnp.ndarray, angle_deg: jnp.ndarray,
               center=None, mode: str = 'nearest') -> jnp.ndarray:
    """Rotate [B, H, W, C] feature maps by per-batch angles (degrees).

    Args:
      feat: [B, H, W, C].
      angle_deg: [B] rotation angles in degrees (traced OK).
      center: (cx, cy) in pixel coords; defaults to torchvision's
        ((w-1)*0.5, (h-1)*0.5)... NOTE torchvision uses (w/2, h/2) for an
        explicit center arg of [100, 100] on a 200x200 map, which coincides
        with the pixel-space value passed by the reference, so we take the
        explicit value as-is.
      mode: 'nearest' (torchvision default, parity) or 'bilinear'.
    """
    b, h, w, c = feat.shape
    if center is None:
        cx, cy = (w * 0.5, h * 0.5)
    else:
        cx, cy = center
    a = jnp.deg2rad(angle_deg.astype(jnp.float32)).reshape(b, 1, 1)
    cos, sin = jnp.cos(a), jnp.sin(a)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    dx = (xs - cx)[None]
    dy = (ys - cy)[None]
    sx = cos * dx + sin * dy + cx
    sy = -sin * dx + cos * dy + cy

    if mode == 'nearest':
        # torchvision NEAREST truncates the source coordinate (floor for
        # non-negative) after the affine inverse mapping.
        ix = jnp.floor(sx).astype(jnp.int32)
        iy = jnp.floor(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        flat = feat.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1)
        out = out * valid.reshape(b, h * w, 1).astype(feat.dtype)
        return out.reshape(b, h, w, c)
    elif mode == 'bilinear':
        gx = (sx + 0.5) * (2.0 / w) - 1.0
        gy = (sy + 0.5) * (2.0 / h) - 1.0
        grid = jnp.stack([gx.reshape(b, -1), gy.reshape(b, -1)], axis=-1)
        out = grid_sample_2d(feat, grid)
        return out.reshape(b, h, w, c).astype(feat.dtype)
    raise ValueError(f'unknown mode {mode}')
