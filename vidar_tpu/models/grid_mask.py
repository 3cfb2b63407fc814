"""GridMask augmentation, fully on-device (jit + vectorized).

Capability match for reference
projects/mmdet3d_plugin/models/utils/grid_mask.py:70-123 (mode=1, use_h/use_w,
rotate=1, ratio=0.5, prob=0.7): a random square grid of period d in [2, H) is
zeroed (keep the grid bars, drop the rest for mode=1) over all images of the
batch, sharing one mask per call.

The reference builds the mask with numpy+PIL on host per call; here it is a
closed-form membership test evaluated on device so it fuses into the input
pipeline: pixel (y, x) is masked iff ((y + st_h) mod d) < l (same for x).
rotate=1 means "rotate by a random integer degree in [0, 1)" = always 0 in
the released configs, so rotation is omitted until a config needs it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array, images: jnp.ndarray, *, ratio: float = 0.5,
              prob: float = 0.7, mode: int = 1) -> jnp.ndarray:
    """Apply GridMask to [N, H, W, C] images (one shared mask)."""
    n, h, w, c = images.shape
    k_apply, k_d, k_sh, k_sw = jax.random.split(rng, 4)

    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    ys = jnp.arange(h)
    xs = jnp.arange(w)
    # reference masks rows s..s+l with s = d*i + st_h inside a 1.5x canvas
    # cropped by (hh-h)//2; the offset shift below reproduces that crop.
    off_h = (jnp.floor(1.5 * h).astype(jnp.int32) - h) // 2
    off_w = (jnp.floor(1.5 * w).astype(jnp.int32) - w) // 2
    row_masked = ((ys + off_h - st_h) % d) < l
    col_masked = ((xs + off_w - st_w) % d) < l
    drop = row_masked[:, None] | col_masked[None, :]
    if mode == 1:
        keep = drop  # mode 1 inverts: the grid bars survive
    else:
        keep = ~drop

    apply = jax.random.uniform(k_apply, ()) < prob
    mask = jnp.where(apply, keep.astype(images.dtype), 1.0)
    return images * mask[None, :, :, None]
