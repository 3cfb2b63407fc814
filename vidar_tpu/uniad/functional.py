"""Shared UniAD functional utilities (jittable, fixed-capacity).

TPU-native counterparts of the reference helpers in
``UniAD/projects/mmdet3d_plugin/models/utils/functional.py:6-150``
(bivariate_gaussian_activation, norm_points, pos2posemb2d, rot_2d,
anchor_coordinate_transform, trajectory_coordinate_transform).

Design difference vs the reference: agents are fixed-capacity arrays
(``centers [B, A, 2]``, ``yaw [B, A]``) with a validity mask, never python
lists of per-sample tensors — everything here traces once under ``jit``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def bivariate_gaussian_activation(x: jnp.ndarray) -> jnp.ndarray:
    """Map raw 5-vectors to (mu_x, mu_y, sig_x, sig_y, rho) parameters.

    Reference: functional.py:5-24 (exp on sigmas, tanh on correlation).
    """
    mu = x[..., 0:2]
    sig = jnp.exp(x[..., 2:4])
    rho = jnp.tanh(x[..., 4:5])
    return jnp.concatenate([mu, sig, rho], axis=-1)


def norm_points(pos: jnp.ndarray, pc_range) -> jnp.ndarray:
    """Normalize xy points into [0, 1] by the BEV perception range.

    Reference: functional.py:26-39.
    """
    x = (pos[..., 0] - pc_range[0]) / (pc_range[3] - pc_range[0])
    y = (pos[..., 1] - pc_range[1]) / (pc_range[4] - pc_range[1])
    return jnp.stack([x, y], axis=-1)


def pos2posemb2d(pos: jnp.ndarray, num_pos_feats: int = 128,
                 temperature: float = 10000.0) -> jnp.ndarray:
    """Sine/cosine embedding of normalized 2-D positions.

    Reference: functional.py:41-62 (note the (y, x) concat order).
    """
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    px = pos[..., 0, None] / dim_t
    py = pos[..., 1, None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   axis=-1).reshape(px.shape[:-1] + (-1,))
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   axis=-1).reshape(py.shape[:-1] + (-1,))
    return jnp.concatenate([py, px], axis=-1)


def rot_2d(yaw: jnp.ndarray) -> jnp.ndarray:
    """2-D rotation matrices for a batch of yaw angles: [..., 2, 2].

    Reference: functional.py:64-77.
    """
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    row0 = jnp.stack([cy, -sy], axis=-1)
    row1 = jnp.stack([sy, cy], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def anchor_coordinate_transform(anchors: jnp.ndarray,
                                centers: jnp.ndarray,
                                yaw: jnp.ndarray,
                                with_translation: bool = True,
                                with_rotation: bool = True) -> jnp.ndarray:
    """Rotate/translate k-means anchors into each agent's frame.

    Args:
      anchors: [G, P, T, 2] group anchor trajectories.
      centers: [B, A, 2] agent gravity centers (ego/BEV frame).
      yaw:     [B, A] agent yaw angles.

    Returns:
      [B, A, G, P, T, 2].

    Reference: functional.py:79-109 (rotation uses yaw - pi per the
    reference's box-yaw convention).
    """
    out = anchors[None, None]  # [1, 1, G, P, T, 2]
    if with_rotation:
        rot = rot_2d(yaw - math.pi)  # [B, A, 2, 2]
        out = jnp.einsum('bars,bagpts->bagptr', rot,
                         jnp.broadcast_to(out, yaw.shape + anchors.shape))
    if with_translation:
        out = out + centers[:, :, None, None, None, :]
    return jnp.broadcast_to(out, yaw.shape + anchors.shape)


def trajectory_coordinate_transform(traj: jnp.ndarray,
                                    centers: jnp.ndarray,
                                    yaw: jnp.ndarray,
                                    with_translation: bool = True,
                                    with_rotation: bool = True) -> jnp.ndarray:
    """Transform predicted trajectories by each agent's pose.

    Args:
      traj: [B, A, P, T, 2] agent-frame trajectories.
      centers: [B, A, 2]; yaw: [B, A].

    Reference: functional.py:112-150. Rotation is by ``-(yaw - pi)`` — the
    inverse of the anchor transform — expressed here as R(yaw - pi)^T.
    """
    out = traj
    if with_rotation:
        rot = rot_2d(yaw - math.pi)  # [B, A, 2, 2]
        out = jnp.einsum('baptc,bacr->baptr', out, rot)
    if with_translation:
        out = out + centers[:, :, None, None, :]
    return out
