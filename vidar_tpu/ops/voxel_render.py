"""Differentiable voxel ray-casting (the dvxlr / dvr capability, TPU-native).

Re-derivation of the reference CUDA extensions
(third_lib/dvxlr/dvxlr.cu:160-420 ``render``, dvxlr_v2.cu ``render_v2`` and
third_lib/dvr/dvr.cu): per LiDAR ray, an Amanatides-Woo DDA traversal of a
[T, Z, H, W] sigma volume accumulates transmittance
p_i = exp(-csd_{i-1}) - exp(-csd_i) (csd = cumulative sigma*delta) and renders
the expected ray distance  E[d] = sum_i p_i d_i + exp(-csd_last) * d_max,
with gt distance clamped to d_max.

TPU design: the traversal is a ``lax.scan`` over a STATIC step budget
(vectorised over all rays); sigma lookups are flat gathers; the whole thing is
plain differentiable JAX — the reference's hand-written backward
(atomicAdd scatter of dd_dsigma) falls out of autodiff as a scatter-add.

Note: the reference de-duplicates consecutive rounded path voxels
(dvxlr.cu:365-372) which only affects which in-voxel distance d_i a merged
voxel reports (csd is additive either way); this implementation keeps
per-step entries. The released training path never calls this op (it uses the
grid-sample ray loss), it exists for 4d-occ style rendering/eval parity.

``render_v2`` additionally returns per-ray accumulated sigma regularisation
(reference dvxlr_v2.cu:62-63,114): here ``ray_pred`` = sum_i sigma_regul at
the visited voxels weighted by delta, and ``indicator`` marks rays that hit
the grid.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e10)


def _traverse(origin, points, zhw: Tuple[int, int, int], max_steps: int):
    """Vectorised DDA. origin/points: [R, 3] (x, y, z) in voxel units.

    Returns per-step (voxel linear index [R, S], delta [R, S], dist [R, S],
    valid [R, S]) plus gt distance [R].
    """
    zdim, h, w = zhw
    xo, yo, zo = origin[:, 0], origin[:, 1], origin[:, 2]
    xe, ye, ze = points[:, 0], points[:, 1], points[:, 2]

    r = points - origin
    gt_d = jnp.sqrt(jnp.maximum((r ** 2).sum(-1), 1e-12))
    d = r / gt_d[:, None]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    step_x = jnp.where(dx >= 0, 1, -1)
    step_y = jnp.where(dy >= 0, 1, -1)
    step_z = jnp.where(dz >= 0, 1, -1)

    vx0 = jnp.floor(xo).astype(jnp.int32)
    vy0 = jnp.floor(yo).astype(jnp.int32)
    vz0 = jnp.floor(zo).astype(jnp.int32)

    def axis_tmax(v0, o, dd, st):
        nb = v0 + jnp.where(st < 0, -1, 1)
        return jnp.where(dd != 0, (nb.astype(jnp.float32) - o) / dd, _BIG)

    def axis_tdelta(dd, st):
        return jnp.where(dd != 0, st.astype(jnp.float32) / dd, _BIG)

    carry = dict(
        vx=vx0, vy=vy0, vz=vz0,
        px=vx0.astype(jnp.float32), py=vy0.astype(jnp.float32),
        pz=vz0.astype(jnp.float32),
        tmx=axis_tmax(vx0, xo, dx, step_x),
        tmy=axis_tmax(vy0, yo, dy, step_y),
        tmz=axis_tmax(vz0, zo, dz, step_z),
        last_d=jnp.zeros_like(gt_d),
        was_inside=jnp.zeros_like(gt_d, bool),
        done=jnp.zeros_like(gt_d, bool),
    )
    tdx = axis_tdelta(dx, step_x)
    tdy = axis_tdelta(dy, step_y)
    tdz = axis_tdelta(dz, step_z)

    def body(c, _):
        inside = ((c['vx'] >= 0) & (c['vx'] < w) &
                  (c['vy'] >= 0) & (c['vy'] < h) &
                  (c['vz'] >= 0) & (c['vz'] < zdim))
        newly_done = ((~inside & c['was_inside']) |
                      (~inside & ~c['was_inside'] & (c['last_d'] > gt_d)))
        done = c['done'] | newly_done
        emit = inside & ~done

        # rounded path voxel (reference "modified by tom" quantisation)
        pxi = jnp.clip(jnp.round(c['px']).astype(jnp.int32), 0, w - 1)
        pyi = jnp.clip(jnp.round(c['py']).astype(jnp.int32), 0, h - 1)
        pzi = jnp.clip(jnp.round(c['pz']).astype(jnp.int32), 0, zdim - 1)
        vox = (pzi * h + pyi) * w + pxi

        # pick the axis with the smallest tMax
        tmin = jnp.minimum(jnp.minimum(c['tmx'], c['tmy']), c['tmz'])
        take_x = (c['tmx'] <= c['tmy']) & (c['tmx'] <= c['tmz'])
        take_y = ~take_x & (c['tmy'] <= c['tmz'])
        take_z = ~take_x & ~take_y

        delta = jnp.maximum(0.0, tmin - c['last_d'])
        new = dict(
            vx=c['vx'] + jnp.where(take_x, step_x, 0),
            vy=c['vy'] + jnp.where(take_y, step_y, 0),
            vz=c['vz'] + jnp.where(take_z, step_z, 0),
            px=c['px'] + delta * dx,
            py=c['py'] + delta * dy,
            pz=c['pz'] + delta * dz,
            tmx=c['tmx'] + jnp.where(take_x, tdx, 0.0),
            tmy=c['tmy'] + jnp.where(take_y, tdy, 0.0),
            tmz=c['tmz'] + jnp.where(take_z, tdz, 0.0),
            last_d=tmin,
            was_inside=c['was_inside'] | inside,
            done=done,
        )
        return new, (vox, delta, tmin, emit)

    _, (vox, delta, dist, emit) = jax.lax.scan(
        body, carry, None, length=max_steps)
    # scan stacks along axis 0 -> [S, R]; transpose to [R, S]
    return (vox.T, delta.T, dist.T, emit.T, gt_d)


@partial(jax.jit, static_argnames=('max_steps',))
def voxel_render(sigma: jnp.ndarray, origin: jnp.ndarray,
                 points: jnp.ndarray, tindex: jnp.ndarray,
                 max_steps: int = 417):
    """Differentiable expected-distance rendering (dvxlr ``render``).

    Args:
      sigma: [N, T, Z, H, W] non-negative densities.
      origin: [N, T, 3] ray origins (x, y, z voxel units).
      points: [N, M, 3] ray end points.
      tindex: [N, M] int32 frame per ray (< 0 = padded).
      max_steps: static traversal budget (>= Z+H+W+1 for exactness).

    Returns:
      (pred_dist [N, M], gt_dist [N, M]) — gt clamped to the in-grid range;
      padded/miss rays return 0.
    """
    n, t, zdim, h, w = sigma.shape
    m = points.shape[1]

    t_safe = jnp.clip(tindex, 0, t - 1)
    orig = jnp.take_along_axis(origin, t_safe[..., None], axis=1)

    vox, delta, dist, emit, gt_d = jax.vmap(
        lambda o, p: _traverse(o, p, (zdim, h, w), max_steps)
    )(orig, points)

    flat = sigma.reshape(n, t * zdim * h * w)
    base = t_safe[:, :, None] * (zdim * h * w)
    sig = jnp.take_along_axis(
        flat, (vox + base).reshape(n, m * max_steps),
        axis=1).reshape(n, m, max_steps)
    emit_f = emit.astype(jnp.float32)
    sd = sig * delta * emit_f
    csd = jnp.cumsum(sd, axis=-1)
    trans_prev = jnp.exp(-jnp.concatenate(
        [jnp.zeros_like(csd[..., :1]), csd[..., :-1]], -1))
    p = (trans_prev - jnp.exp(-csd)) * emit_f

    exp_d = (p * dist).sum(-1)
    # imaginary end sample at the last in-grid distance
    any_hit = emit.any(-1)
    idx_last = jnp.where(
        any_hit,
        (max_steps - 1) - jnp.argmax(jnp.flip(emit, -1), axis=-1), 0)
    max_d = jnp.take_along_axis(dist, idx_last[..., None], -1)[..., 0]
    csd_last = jnp.take_along_axis(csd, idx_last[..., None], -1)[..., 0]
    exp_d = exp_d + jnp.exp(-csd_last) * max_d

    valid = any_hit & (tindex >= 0)
    pred = jnp.where(valid, exp_d, 0.0)
    gt = jnp.where(valid, jnp.minimum(gt_d, max_d), 0.0)
    return pred, gt


@partial(jax.jit, static_argnames=('max_steps', 'loss'))
def voxel_render_loss(sigma, origin, points, tindex, *, loss: str = 'l1',
                      max_steps: int = 417):
    """Render + in-kernel ray loss (the dvr ``render`` capability,
    reference third_lib/dvr/dvr.cu:639-670 with selectable l1/l2/absrel/bce).

    Returns (pred_dist, gt_dist, per_ray_loss).
    """
    pred, gt = voxel_render(sigma, origin, points, tindex,
                            max_steps=max_steps)
    valid = (gt > 0).astype(jnp.float32)
    if loss == 'l1':
        l = jnp.abs(pred - gt)
    elif loss == 'l2':
        l = (pred - gt) ** 2
    elif loss == 'absrel':
        l = jnp.abs(pred - gt) / jnp.maximum(gt, 1e-6)
    elif loss == 'bce':
        p = jnp.clip(pred / jnp.maximum(gt, 1e-6), 1e-6, 1 - 1e-6)
        l = -jnp.log(p)
    else:
        raise ValueError(loss)
    return pred, gt, l * valid


def voxel_render_forward(sigma, origin, points, tindex, max_steps: int = 417):
    """Inference-only rendering (the dvr ``render_forward`` capability,
    reference dvr.cu:66,327) — identical math, gradients stopped."""
    pred, gt = voxel_render(jax.lax.stop_gradient(sigma), origin, points,
                            tindex, max_steps=max_steps)
    return pred, gt


@partial(jax.jit, static_argnames=('max_steps',))
def voxel_render_v2(sigma, origin, points, tindex, sigma_regul,
                    max_steps: int = 417):
    """dvxlr_v2: also renders a per-ray regularisation term over the path.

    Returns (pred_dist, gt_dist, ray_pred, indicator) matching the reference
    wrapper contract (e2e_predictor_utils.py:119-143).
    """
    n, t, zdim, h, w = sigma.shape
    m = points.shape[1]
    t_safe = jnp.clip(tindex, 0, t - 1)
    orig = jnp.take_along_axis(origin, t_safe[..., None], axis=1)
    vox, delta, dist, emit, gt_d = jax.vmap(
        lambda o, p: _traverse(o, p, (zdim, h, w), max_steps)
    )(orig, points)

    pred, gt = voxel_render(sigma, origin, points, tindex,
                            max_steps=max_steps)
    flat_r = sigma_regul.reshape(n, t * zdim * h * w)
    base = t_safe[:, :, None] * (zdim * h * w)
    reg = jnp.take_along_axis(
        flat_r, (vox + base).reshape(n, m * max_steps),
        axis=1).reshape(n, m, max_steps)
    emit_f = emit.astype(jnp.float32)
    ray_pred = (reg * delta * emit_f).sum(-1)
    indicator = (emit.any(-1) & (tindex >= 0))
    return pred, gt, ray_pred, indicator.astype(jnp.float32)
