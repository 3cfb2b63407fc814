"""Ray-wise losses and point-cloud decoding for future occupancy volumes.

TPU re-formulation of the reference's ray machinery
(projects/mmdet3d_plugin/bevformer/dense_heads/vidar_head_base.py):

* ``_get_grid_features`` (reference :420-509) loops python-side over
  (batch, frame) pairs with dynamic ray counts and calls F.grid_sample per
  pair. Here every GT point is a lane in a fixed-size [bs, P] array carrying
  its own frame index; waypoint sampling over all (point, waypoint) pairs is
  ONE frame-indexed trilinear gather into the [bs, V, Z, H, W] sigma volume,
  with padding/out-of-window lanes masked by zero loss weight.
* the ray cross-entropy along each ray (reference :586-592): the first
  waypoint is the GT hit (positive class), waypoints outside the volume get
  -inf logits.
* the expected-distance (gumbel straight-through) decode (reference :754-773)
  and the argmax depth decode used at eval (reference :662-752).

All coordinates follow the reference's voxel-grid convention: grid index g in
[0, size], normalised g/size*2-1 then sampled with align_corners=False — i.e.
pixel coordinate g - 0.5.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import functools

import jax
import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray

NEG_INF = -1e9  # used instead of float('-inf') to keep grads NaN-free


def coords_to_voxel_grids(xyz: Array, bev_h: int, bev_w: int,
                          pillar_num: int, pc_range: Sequence[float]) -> Array:
    """Metric coords -> continuous voxel-grid coords [0, size] per axis.

    (reference e2e_predictor_utils.py:36-45.)
    """
    pc = pc_range
    gx = (xyz[..., 0] - pc[0]) / (pc[3] - pc[0]) * bev_w
    gy = (xyz[..., 1] - pc[1]) / (pc[4] - pc[1]) * bev_h
    gz = (xyz[..., 2] - pc[2]) / (pc[5] - pc[2]) * pillar_num
    return jnp.stack([gx, gy, gz], axis=-1)


# rays per lax.map chunk in sample_sigma_frames: bounds the gathered
# [bs, chunk, G, 4Z] buffer (f32, e.g. 4096x513x64 = 538 MB at flagship
# shapes) — unchunked, the 32768-ray flagship gather materializes 4.01 GB
# TWICE in the train backward (gathered rows + cotangent), the #1
# contributor to the round-4 flagship train-step OOM.
RAY_CHUNK = 4096


def sample_sigma_frames(sigma: Array, grids: Array, frame_idx: Array,
                        chunk: Optional[int] = RAY_CHUNK) -> Array:
    """Frame-indexed trilinear sampling of per-frame sigma volumes.

    TPU formulation: trilinear = bilinear over (x, y) x linear over z. The
    whole z-column (all Z bins) of all 4 xy-corners is packed into ONE row
    (4*Z values), so each waypoint costs a single row gather (TPU gathers are
    row-rate bound); the z interpolation is then a dense one-hot einsum on
    the VPU. Rays are processed in ``chunk``-sized ``lax.map`` slices so the
    gathered [.., G, 4Z] rows (and, under autodiff, their cotangents) never
    materialize for all P rays at once — the map's backward is sequential by
    construction, which is exactly the liveness bound we want.

    Args:
      sigma: [bs, V, Z, H, W] occupancy logits per rollout frame.
      grids: [bs, P, G, 3] continuous voxel coords (x->W, y->H, z->Z) in
        [0, size] units.
      frame_idx: [bs, P] int32 rollout-frame of each ray; lanes outside
        [0, V) sample zeros.
      chunk: rays per sequential slice (None = single dense gather).

    Returns:
      [bs, P, G] fp32 sampled values (zero outside the volume, matching
      grid_sample's zero padding).
    """
    from ..ops.gather import pack_corners_2d, bilinear_weights, take_rows

    bs, v, zdim, h, w = sigma.shape
    p, g = grids.shape[1], grids.shape[2]

    # pack xy-corners with the z column as channels: [bs*V, (h+1)(w+1), 4*Z]
    maps = sigma.transpose(0, 1, 3, 4, 2).reshape(bs * v, h, w, zdim)
    packed = pack_corners_2d(maps)
    rows_per = packed.shape[1]
    flat = packed.reshape(bs * v * rows_per, 4 * zdim)

    def _sample(grids_c: Array, fi_c: Array) -> Array:
        """grids_c [bs, pc, G, 3], fi_c [bs, pc] -> [bs, pc, G]."""
        pc = grids_c.shape[1]
        px = grids_c[..., 0].astype(jnp.float32) - 0.5
        py = grids_c[..., 1].astype(jnp.float32) - 0.5
        pz = grids_c[..., 2].astype(jnp.float32) - 0.5

        row, cw = bilinear_weights(px, py, h, w)  # [bs,pc,G], [bs,pc,G,4]

        fi = fi_c[:, :, None]  # [bs, pc, 1]
        frame_ok = (fi >= 0) & (fi < v)
        base = (jnp.arange(bs, dtype=jnp.int32)[:, None, None] * v +
                jnp.clip(fi, 0, v - 1)) * rows_per
        cw_m = cw * frame_ok[..., None].astype(jnp.float32)

        gathered = take_rows(flat, row + base)  # [bs, pc, G, 4*Z]
        gathered = gathered.reshape(bs, pc, g, 4, zdim).astype(jnp.float32)
        xy = jnp.einsum('bpgcz,bpgc->bpgz', gathered, cw_m.astype(jnp.float32))

        # linear z interpolation with zero padding outside [0, Z)
        z0 = jnp.floor(pz)
        wz1 = pz - z0
        iz0 = z0.astype(jnp.int32)
        zi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, zdim), 3)
        w_z = (jnp.where(zi == iz0[..., None], 1.0 - wz1[..., None], 0.0) +
               jnp.where(zi == iz0[..., None] + 1, wz1[..., None], 0.0))
        return jnp.einsum('bpgz,bpgz->bpg', xy, w_z)

    if chunk is None or p <= chunk:
        return _sample(grids, frame_idx)

    pad = (-p) % chunk
    if pad:
        grids = jnp.pad(grids, ((0, 0), (0, pad), (0, 0), (0, 0)))
        frame_idx = jnp.pad(frame_idx, ((0, 0), (0, pad)),
                            constant_values=-1)
    nch = (p + pad) // chunk
    g_r = grids.reshape(bs, nch, chunk, g, 3).transpose(1, 0, 2, 3, 4)
    f_r = frame_idx.reshape(bs, nch, chunk).transpose(1, 0, 2)
    out = jax.lax.map(lambda ab: _sample(ab[0], ab[1]), (g_r, f_r))
    out = out.transpose(1, 0, 2, 3).reshape(bs, nch * chunk, g)
    return out[:, :p]


class RayFeatures(NamedTuple):
    feats: Array        # [bs, P, G+1] waypoint logits, -inf outside volume
    lengths: Array      # [bs, P, G+1] distance (grid units) from origin
    ray_valid: Array    # [bs, P] bool — ray's GT point inside the volume
    outside: Array      # [bs, P, G+1] bool — waypoint outside the volume



def sample_sigma_rays(sigma: Array, origin: Array, r_norm: Array,
                      gt_grids: Array, steps: Array, frame_idx: Array,
                      chunk: Optional[int] = RAY_CHUNK,
                      with_gt_waypoint: bool = True):
    """Chunk-LAZY ray sampling: waypoints are recomputed per ``lax.map``
    slice from (origin, direction, steps) instead of materializing the
    [bs, P, G(+1), 3] waypoint tensor up front (202 MB/channel at the
    flagship shape, carried through the fwd scan, its checkpoint
    recompute AND the backward — the round-5 train trace priced those
    scans at ~0.4 s/channel each way).

    Returns (feats [bs, P, S], outside [bs, P, S] bool) where S = G(+1)
    and waypoint 0 is the GT point itself when ``with_gt_waypoint``.
    """
    from ..ops.gather import pack_corners_2d, bilinear_weights, take_rows

    bs, v, zdim, h, w = sigma.shape
    p = gt_grids.shape[1]
    g = steps.shape[0]

    maps = sigma.transpose(0, 1, 3, 4, 2).reshape(bs * v, h, w, zdim)
    packed = pack_corners_2d(maps)
    rows_per = packed.shape[1]
    flat = packed.reshape(bs * v * rows_per, 4 * zdim)
    size = jnp.asarray([w, h, zdim], jnp.float32)

    def _sample(origin_c, rn_c, gt_c, fi_c):
        """[bs, pc, 3] x3 + [bs, pc] -> (feats, outside) [bs, pc, S]."""
        march = (origin_c[:, :, None, :] +
                 rn_c[:, :, None, :] * steps[None, None, :, None])
        if with_gt_waypoint:
            way = jnp.concatenate([gt_c[:, :, None, :], march], axis=2)
        else:
            way = march
        norm = way / size * 2.0 - 1.0
        outside_c = jnp.any((norm <= -1.0) | (norm >= 1.0), axis=-1)

        pc, sg = way.shape[1], way.shape[2]
        px = way[..., 0].astype(jnp.float32) - 0.5
        py = way[..., 1].astype(jnp.float32) - 0.5
        pz = way[..., 2].astype(jnp.float32) - 0.5
        row, cw = bilinear_weights(px, py, h, w)
        fi = fi_c[:, :, None]
        frame_ok = (fi >= 0) & (fi < v)
        base = (jnp.arange(bs, dtype=jnp.int32)[:, None, None] * v +
                jnp.clip(fi, 0, v - 1)) * rows_per
        cw_m = cw * frame_ok[..., None].astype(jnp.float32)
        gathered = take_rows(flat, row + base)
        gathered = gathered.reshape(bs, pc, sg, 4, zdim).astype(jnp.float32)
        xy = jnp.einsum('bpgcz,bpgc->bpgz', gathered,
                        cw_m.astype(jnp.float32))
        z0 = jnp.floor(pz)
        wz1 = pz - z0
        iz0 = z0.astype(jnp.int32)
        zi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, zdim), 3)
        w_z = (jnp.where(zi == iz0[..., None], 1.0 - wz1[..., None], 0.0) +
               jnp.where(zi == iz0[..., None] + 1, wz1[..., None], 0.0))
        return jnp.einsum('bpgz,bpgz->bpg', xy, w_z), outside_c

    if chunk is None or p <= chunk:
        return _sample(origin, r_norm, gt_grids, frame_idx)

    pad = (-p) % chunk
    if pad:
        padv = lambda a: jnp.pad(a, ((0, 0), (0, pad), (0, 0)))
        origin, r_norm, gt_grids = map(padv, (origin, r_norm, gt_grids))
        frame_idx = jnp.pad(frame_idx, ((0, 0), (0, pad)),
                            constant_values=-1)
    nch = (p + pad) // chunk

    def _r(a):
        return a.reshape((bs, nch, chunk) + a.shape[2:]).transpose(
            (1, 0, 2) + tuple(range(3, a.ndim + 1)))

    feats, outside = jax.lax.map(
        lambda ab: _sample(*ab),
        (_r(origin), _r(r_norm), _r(gt_grids), _r(frame_idx)))
    fix = lambda a: a.transpose(1, 0, 2, 3).reshape(
        bs, nch * chunk, a.shape[-1])[:, :p]
    return fix(feats), fix(outside)


def ray_waypoint_features(sigma: Array, origin_grids: Array, gt_grids: Array,
                          frame_idx: Array, ray_grid_num: int,
                          ray_grid_step: float) -> RayFeatures:
    """Sample waypoints along origin->gt rays from per-frame sigma volumes.

    Waypoint 0 is the GT point itself (the CE positive class); waypoints
    1..G march from the origin at (k+0.5)*step in grid units
    (reference vidar_head_base.py:433-451).

    Args:
      sigma: [bs, V, Z, H, W].
      origin_grids: [bs, V, 3] ray origins (voxel-grid coords) per frame.
      gt_grids: [bs, P, 3] GT points (voxel-grid coords).
      frame_idx: [bs, P] int32 per-ray frame (out of [0, V) -> ignored lane).
    """
    bs, v, zdim, h, w = sigma.shape
    p = gt_grids.shape[1]
    g = ray_grid_num

    fi_safe = jnp.clip(frame_idx, 0, v - 1)
    origin = jnp.take_along_axis(origin_grids, fi_safe[..., None], axis=1)

    r = gt_grids - origin
    r_len = jnp.sqrt(jnp.maximum((r ** 2).sum(-1, keepdims=True), 1e-12))
    r_norm = r / r_len
    steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) * ray_grid_step
    # closed-form lengths: |march_k - origin| = step_k * |r_norm| (the
    # direction is unit except for degenerate gt==origin rays, where
    # |r_norm| ~ 0 reproduces the old sqrt exactly); waypoint 0 is the
    # GT point at |r|. No [bs, P, G+1, 3] waypoint tensor needed.
    rn_len = jnp.sqrt((r_norm ** 2).sum(-1, keepdims=True))
    lengths = jnp.concatenate(
        [jnp.sqrt(jnp.maximum((r ** 2).sum(-1, keepdims=True), 0.0)),
         steps[None, None, :] * rn_len], axis=2)

    size = jnp.asarray([w, h, zdim], jnp.float32)
    norm0 = gt_grids / size * 2.0 - 1.0
    ray_valid = jnp.all((norm0 > -1.0) & (norm0 < 1.0), axis=-1)  # [bs, P]

    feats, outside = sample_sigma_rays(sigma, origin, r_norm, gt_grids,
                                       steps, frame_idx)
    feats = jnp.where(outside, NEG_INF, feats)
    return RayFeatures(feats, lengths, ray_valid, outside)


def ray_ce_loss(feats: Array, weights: Array) -> Array:
    """Cross entropy along each ray with the GT waypoint (index 0) positive.

    Args:
      feats: [bs, P, G+1] logits (-inf at invalid waypoints).
      weights: [bs, P] per-ray loss weight (0 disables a lane).
    Returns scalar: sum(w * CE) / clamp(sum(w), 1)
    (reference vidar_head_base.py:586-592).
    """
    logz = jax.nn.logsumexp(feats, axis=-1)
    ce = logz - feats[..., 0]
    total_w = jnp.maximum(weights.sum(), 1.0)
    return (ce * weights).sum() / total_w


def gumbel_softmax_distance(feats: Array, lengths: Array,
                            rng: Optional[jax.Array]) -> Array:
    """Straight-through expected-distance decode (reference :754-773).

    Hard gumbel sample picks a waypoint whose length is the (detached)
    distance; the differentiable factor is P(next waypoints beyond the sample).
    With rng=None the hard sample degenerates to argmax (eval determinism).
    """
    if rng is not None:
        u = jax.random.uniform(rng, feats.shape, minval=1e-20, maxval=1.0)
        gumbel = -jnp.log(-jnp.log(u))
        noisy = feats + gumbel
    else:
        noisy = feats
    hard_idx = jnp.argmax(noisy, axis=-1)
    pred_dist = jnp.take_along_axis(lengths, hard_idx[..., None],
                                    axis=-1)[..., 0]
    pred_dist = jax.lax.stop_gradient(pred_dist)

    shifted = feats - jax.lax.stop_gradient(feats.max(-1, keepdims=True))
    exp = jnp.exp(shifted)
    exp_whole = exp.sum(-1)
    nxt = (lengths > pred_dist[..., None]).astype(jnp.float32)
    prob_next = (exp * nxt).sum(-1) / jnp.maximum(exp_whole, 1e-20)
    prob_next = 1.0 - jax.lax.stop_gradient(prob_next) + prob_next
    return prob_next * pred_dist


def argmax_ray_depth(sigma: Array, origin_grids: Array, gt_grids: Array,
                     frame_idx: Array, ray_grid_num: int,
                     ray_grid_step: float):
    """Eval-time depth decode (reference vidar_head_base.py:700-737).

    Marches G waypoints (no GT prepend), masks exactly-zero samples to -inf
    (out-of-volume signature of zero-padded grid_sample), and takes the argmax
    waypoint's distance.

    Returns (pred_dist, gt_dist) in grid units, [bs, P] each.
    """
    bs, v, zdim, h, w = sigma.shape
    p = gt_grids.shape[1]
    g = ray_grid_num

    fi_safe = jnp.clip(frame_idx, 0, v - 1)
    origin = jnp.take_along_axis(origin_grids, fi_safe[..., None], axis=1)
    r = gt_grids - origin
    gt_dist = jnp.sqrt(jnp.maximum((r ** 2).sum(-1), 0.0))
    r_norm = r / jnp.sqrt(jnp.maximum((r ** 2).sum(-1, keepdims=True), 1e-12))
    steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) * ray_grid_step
    # chunk-lazy sampling + closed-form lengths (see sample_sigma_rays)
    rn_len = jnp.sqrt((r_norm ** 2).sum(-1, keepdims=True))
    lengths = steps[None, None, :] * rn_len

    s, _ = sample_sigma_rays(sigma, origin, r_norm, gt_grids, steps,
                             frame_idx, with_gt_waypoint=False)
    s = jnp.where(s == 0.0, NEG_INF, s)
    idx = jnp.argmax(s, axis=-1)
    pred_dist = jnp.take_along_axis(lengths, idx[..., None], axis=-1)[..., 0]
    return pred_dist, gt_dist
