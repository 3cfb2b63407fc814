"""Latent rendering: radial ray-marching over BEV features.

Re-derivation of reference
projects/mmdet3d_plugin/bevformer/modules/ray_operations/latent_rendering.py:38-162:
per BEV cell, march a ray from the BEV center through the cell, accumulate
transmittance (cumprod of 1 - occupancy) over sampled waypoints, form the
"first-hit" probability for the cell, then aggregate LoRA-projected features
along the ray weighted by those probabilities and re-scale the cell embedding.

Everything is a fixed-size gather (grid_num waypoints per cell) + cumprod —
fully static, no data-dependent shapes. Channels-last layout.

On accelerators the two ray passes run as fused Pallas kernels
(``ops.latent_render_pallas``: packed maps VMEM-resident, gather +
along-ray reduction in one pass); backward recomputes through the XLA
formulation below. The XLA path remains the CPU/test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..ops.grid_sample import grid_sample_2d
from .layers import TorchLinear


# tests flip this to drive the Pallas aggregation backward in interpret
# mode on the CPU backend (production CPU keeps the autodiff-XLA oracle)
_PALLAS_AGG_BWD_ON_CPU = False
_PALLAS_FH_BWD_ON_CPU = False


def _scan_cells(block_fn, per_cell_args, n: int, chunk: int, bs: int,
                out_dim: int):
    """Scan a checkpointed block over chunks of BEV cells.

    per_cell_args: tuple of [bs, N, ...] arrays split along axis 1.
    Returns [bs, N, out_dim] fp32.
    """
    if n <= chunk:
        return jax.checkpoint(block_fn)(*per_cell_args)
    num_chunks = (n + chunk - 1) // chunk
    pad = num_chunks * chunk - n
    padded = [jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
              for a in per_cell_args]
    stacked = [jnp.moveaxis(
        a.reshape((bs, num_chunks, chunk) + a.shape[2:]), 1, 0)
        for a in padded]
    blk = jax.checkpoint(block_fn)

    def body(_, xs):
        return None, blk(*xs)

    _, out = jax.lax.scan(body, None, tuple(stacked))
    out = jnp.moveaxis(out, 0, 1).reshape(bs, num_chunks * chunk, out_dim)
    return out[:, :n]


def _bev_center_grids(h: int, w: int):
    """Normalised [0,1] cell-center coordinates, flattened row-major [H*W, 2]."""
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    gx, gy = np.meshgrid(xs, ys)  # [H, W]
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def _cell_path(grids, radial_norm, steps):
    """Radial waypoints + the cell itself: [bs, N, G+1, 2] in [-1, 1]."""
    way = 0.5 + radial_norm[:, :, None, :] * steps[None, None, :, None]
    path = jnp.concatenate([way, grids[:, :, None, :]], axis=2)
    return path * 2.0 - 1.0


# --------------------------------------------------------------- pass 1 ---

def _first_hit_xla(occ_pred, grids, radial_norm, steps, act, ray_chunk):
    """First-hit probability per cell: [bs, N, Z] (the reference's
    cumprod(1 - p*inside)[..., -1] * p[..., -1])."""
    bs, n = grids.shape[:2]
    occ_pred = occ_pred.astype(jnp.float32)
    zdim = occ_pred.shape[-1]
    g = steps.shape[0]

    def prob_block(grids_c, radial_norm_c):
        nc = grids_c.shape[1]
        path_n = _cell_path(grids_c, radial_norm_c, steps)
        per_prob = grid_sample_2d(
            occ_pred, path_n.reshape(bs, nc * (g + 1), 2))
        per_prob = per_prob.reshape(bs, nc, g + 1, zdim)
        if act == 'exp':
            per_prob = 1.0 - jnp.exp(-nn.relu(per_prob))
        else:
            per_prob = jax.nn.sigmoid(per_prob)
        path_len = jnp.sqrt((path_n ** 2).sum(-1, keepdims=True))
        inside = (path_len < path_len[..., -1:, :]).astype(per_prob.dtype)
        trans = jnp.cumprod(1.0 - per_prob * inside, axis=2)
        return trans[..., -1, :] * per_prob[..., -1, :]  # [bs, Nc, Z]

    return _scan_cells(prob_block, (grids, radial_norm), n, ray_chunk, bs,
                       zdim)


def _col_chunks(h, w, c, budget=12_600_000):
    """Packed-column ranges so each chunk's 4c-lane f32 table fits VMEM."""
    per_col = (h + 1) * 4 * c * 4
    k = max(1, -(-(per_col * (w + 1)) // budget))
    edges = np.linspace(0, w + 1, k + 1).astype(int)
    return [(int(edges[i]), int(edges[i + 1]) - 1) for i in range(k)
            if edges[i + 1] > edges[i]]


def _packed_col_chunk(fm_full, a, wc):
    """Packed corner table for packed columns [a, a+wc) of a map padded
    with the zero ring: fm_full [B, H+2, W+2, C] -> [B, (H+1)*wc(+pad8),
    4C]."""
    b = fm_full.shape[0]
    packed = jnp.concatenate(
        [fm_full[:, :-1, a:a + wc], fm_full[:, :-1, a + 1:a + wc + 1],
         fm_full[:, 1:, a:a + wc], fm_full[:, 1:, a + 1:a + wc + 1]],
        axis=-1)
    packed = packed.reshape(b, -1, packed.shape[-1])
    rpad = (-packed.shape[1]) % 8
    if rpad:
        packed = jnp.pad(packed, ((0, 0), (0, rpad), (0, 0)))
    return packed


def _path_rows(path_n, h, w, col_range=None):
    """Row indices + corner weights for [-1,1] path points.

    Returns (row [bs, N, S], cw4 [bs, N, 4S]); points outside the map (or
    outside ``col_range`` of packed columns when splitting) get zero
    weights."""
    x = ((path_n[..., 0].astype(jnp.float32) + 1.0) * w - 1.0) * 0.5
    y = ((path_n[..., 1].astype(jnp.float32) + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    xp = jnp.clip(ix0 + 1, 0, w)
    yp = jnp.clip(iy0 + 1, 0, h)
    if col_range is None:
        a, bcol, wc = 0, w, w + 1
        in_chunk = jnp.ones_like(valid)
    else:
        a, bcol = col_range
        wc = bcol - a + 1
        in_chunk = (xp >= a) & (xp <= bcol)
        valid = valid & in_chunk
    row = yp * wc + jnp.clip(xp - a, 0, wc - 1)
    cw4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                    axis=-1) * valid[..., None].astype(jnp.float32)
    bs, n, s = row.shape
    return (row.astype(jnp.int32), cw4.reshape(bs, n, 4 * s),
            in_chunk.astype(jnp.float32))


def _pad_q(arrs, n, q_block=256):
    pad = (-n) % q_block
    if not pad:
        return arrs, n
    return [jnp.pad(a, ((0, 0), (0, pad), (0, 0))) for a in arrs], n + pad


def _first_hit_fused_impl(occ_pred, grids, radial_norm, steps, act):
    """Column-chunked first-hit: each chunk returns [prod | p_last] halves;
    transmittance products multiply and p_last terms sum across chunks
    (a waypoint outside the chunk contributes a factor of 1)."""
    from ..ops.latent_render_pallas import ray_prob_fused
    from ..ops.msda_pallas import pack_atlas16
    bs, h, w, zdim = occ_pred.shape
    n = grids.shape[1]
    # 128-lane tables only (Mosaic DMA): pad the height-bin channels to 32
    zp = 32
    packed16 = (occ_pred.dtype == jnp.bfloat16 and
                (h + 1) * (w + 1) * 128 * 2 <= 12_600_000)
    dt = jnp.bfloat16 if packed16 else jnp.float32
    occ = jnp.pad(occ_pred.astype(dt),
                  ((0, 0), (0, 0), (0, 0), (0, zp - zdim)))
    path_n = _cell_path(grids, radial_norm, steps)       # [bs, N, S, 2]
    path_len = jnp.sqrt((path_n ** 2).sum(-1))
    inside = (path_len < path_len[..., -1:]).astype(jnp.float32)
    occ_full = jnp.pad(occ, ((0, 0), (1, 1), (1, 1), (0, 0)))
    interpret = jax.default_backend() == 'cpu'

    if packed16:
        # row-pair u32 table: half the VMEM keeps the 200x200 map in ONE
        # chunk (column chunks duplicate the full N x S gather work);
        # exact for bf16 occupancy logits.
        table = pack_atlas16(_packed_col_chunk(occ_full, 0, w + 1))
        row, cw4, _ = _path_rows(path_n, h, w)
        lastm = jnp.ones((bs, n, 1), jnp.float32)
        (row, cw4, mask, lastm), _ = _pad_q([row, cw4, inside, lastm], n)
        part = ray_prob_fused(table, row, cw4, mask, lastm, act=act,
                              interpret=interpret)
        prod, p_last = part[..., :zp], part[..., zp:]
        return (prod * p_last)[:, :n, :zdim]

    prod = None
    p_last = None
    for (a, bcol) in _col_chunks(h, w, zp):
        wc = bcol - a + 1
        table = _packed_col_chunk(occ_full, a, wc)
        row, cw4, in_chunk = _path_rows(path_n, h, w, col_range=(a, bcol))
        mask = inside * in_chunk
        lastm = in_chunk[..., -1:]
        (row, cw4, mask, lastm), _ = _pad_q([row, cw4, mask, lastm], n)
        part = ray_prob_fused(table, row, cw4, mask, lastm, act=act,
                              interpret=interpret)
        pr, pl_ = part[..., :zp], part[..., zp:]
        prod = pr if prod is None else prod * pr
        p_last = pl_ if p_last is None else p_last + pl_
    return (prod * p_last)[:, :n, :zdim]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _first_hit(occ_pred, grids, radial_norm, steps, act, ray_chunk):
    return _first_hit_fused_impl(occ_pred, grids, radial_norm, steps, act)


def _first_hit_fwd(occ_pred, grids, radial_norm, steps, act, ray_chunk):
    return (_first_hit(occ_pred, grids, radial_norm, steps, act, ray_chunk),
            (occ_pred, grids, radial_norm, steps))


def _first_hit_bwd(act, ray_chunk, res, g):
    """Pallas backward (round 5): K1 computes per-waypoint dlogit with an
    in-kernel prefix/suffix-product sweep (no division, saturation-safe),
    K2 scatters the bilinear-weighted dlogit into a column-chunked f32
    packed-corner table gradient. Replaces the XLA-recompute fallback that
    measured 730 ms/call at the production shape (~27x the fused forward;
    benchmarks/first_hit_bwd_bench.py). Only d(occ_pred) is produced —
    grids/radial/steps are geometry."""
    occ_pred, grids, radial_norm, steps = res
    bs, h, w, zdim = occ_pred.shape
    zp = 32
    packed16 = (occ_pred.dtype == jnp.bfloat16 and
                (h + 1) * (w + 1) * 128 * 2 <= 12_600_000)
    if jax.default_backend() == 'cpu' and not _PALLAS_FH_BWD_ON_CPU:
        packed16 = False          # interpret-mode scatter is very slow
    if not packed16:
        # f32 models / oversized maps: XLA-recompute fallback
        _, vjp = jax.vjp(
            lambda o: _first_hit_xla(o, grids, radial_norm, steps, act,
                                     ray_chunk), occ_pred)
        return vjp(g) + (None, None, None)

    from ..ops.latent_render_pallas import ray_prob_dlogit, ray_prob_scatter
    from ..ops.msda_pallas import pack_atlas16
    interpret = jax.default_backend() == 'cpu'
    n = grids.shape[1]
    occ = jnp.pad(occ_pred.astype(jnp.bfloat16),
                  ((0, 0), (0, 0), (0, 0), (0, zp - zdim)))
    path_n = _cell_path(grids, radial_norm, steps)
    path_len = jnp.sqrt((path_n ** 2).sum(-1))
    inside = (path_len < path_len[..., -1:]).astype(jnp.float32)
    occ_full = jnp.pad(occ, ((0, 0), (1, 1), (1, 1), (0, 0)))
    table = pack_atlas16(_packed_col_chunk(occ_full, 0, w + 1))
    row, cw4, _ = _path_rows(path_n, h, w)
    lastm = jnp.ones((bs, n, 1), jnp.float32)
    gp = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, zp - zdim)))
    (row, cw4, mask, lastm, gp), _ = _pad_q(
        [row, cw4, inside, lastm, gp], n)
    dlogit = ray_prob_dlogit(table, row, cw4, mask, lastm, gp, act=act,
                             zdim=zdim, interpret=interpret)

    docc_full = jnp.zeros((bs, h + 2, w + 2, zp), jnp.float32)
    for (a, bcol) in _col_chunks(h, w, zp, budget=10_500_000):
        wc = bcol - a + 1
        rowc, cwc, _ = _path_rows(path_n, h, w, col_range=(a, bcol))
        (rowc, cwc), _ = _pad_q([rowc, cwc], n)
        rows_c = (h + 1) * wc
        dtab = ray_prob_scatter(rowc, cwc, dlogit, rows=rows_c,
                                zdim=zdim, interpret=interpret)
        dp = dtab[:, :rows_c].reshape(bs, h + 1, wc, 4 * zp)
        docc_full = docc_full.at[:, :-1, a:a + wc].add(dp[..., :zp])
        docc_full = docc_full.at[:, :-1, a + 1:a + wc + 1].add(
            dp[..., zp:2 * zp])
        docc_full = docc_full.at[:, 1:, a:a + wc].add(
            dp[..., 2 * zp:3 * zp])
        docc_full = docc_full.at[:, 1:, a + 1:a + wc + 1].add(
            dp[..., 3 * zp:])
    docc = docc_full[:, 1:-1, 1:-1, :zdim].astype(occ_pred.dtype)
    return (docc, None, None, None)


_first_hit.defvjp(_first_hit_fwd, _first_hit_bwd)


def ray_first_hit(occ_pred, grids, radial_norm, steps, act, ray_chunk):
    if jax.default_backend() == 'cpu':
        return _first_hit_xla(occ_pred, grids, radial_norm, steps, act,
                              ray_chunk)
    return _first_hit(occ_pred, grids, radial_norm, steps, act, ray_chunk)


# --------------------------------------------------------------- pass 2 ---

def _aggregate_xla(fused_map, grids, radial_norm, steps, c_r, zdim, eps,
                   ray_chunk):
    """Prob-weighted ray aggregation: [bs, N, c_r]."""
    fused_map = fused_map.astype(jnp.float32)
    bs, n = grids.shape[:2]
    g = steps.shape[0]
    group = c_r // zdim

    def agg_block(grids_c, radial_norm_c):
        nc = grids_c.shape[1]
        path_n = _cell_path(grids_c, radial_norm_c, steps)
        way_n = path_n[:, :, :-1, :]  # [bs, Nc, G, 2]
        fused = grid_sample_2d(fused_map, way_n.reshape(bs, nc * g, 2))
        fused = fused.reshape(bs, nc, g, -1)
        feat_way = fused[..., :c_r]
        prob_way = fused[..., c_r:]
        boundary = jnp.minimum(1.0 / jnp.abs(radial_norm_c[..., 0:1]),
                               1.0 / jnp.abs(radial_norm_c[..., 1:2]))
        way_len = jnp.sqrt((way_n ** 2).sum(-1))
        way_valid = (way_len < boundary).astype(jnp.float32)
        prob_way = prob_way * way_valid[..., None]
        prob_way = prob_way / (prob_way.sum(axis=2, keepdims=True) + eps)
        # LoRA channels split into pred_height groups; group z weighted by
        # height-bin z's ray prob (reference latent_rendering.py:148-151
        # via the view(bs, pred_height, -1, N, G) aliasing).
        feat_g = feat_way.reshape(bs, nc, g, zdim, group)
        ray_feat = (feat_g * prob_way[..., None]).sum(axis=2)
        return ray_feat.reshape(bs, nc, c_r)

    return _scan_cells(agg_block, (grids, radial_norm), n, ray_chunk, bs,
                       c_r)


def _agg_geometry(grids, radial_norm, steps):
    """(way_n [bs,N,G,2], way_valid [bs,N,G]) shared by fwd and bwd."""
    path_n = _cell_path(grids, radial_norm, steps)
    way_n = path_n[:, :, :-1, :]   # waypoints only, not the cell itself
    boundary = jnp.minimum(1.0 / jnp.abs(radial_norm[..., 0:1]),
                           1.0 / jnp.abs(radial_norm[..., 1:2]))
    way_len = jnp.sqrt((way_n ** 2).sum(-1))
    way_valid = (way_len < boundary).astype(jnp.float32)   # [bs, N, G]
    return way_n, way_valid


def _aggregate_fused_partials(fused_map, grids, radial_norm, steps, c_r):
    """(num, den) of the fused aggregation (pre-division)."""
    from ..ops.latent_render_pallas import ray_agg_fused
    from ..ops.msda_pallas import pack_atlas16
    bs, h, w, _ = fused_map.shape
    n = grids.shape[1]
    way_n, way_valid = _agg_geometry(grids, radial_norm, steps)

    interp = jax.default_backend() == 'cpu'
    packed16 = (fused_map.dtype == jnp.bfloat16 and
                (h + 1) * (w + 1) * 8 * c_r * 2 <= 12_600_000)
    if packed16:
        fm_full = jnp.pad(fused_map, ((0, 0), (1, 1), (1, 1), (0, 0)))
        table = pack_atlas16(_packed_col_chunk(fm_full, 0, w + 1))
        row, cw4, _ = _path_rows(way_n, h, w)
        cw4 = cw4 * jnp.repeat(way_valid, 4, axis=-1)
        (row, cw4), _ = _pad_q([row, cw4], n)
        out = ray_agg_fused(table, row, cw4, interpret=interp)
        return out[:, :n, :c_r], out[:, :n, c_r:]

    fm = fused_map.astype(jnp.float32)
    fm_full = jnp.pad(fm, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for (a, bcol) in _col_chunks(h, w, 2 * c_r):
        wc = bcol - a + 1
        packed = _packed_col_chunk(fm_full, a, wc)
        row, cw4, _ = _path_rows(way_n, h, w, col_range=(a, bcol))
        # validity folds into the corner weights: an invalid waypoint
        # contributes zero to both the numerator and the denominator
        cw4 = cw4 * jnp.repeat(way_valid, 4, axis=-1)
        (row, cw4), npad = _pad_q([row, cw4], n)
        part = ray_agg_fused(packed, row, cw4, interpret=interp)
        out = part if out is None else out + part
    return out[:, :n, :c_r], out[:, :n, c_r:]


def _aggregate_fused_impl(fused_map, grids, radial_norm, steps, c_r, zdim,
                          eps):
    num, den = _aggregate_fused_partials(fused_map, grids, radial_norm,
                                         steps, c_r)
    return num / (den + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _aggregate(fused_map, grids, radial_norm, steps, c_r, zdim, eps,
               ray_chunk):
    return _aggregate_fused_impl(fused_map, grids, radial_norm, steps, c_r,
                                 zdim, eps)


def _aggregate_fwd(fused_map, grids, radial_norm, steps, c_r, zdim, eps,
                   ray_chunk):
    return (_aggregate(fused_map, grids, radial_norm, steps, c_r, zdim,
                       eps, ray_chunk),
            (fused_map, grids, radial_norm, steps))


def _aggregate_bwd(c_r, zdim, eps, ray_chunk, res, g):
    """Pallas backward of the aggregation pass (VERDICT r3 #4).

    Recompute (num, den) with one fwd pass, form (dnum, dden), then run
    the ``ray_agg_fused_bwd`` scatter kernel per f32 column chunk (the
    f32 gradient accumulator shares VMEM with the value table, so the
    table budget is halved) and unpack the corner adjoint. Only
    ``fused_map`` carries gradient — the ray geometry is constant, like
    the reference's CUDA ray ops. CPU keeps the autodiff-of-XLA oracle.
    """
    fused_map, grids, radial_norm, steps = res
    if jax.default_backend() == 'cpu' and not _PALLAS_AGG_BWD_ON_CPU:
        _, vjp = jax.vjp(
            lambda f: _aggregate_xla(f, grids, radial_norm, steps, c_r,
                                     zdim, eps, ray_chunk), fused_map)
        return vjp(g) + (None, None, None)

    from ..ops.latent_render_pallas import ray_agg_fused_bwd
    bs, h, w, cdim2 = fused_map.shape
    n = grids.shape[1]
    num, den = _aggregate_fused_partials(fused_map, grids, radial_norm,
                                         steps, c_r)
    inv = 1.0 / (den + eps)
    g32 = g.astype(jnp.float32)
    dnum = g32 * inv
    dden = -(g32 * num) * (inv * inv)
    dfb = jnp.concatenate([dnum, dden], axis=-1)          # [bs, n, 2c]

    way_n, way_valid = _agg_geometry(grids, radial_norm, steps)
    fm_full = jnp.pad(fused_map.astype(jnp.float32),
                      ((0, 0), (1, 1), (1, 1), (0, 0)))
    dfm_full = jnp.zeros_like(fm_full)
    c2 = cdim2
    # bf16 maps ride u32 row-pair value tables (exact): the f32 gradient
    # accumulator then fits next to a LARGER chunk -> 3 chunks not 4
    packed16 = fused_map.dtype == jnp.bfloat16
    budget = 8_000_000 if packed16 else 5_500_000
    for (a, bcol) in _col_chunks(h, w, 2 * c_r, budget=budget):
        wc = bcol - a + 1
        packed = _packed_col_chunk(fm_full, a, wc)
        if packed16:
            from ..ops.msda_pallas import pack_atlas16
            packed = pack_atlas16(packed)
        row, cw4, _ = _path_rows(way_n, h, w, col_range=(a, bcol))
        cw4 = cw4 * jnp.repeat(way_valid, 4, axis=-1)
        (row_p, cw4_p, dfb_p), _ = _pad_q([row, cw4, dfb], n)
        dtab = ray_agg_fused_bwd(packed, row_p, cw4_p, dfb_p,
                                 interpret=jax.default_backend() == 'cpu')
        dp = dtab[:, :(h + 1) * wc].reshape(bs, h + 1, wc, 4 * c2)
        # adjoint of _packed_col_chunk's 4-corner concat
        dfm_full = dfm_full.at[:, :-1, a:a + wc].add(dp[..., :c2])
        dfm_full = dfm_full.at[:, :-1, a + 1:a + wc + 1].add(
            dp[..., c2:2 * c2])
        dfm_full = dfm_full.at[:, 1:, a:a + wc].add(dp[..., 2 * c2:3 * c2])
        dfm_full = dfm_full.at[:, 1:, a + 1:a + wc + 1].add(
            dp[..., 3 * c2:])
    dfm = dfm_full[:, 1:-1, 1:-1].astype(fused_map.dtype)
    return (dfm, None, None, None)


_aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)


def ray_aggregate(fused_map, grids, radial_norm, steps, c_r, zdim, eps,
                  ray_chunk):
    group = c_r // zdim
    if (jax.default_backend() == 'cpu' or group != 1
            or (8 * c_r) % 128 != 0):
        # the fused kernel assumes feat/prob channel parity (group == 1,
        # true for every released config) and 128-lane packed rows
        # (4 corners x 2*c_r; c_r=16 in every released config — Mosaic
        # faults DMA-slicing a lane-padded table at smaller widths)
        return _aggregate_xla(fused_map, grids, radial_norm, steps, c_r,
                              zdim, eps, ray_chunk)
    return _aggregate(fused_map, grids, radial_norm, steps, c_r, zdim, eps,
                      ray_chunk)


class LatentRendering(nn.Module):
    """(reference config: embed_dims=256, pred_height=16, num_pred_fcs=0,
    grid_step=0.5, grid_num=256, reduction=16, act='sigmoid';
    projects/configs/.../vidar_1_8_nusc_3future.py:210-212)."""
    embed_dims: int = 256
    num_pred_fcs: int = 0
    pred_height: int = 16
    grid_num: int = 128
    grid_step: float = 0.5
    reduction: int = 16
    act: str = 'exp'
    dtype: jnp.dtype | None = None

    ray_chunk: int = 4096  # cells per scan step (bounds gather residuals)

    @nn.compact
    def __call__(self, embed, eps: float = 1e-3):
        """embed: [bs, bev_h, bev_w, C] -> same shape."""
        bs, bev_h, bev_w, c = embed.shape
        n = bev_h * bev_w
        g = self.grid_num

        # 1. occupancy head (MLP -> pred_height logits per cell).
        h = embed
        for i in range(self.num_pred_fcs):
            h = TorchLinear(self.embed_dims, dtype=self.dtype,
                            name=f'occ_fc{i}')(h)
            h = nn.LayerNorm(name=f'occ_ln{i}')(h)
            h = nn.relu(h)
        occ_pred = TorchLinear(self.pred_height, dtype=self.dtype,
                               name='occ_head')(h)  # [bs, H, W, Z]

        # 2. radial waypoints for each cell, in [0,1] BEV coords.
        grids = jnp.asarray(_bev_center_grids(bev_h, bev_w))  # [N, 2]
        grids = jnp.broadcast_to(grids[None], (bs, n, 2))
        radial = grids - 0.5
        radial_norm = radial / jnp.sqrt((radial ** 2).sum(-1, keepdims=True))
        radial_norm = jnp.nan_to_num(radial_norm)
        step = self.grid_step / (min(bev_h, bev_w) // 2)
        steps = (jnp.arange(g, dtype=jnp.float32) + 0.5) * step

        act = self.act
        if act not in ('exp', 'sigmoid'):
            raise NotImplementedError(act)
        zdim = self.pred_height

        # ---- pass 1: per-cell first-hit probability ----
        # occ_pred keeps the model dtype: for bf16 models the fused path
        # packs an exact u32 row-pair table (single VMEM chunk); the XLA
        # oracle casts to f32 internally.
        occ_path_prob = ray_first_hit(
            occ_pred, grids, radial_norm, steps, act, self.ray_chunk)

        # ---- pass 2: ray-feature aggregation in LoRA space ----
        # The LoRA features and the first-hit prob map are sampled at the
        # SAME waypoints — fused into one packed gather.
        lora_a = TorchLinear(self.embed_dims // self.reduction,
                             dtype=self.dtype, name='lora_a')(embed)
        c_r = self.embed_dims // self.reduction
        prob_map = occ_path_prob.reshape(bs, bev_h, bev_w, zdim)
        if self.dtype == jnp.bfloat16:
            # bf16 fused map -> exact u32 row-pair table in the fused
            # pass-2 kernel (single VMEM chunk). Rounds the first-hit
            # probabilities to bf16 — within the bf16 model's noise floor.
            fused_map = jnp.concatenate(
                [lora_a, prob_map.astype(jnp.bfloat16)], axis=-1)
        else:
            fused_map = jnp.concatenate(
                [lora_a.astype(jnp.float32), prob_map], axis=-1)

        ray_feat = ray_aggregate(fused_map, grids, radial_norm, steps, c_r,
                                 zdim, eps, self.ray_chunk)

        up = TorchLinear(self.embed_dims, dtype=self.dtype,
                         name='lora_b')(ray_feat)  # [bs, N, C]

        # 5. scale by first-hit probability per height group.
        up = up.reshape(bs, n, zdim, self.embed_dims // zdim)
        out = up * occ_path_prob[..., None]
        return out.reshape(bs, bev_h, bev_w, self.embed_dims)
