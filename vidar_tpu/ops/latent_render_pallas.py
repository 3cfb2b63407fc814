"""Fused Pallas TPU kernels for latent rendering (radial ray march).

The reference's LatentRendering walks a radial ray per BEV cell, samples
the occupancy/feature maps at every waypoint, and reduces along the ray
(reference projects/mmdet3d_plugin/bevformer/modules/ray_operations/
latent_rendering.py:93-162). The XLA formulation gathers ~10M rows per
call through HBM ``take``; these kernels keep the (packed-corner) maps
VMEM-resident and fuse the gather with the along-ray reduction.

Two kernels, mirroring the module's two passes:

1. ``ray_prob_fused`` — first-hit probability. The reference's
   ``cumprod(1 - p*inside)[..., -1] * p[..., -1]`` only needs the FINAL
   transmittance, i.e. a plain product over waypoints — associative, so
   the kernel accumulates it chunk by chunk (no prefix scan needed). The
   sigmoid/exp activation runs in-register; the strict-inside mask
   multiplies post-activation (it cannot fold into the bilinear weights).
2. ``ray_agg_fused`` — prob-weighted LoRA feature aggregation. Both the
   numerator sum(feat*prob) and denominator sum(prob) are additive over
   waypoints AND over column chunks of the fused map, so the >16 MB
   fused table column-splits across invocations like ops/msda_pallas;
   waypoint-validity folds into the corner weights (an invalid waypoint
   contributes zero to both sums).

Layout contract (host side in ``models.latent_rendering``): packed-corner
tables ``[B, R(+pad8), 4*C]`` f32 (zero ring), row indices ``[B, N, S]``
int32, corner weights ``[B, N, 4*S]`` f32 (sample-major corner-minor).
All the Mosaic constraints catalogued in ops/msda_pallas.py apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 8   # rays (BEV cells) per inner tile
SC = 8   # waypoints per lane chunk


def _chunks(s):
    return [(s0, min(SC, s - s0)) for s0 in range(0, s, SC)]


def _expand_mat(sc, seg):
    """[4*sc, sc*4*seg] 0/1: output lane l comes from input lane l//seg."""
    src = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * seg), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * seg), 1)
    return (dst // seg == src).astype(jnp.float32)


def _gather_chunk(table, idx_ref, q0, s0, sc):
    qrows = []
    for j in range(QT):
        samples = [table[pl.ds(idx_ref[0, q0 + j, s0 + k], 1), :]
                   for k in range(sc)]
        qrows.append(samples[0] if sc == 1
                     else jnp.concatenate(samples, axis=1))
    return jnp.concatenate(qrows, axis=0)   # [QT, sc*4*seg]


def _gather_chunk16(table, idx_ref, q0, s0, sc):
    """Gather from a row-pair-packed uint32 table (see
    msda_pallas._gather_chunk16): halves the VMEM table so the 200x200
    latent-render maps stay single-chunk instead of column-splitting
    (column chunks duplicate the full N x S row work)."""
    mask = jnp.uint32(0xffff0000)
    qrows = []
    for j in range(QT):
        samples = []
        for k in range(sc):
            r = idx_ref[0, q0 + j, s0 + k]
            word = table[pl.ds(jax.lax.shift_right_logical(r, 1), 1), :]
            shift = ((r & 1) * 16).astype(jnp.uint32)
            y = jax.lax.shift_left(word, jnp.broadcast_to(shift, word.shape))
            y = jax.lax.bitwise_and(y, jnp.broadcast_to(mask, word.shape))
            samples.append(jax.lax.bitcast_convert_type(y, jnp.float32))
        qrows.append(samples[0] if sc == 1
                     else jnp.concatenate(samples, axis=1))
    return jnp.concatenate(qrows, axis=0)


def _ray_prob_kernel(act, packed16, idx_ref, cw_ref, mask_ref,
                     lastm_ref, atlas_ref, out_ref, table, sem):
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = mask_ref.shape[2]
    q_blk = out_ref.shape[1]
    z = out_ref.shape[2] // 2

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc, z) for _, sc in _chunks(s)}
    gather = _gather_chunk16 if packed16 else _gather_chunk

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        acc = jnp.ones((QT, z), jnp.float32)
        p_last = jnp.zeros((QT, z), jnp.float32)
        for (s0, sc) in _chunks(s):
            g = gather(table, idx_ref, q0, s0, sc)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            p = g * w_rep                               # [QT, sc*4z]
            msk = mask_ref[0, pl.ds(q0, QT), s0:s0 + sc]
            for k in range(sc):
                base = k * 4 * z
                logit = (p[:, base:base + z] +
                         p[:, base + z:base + 2 * z] +
                         p[:, base + 2 * z:base + 3 * z] +
                         p[:, base + 3 * z:base + 4 * z])
                if act == 'exp':
                    ps = 1.0 - jnp.exp(-jnp.maximum(logit, 0.0))
                else:
                    ps = jax.nn.sigmoid(logit)
                m = jnp.broadcast_to(msk[:, k:k + 1], (QT, z))
                acc = acc * (1.0 - ps * m)
                if s0 + k == s - 1:
                    p_last = ps
        lastm = jnp.broadcast_to(
            lastm_ref[0, pl.ds(q0, QT), 0:1], (QT, z))
        out_ref[0, pl.ds(q0, QT), :] = jnp.concatenate(
            [acc, p_last * lastm], axis=1)
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


@functools.partial(jax.jit,
                   static_argnames=('act', 'q_block', 'interpret'))
def ray_prob_fused(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                   cw4: jnp.ndarray, mask: jnp.ndarray,
                   last_in: jnp.ndarray, act: str = 'sigmoid',
                   q_block: int = 256, interpret: bool = False
                   ) -> jnp.ndarray:
    """One column-chunk of the first-hit pass -> [B, N, 2Z] partials
    ``[transmittance-product | p_last * last-in-chunk]``. The caller
    multiplies the products and sums the p_last halves across chunks
    (out-of-chunk waypoints contribute a factor of 1 via ``mask``=0)."""
    bsz, r, lanes = atlas.shape
    z = lanes // 4
    _, n, s = row_idx.shape
    packed16 = atlas.dtype == jnp.uint32
    assert atlas.dtype in (jnp.float32, jnp.uint32) and lanes == 128
    assert n % q_block == 0 and q_block % QT == 0
    assert cw4.shape == (bsz, n, 4 * s) and mask.shape == (bsz, n, s)
    assert last_in.shape == (bsz, n, 1)

    return pl.pallas_call(
        functools.partial(_ray_prob_kernel, act, packed16),
        grid=(bsz, n // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 1), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, 2 * z),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 2 * z), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, lanes), atlas.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, cw4, mask, last_in, atlas)


def _ray_agg_kernel(packed16, idx_ref, cw_ref, atlas_ref, out_ref,
                    table, sem):
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = out_ref.shape[1]
    cdim = out_ref.shape[2] // 2          # feat/prob channel split

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc, 2 * cdim) for _, sc in _chunks(s)}
    gather = _gather_chunk16 if packed16 else _gather_chunk

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        num = jnp.zeros((QT, cdim), jnp.float32)
        den = jnp.zeros((QT, cdim), jnp.float32)
        for (s0, sc) in _chunks(s):
            g = gather(table, idx_ref, q0, s0, sc)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            p = g * w_rep                               # [QT, sc*8*cdim]
            for k in range(sc):
                base = k * 8 * cdim
                fold = (p[:, base:base + 2 * cdim] +
                        p[:, base + 2 * cdim:base + 4 * cdim] +
                        p[:, base + 4 * cdim:base + 6 * cdim] +
                        p[:, base + 6 * cdim:base + 8 * cdim])
                feat = fold[:, :cdim]
                prob = fold[:, cdim:]
                num = num + feat * prob
                den = den + prob
        out_ref[0, pl.ds(q0, QT), :] = jnp.concatenate([num, den], axis=1)
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


def _dfold_rep_mat(cdim2):
    """[2*cdim, 4*2*cdim] 0/1 replicating a folded-row gradient across the
    4 corner segments: D[ch, corner*2*cdim + ch] = 1."""
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (cdim2, 4 * cdim2), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (cdim2, 4 * cdim2), 1)
    return (l_ids % cdim2 == d_ids).astype(jnp.float32)


def _ray_agg_bwd_kernel(idx_ref, cw_ref, dfb_ref, atlas_ref, dtab_ref,
                        table, acc, sem_in, sem_out):
    """Backward of the aggregation pass w.r.t. the packed table.

    For waypoint s of ray q with folded row (feat_s | prob_s) and upstream
    (dnum | dden) (host-side from g, num, den):
      dfold = [prob_s * dnum | feat_s * dnum + dden]
    and the packed-row gradient is the corner-weight expansion of dfold,
    accumulated into a VMEM f32 scratch (sequential, race-free) and DMA'd
    out after the batch's last ray block. The value table must be f32
    column chunks here (the f32 gradient accumulator shares VMEM with it;
    the caller halves the table budget so both fit).
    """
    b = pl.program_id(0)
    qb = pl.program_id(1)
    n_qb = pl.num_programs(1)
    s = cw_ref.shape[2] // 4
    q_blk = cw_ref.shape[1]
    cdim2 = dfb_ref.shape[2]              # 2*cdim lanes: [dnum | dden]
    cdim = cdim2 // 2

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[b], table, sem_in)
        cp.start()
        cp.wait()
        acc[...] = jnp.zeros_like(acc)

    emats = {sc: _expand_mat(sc, 2 * cdim) for _, sc in _chunks(s)}
    dmat = _dfold_rep_mat(cdim2)
    hi = jax.lax.Precision.HIGHEST

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        dfb = dfb_ref[0, pl.ds(q0, QT), :]            # [QT, 2c]
        dnum = dfb[:, :cdim]
        dden = dfb[:, cdim:]
        for (s0, sc) in _chunks(s):
            g = _gather_chunk(table, idx_ref, q0, s0, sc)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            p = g * w_rep                             # [QT, sc*4*2c]
            for k in range(sc):
                base = k * 4 * cdim2
                fold = (p[:, base:base + cdim2] +
                        p[:, base + cdim2:base + 2 * cdim2] +
                        p[:, base + 2 * cdim2:base + 3 * cdim2] +
                        p[:, base + 3 * cdim2:base + 4 * cdim2])
                feat = fold[:, :cdim]
                prob = fold[:, cdim:]
                dfold = jnp.concatenate(
                    [prob * dnum, feat * dnum + dden], axis=1)  # [QT, 2c]
                d_rep = jax.lax.dot_general(
                    dfold, dmat,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)
                rg = d_rep * w_rep[:, base:base + 4 * cdim2]
                for j in range(QT):
                    r = idx_ref[0, q0 + j, s0 + k]
                    acc[pl.ds(r, 1), :] = (acc[pl.ds(r, 1), :] +
                                           rg[j:j + 1, :])
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)

    @pl.when(qb == n_qb - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dtab_ref.at[b], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def ray_agg_fused_bwd(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                      cw4: jnp.ndarray, dfb: jnp.ndarray,
                      q_block: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """Packed-table gradient of one aggregation column chunk.

    atlas: [B, R, 128] f32 (column chunk; R*128*4*2 bytes must fit VMEM —
    value table + f32 gradient accumulator); dfb: [B, N, 2*cdim] f32 =
    [dnum | dden] upstream gradients. Returns [B, R, 128] f32.
    """
    bsz, r, lanes = atlas.shape
    cdim = lanes // 8
    _, n, s = row_idx.shape
    assert atlas.dtype == jnp.float32
    assert n % q_block == 0 and q_block % QT == 0
    assert cw4.shape == (bsz, n, 4 * s)
    assert dfb.shape == (bsz, n, 2 * cdim)

    return pl.pallas_call(
        _ray_agg_bwd_kernel,
        grid=(bsz, n // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, 2 * cdim),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, r, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, lanes), jnp.float32),
                        pltpu.VMEM((r, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, cw4, dfb, atlas)


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def ray_agg_fused(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                  cw4: jnp.ndarray, q_block: int = 256,
                  interpret: bool = False) -> jnp.ndarray:
    """Prob-weighted ray aggregation partials -> [B, N, 2*cdim]
    (num | den). Waypoint validity and column-chunk membership are folded
    into ``cw4`` by the caller; partial outputs over chunks are summed."""
    bsz, r, lanes = atlas.shape
    cdim = lanes // 8                     # rows are 4 corners x 2*cdim
    _, n, s = row_idx.shape
    packed16 = atlas.dtype == jnp.uint32
    assert atlas.dtype in (jnp.float32, jnp.uint32)
    assert n % q_block == 0 and q_block % QT == 0
    assert cw4.shape == (bsz, n, 4 * s)

    return pl.pallas_call(
        functools.partial(_ray_agg_kernel, packed16),
        grid=(bsz, n // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, 2 * cdim),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 2 * cdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, lanes), atlas.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, cw4, atlas)
