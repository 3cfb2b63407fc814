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


def _ray_agg_bwd_kernel(packed16, idx_ref, cw_ref, dfb_ref,
                        atlas_ref, dtab_ref, table, acc, sem_in, sem_out):
    """Backward of the aggregation pass w.r.t. the packed table.

    For waypoint s of ray q with folded row (feat_s | prob_s) and upstream
    (dnum | dden) (host-side from g, num, den):
      dfold = [prob_s * dnum | feat_s * dnum + dden]
    and the packed-row gradient is the corner-weight expansion of dfold,
    accumulated into a VMEM f32 scratch (sequential, race-free) and DMA'd
    out after the batch's last ray block.

    Round-5 structure: the value table may be row-pair-packed u32
    (``packed16`` — bf16-exact, half the VMEM, so the f32 gradient
    accumulator fits next to a LARGER column chunk: 3 chunks instead of
    4); the dfold->row expansion runs as ONE chunk-batched matmul (the
    per-waypoint [QT, 2c] matmuls paid MXU fill latency 2.6M times per
    call); (``inch`` flags are accepted for layout compatibility; a per-row
    RMW skip measured slower than the zero-RMW it saved).
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
    dmats = {sc: _dfold_rep_chunk_mat(cdim2, sc) for _, sc in _chunks(s)}
    hi = jax.lax.Precision.HIGHEST
    gather = _gather_chunk16 if packed16 else _gather_chunk

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        dfb = dfb_ref[0, pl.ds(q0, QT), :]            # [QT, 2c]
        dnum = dfb[:, :cdim]
        dden = dfb[:, cdim:]
        for (s0, sc) in _chunks(s):
            g = gather(table, idx_ref, q0, s0, sc)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            p = g * w_rep                             # [QT, sc*4*2c]
            dfold_list = []
            for k in range(sc):
                base = k * 4 * cdim2
                fold = (p[:, base:base + cdim2] +
                        p[:, base + cdim2:base + 2 * cdim2] +
                        p[:, base + 2 * cdim2:base + 3 * cdim2] +
                        p[:, base + 3 * cdim2:base + 4 * cdim2])
                feat = fold[:, :cdim]
                prob = fold[:, cdim:]
                dfold_list.append(jnp.concatenate(
                    [prob * dnum, feat * dnum + dden], axis=1))
            d_rep = jax.lax.dot_general(
                jnp.concatenate(dfold_list, axis=1), dmats[sc],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            rg = d_rep * w_rep                        # [QT, sc*4*2c]
            # (a per-row @pl.when skip of out-of-chunk RMWs measured
            # slower than the wasted zero-RMW itself)
            for k in range(sc):
                base = k * 4 * cdim2
                for j in range(QT):
                    r = idx_ref[0, q0 + j, s0 + k]
                    acc[pl.ds(r, 1), :] = (acc[pl.ds(r, 1), :] +
                                           rg[j:j + 1,
                                              base:base + 4 * cdim2])
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)

    @pl.when(qb == n_qb - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dtab_ref.at[b], sem_out)
        cp.start()
        cp.wait()


def _dfold_rep_chunk_mat(cdim2, sc):
    """[sc*cdim2, sc*4*cdim2] 0/1: chunk-batched ``_dfold_rep_mat`` —
    input lane k*cdim2+ch maps to lanes k*4*cdim2 + corner*cdim2 + ch."""
    rows, cols = sc * cdim2, sc * 4 * cdim2
    src = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return ((src // cdim2 == dst // (4 * cdim2)) &
            (src % cdim2 == dst % cdim2)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def ray_agg_fused_bwd(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                      cw4: jnp.ndarray, dfb: jnp.ndarray,
                      q_block: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """Packed-table gradient of one aggregation column chunk.

    atlas: [B, R, 128] f32 OR row-pair-packed u32 (bf16-exact) column
    chunk — the u32 form halves the resident value table so the f32
    gradient accumulator fits next to a larger chunk. dfb: [B, N, 2*cdim] f32 =
    [dnum | dden] upstream gradients. Returns [B, rows, 128] f32 where
    ``rows`` is the UNPACKED row count.
    """
    bsz, rt, lanes = atlas.shape
    packed16 = atlas.dtype == jnp.uint32
    rows = rt if not packed16 else 2 * rt
    cdim = lanes // 8
    _, n, s = row_idx.shape
    assert n % q_block == 0 and q_block % QT == 0
    assert cw4.shape == (bsz, n, 4 * s)
    assert dfb.shape == (bsz, n, 2 * cdim)

    return pl.pallas_call(
        functools.partial(_ray_agg_bwd_kernel, packed16),
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
        out_shape=jax.ShapeDtypeStruct((bsz, rows, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rt, lanes), atlas.dtype),
                        pltpu.VMEM((rows, lanes), jnp.float32),
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


# ------------------------------------------------------------------------
# First-hit BACKWARD (round 5 — the remaining half of VERDICT r3 #4).
#
# The forward is out[r, z] = P * L with P = prod_k (1 - ps_k m_k) and
# L = ps_{S-1} * lastm, ps_k = act(logit_k), logit_k the bilinear sample.
# The XLA-fallback backward (vjp through the scanned XLA forward) measured
# 730 ms/call at the production shape — ~27x the fused forward. These two
# kernels replace it:
#
# * ``ray_prob_dlogit`` (K1): occ table resident like the forward; per
#   ray tile a FORWARD sweep stores ps_k and the prefix products, then a
#   BACKWARD sweep carries the suffix product and emits
#     dlogit_k = g * ps'_k * (-m_k * pref_k * suf_k * L
#                            + [k==S-1] * P * lastm)
#   — no division by (1 - ps m), so saturated transmittances are exact.
# * ``ray_prob_scatter`` (K2): accumulates the bilinear-weighted dlogit
#   rows into an f32 packed-corner table gradient in a VMEM scratch,
#   column-chunked like the f32 forward (the 20.7 MB f32 grad table does
#   not fit VMEM next to anything else).
#
# The [B, N, S*Z] dlogit intermediate (f32) is the price of keeping both
# kernels under the VMEM budget; at the production shape it is ~675 MB of
# transient HBM, written and read once (~2 ms of traffic).
# ------------------------------------------------------------------------


def _ray_prob_dlogit_kernel(act, packed16, zdim, idx_ref, cw_ref, mask_ref,
                            lastm_ref, g_ref, atlas_ref, dl_ref, table,
                            psbuf, prefbuf, sem):
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = mask_ref.shape[2]
    z = 32                     # table z lanes (zdim real, padded to 32)

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc, z) for _, sc in _chunks(s)}
    gather = _gather_chunk16 if packed16 else _gather_chunk
    q_blk = g_ref.shape[1]
    chunks = _chunks(s)

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        # ---- pass A: forward sweep; ps and prefix stored PER CHUNK
        # (one [QT, sc*z] store each — per-waypoint 32-lane stores at
        # unaligned offsets measured ~5x the whole forward kernel) ----
        pref = jnp.ones((QT, z), jnp.float32)
        for (s0, sc) in chunks:
            g = gather(table, idx_ref, q0, s0, sc)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            p = g * w_rep
            msk = mask_ref[0, pl.ds(q0, QT), s0:s0 + sc]
            ps_list, pref_list = [], []
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
                ps_list.append(ps)
                pref_list.append(pref)
                m = jnp.broadcast_to(msk[:, k:k + 1], (QT, z))
                pref = pref * (1.0 - ps * m)
            psbuf[:, s0 * z:(s0 + sc) * z] = jnp.concatenate(ps_list, 1)
            prefbuf[:, s0 * z:(s0 + sc) * z] = jnp.concatenate(pref_list, 1)
        # ---- pass B: backward sweep with the suffix product; dlogit
        # emitted per chunk as one [QT, sc*zdim] store ----
        big_p = pref
        lastm = jnp.broadcast_to(lastm_ref[0, pl.ds(q0, QT), 0:1], (QT, z))
        ps_last = psbuf[:, (s - 1) * z:s * z]
        big_l = ps_last * lastm
        gout = g_ref[0, pl.ds(q0, QT), :]         # [QT, z] f32
        gl = gout * big_l
        suf = jnp.ones((QT, z), jnp.float32)
        for (s0, sc) in reversed(chunks):
            psch = psbuf[:, s0 * z:(s0 + sc) * z]
            prefch = prefbuf[:, s0 * z:(s0 + sc) * z]
            mch = mask_ref[0, pl.ds(q0, QT), s0:s0 + sc]
            dl_list = [None] * sc
            for k in range(sc - 1, -1, -1):
                ps = psch[:, k * z:(k + 1) * z]
                pref_k = prefch[:, k * z:(k + 1) * z]
                m = jnp.broadcast_to(mch[:, k:k + 1], (QT, z))
                dps = -(m * pref_k * suf) * gl
                if s0 + k == s - 1:
                    dps = dps + gout * (big_p * lastm)
                if act == 'exp':
                    dact = (1.0 - ps) * (ps > 0.0).astype(jnp.float32)
                else:
                    dact = ps * (1.0 - ps)
                dl_list[k] = (dps * dact)[:, :zdim]
                suf = suf * (1.0 - ps * m)
            dl_ref[0, pl.ds(q0, QT), s0 * zdim:(s0 + sc) * zdim] = \
                jnp.concatenate(dl_list, 1)
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


@functools.partial(jax.jit,
                   static_argnames=('act', 'zdim', 'q_block', 'interpret'))
def ray_prob_dlogit(atlas, row_idx, cw4, mask, last_in, g, act: str,
                    zdim: int, q_block: int = 64,
                    interpret: bool = False):
    """K1 of the first-hit backward: [B, N, S*zdim] f32 dlogit.

    ``q_block`` stays small: the [q_block, S*zdim] OUTPUT block is the
    VMEM hog here (double-buffered next to the 10.3 MB table; 256 rays
    x 257 x 16 f32 = 4.2 MB x2 OOM'd the scoped vmem)."""
    bsz, r, lanes = atlas.shape
    _, n, s = row_idx.shape
    packed16 = atlas.dtype == jnp.uint32
    assert lanes == 128 and n % q_block == 0
    assert g.shape == (bsz, n, 32)

    return pl.pallas_call(
        functools.partial(_ray_prob_dlogit_kernel, act, packed16, zdim),
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
            pl.BlockSpec((1, q_block, 32), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, s * zdim),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, s * zdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, lanes), atlas.dtype),
                        pltpu.VMEM((QT, s * 32), jnp.float32),
                        pltpu.VMEM((QT, s * 32), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, cw4, mask, last_in, g, atlas)


def _zrep_mat(zdim):
    """[zdim, 128] 0/1: z channel zi replicated to lane c*32+zi, c<4."""
    src = jax.lax.broadcasted_iota(jnp.int32, (zdim, 128), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (zdim, 128), 1)
    return ((dst % 32 == src) & (dst % 32 < zdim)).astype(jnp.float32)


def _crep_mat():
    """[4, 128] 0/1: corner c replicated across its 32 z lanes."""
    src = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    return (dst // 32 == src).astype(jnp.float32)


def _zrep_chunk_mat(zdim, sc):
    """[sc*zdim, sc*128] 0/1: chunk-batched z replication — input lane
    k*zdim+zi maps to output lanes k*128 + c*32 + zi for all 4 corners."""
    src = jax.lax.broadcasted_iota(jnp.int32, (sc * zdim, sc * 128), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (sc * zdim, sc * 128), 1)
    k_src, z_src = src // zdim, src % zdim
    k_dst, l_dst = dst // 128, dst % 128
    return ((k_src == k_dst) & (l_dst % 32 == z_src) &
            (l_dst % 32 < zdim)).astype(jnp.float32)


def _crep_chunk_mat(sc):
    """[4*sc, sc*128] 0/1: corner weight (k, c) -> lanes k*128+c*32+d."""
    src = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 128), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 128), 1)
    return ((dst // 128 == src // 4) &
            ((dst % 128) // 32 == src % 4)).astype(jnp.float32)


def _ray_prob_scatter_kernel(zdim, idx_ref, cw_ref, dl_ref,
                             dtab_ref, acc, sem):
    bi = pl.program_id(0)
    qb = pl.program_id(1)
    n_qb = pl.num_programs(1)
    s = idx_ref.shape[2]
    q_blk = idx_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    chunks = _chunks(s)
    zmats = {sc: _zrep_chunk_mat(zdim, sc) for _, sc in chunks}
    cmats = {sc: _crep_chunk_mat(sc) for _, sc in chunks}
    dn = (((1,), (0,)), ((), ()))
    hi = jax.lax.Precision.HIGHEST

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        for (s0, sc) in chunks:
            # chunk-batched expansion: ONE matmul for all sc waypoints
            # (per-waypoint [QT,16]x[16,128] matmuls paid the MXU fill
            # latency 2.6M times per call)
            dlch = dl_ref[0, pl.ds(q0, QT), s0 * zdim:(s0 + sc) * zdim]
            cwch = cw_ref[0, pl.ds(q0, QT), 4 * s0:4 * (s0 + sc)]
            drep = jax.lax.dot_general(dlch, zmats[sc],
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.float32,
                                       precision=hi)
            cwrep = jax.lax.dot_general(cwch, cmats[sc],
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32,
                                        precision=hi)
            rg = drep * cwrep                   # [QT, sc*128]
            # out-of-chunk samples RMW a zero contribution: a per-row
            # @pl.when skip measured SLOWER (scalar branch ~ the RMW)
            for k in range(sc):
                for j in range(QT):
                    r = idx_ref[0, q0 + j, s0 + k]
                    acc[pl.ds(r, 1), :] = (acc[pl.ds(r, 1), :] +
                                           rg[j:j + 1,
                                              k * 128:(k + 1) * 128])
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)

    @pl.when(qb == n_qb - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dtab_ref.at[bi], sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=('rows', 'zdim', 'q_block',
                                             'interpret'))
def ray_prob_scatter(row_idx, cw4, dlogit, rows: int, zdim: int,
                     q_block: int = 64, interpret: bool = False):
    """K2: [B, rows(+pad8), 128] f32 packed-corner table gradient for one
    column chunk (``cw4`` must carry the in-chunk mask; ``row_idx`` is
    chunk-local)."""
    bsz, n, s = row_idx.shape
    assert cw4.shape == (bsz, n, 4 * s)
    assert dlogit.shape == (bsz, n, s * zdim)
    r8 = rows + (-rows) % 8

    return pl.pallas_call(
        functools.partial(_ray_prob_scatter_kernel, zdim),
        grid=(bsz, n // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, s * zdim),
                         lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, r8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, cw4, dlogit)
