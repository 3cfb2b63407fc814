"""Fused Pallas TPU kernel for multi-scale deformable attention sampling.

The XLA formulations in ``ops.msda`` bottom out in ``jnp.take`` from a packed
corner atlas in HBM; measured on v5e the take row-rate degrades ~4x once the
atlas exceeds VMEM (the SCA atlas is ~380 MB across all (cam, head) tables)
and the gathered corners round-trip through HBM before the weighted reduce.

This kernel instead grids over the per-(batch·head) tables, DMAs each packed
f32 table into a VMEM scratch once, and performs the row gathers as dynamic
VMEM loads fused with the bilinear/attention-weighted reduction — no gathered
intermediate ever touches HBM. ``ops.msda`` splits the feature-pyramid levels
into groups whose packed tables fit the VMEM budget and sums the per-group
partial outputs (Mosaic constraints force f32 tables: dynamic row slices of
bf16 (16,128)-tiled buffers and 64-lane DMAs both fail to lower).

Layout contract (prepared by ``ops.msda`` when ``impl='fused'``):

- ``atlas``: ``[C, R, 128]`` f32 packed corner tables (zero ring, the
  group's level tables concatenated along rows), one per (batch, head)
  pair; rows are ``4*dim`` = 128 lanes (dim 32).
- ``row_idx``: ``[C, Q, S]`` int32 row into the per-C table (group-local
  level base offsets folded in, clipped in-range), ``S`` = samples in the
  group (its levels × points).
- ``wx1/wy1``: ``[C, Q, S]`` f32 bilinear fractions (query-major; the
  kernel transposes 8-query tiles in-register to put samples in sublanes —
  dynamic LANE slices must be 128-aligned on TPU, sublane slices only
  8-aligned).
- ``aw``: ``[C, Q, S]`` f32 attention weight with the out-of-map validity
  mask already folded (zero kills the sample).

Reference semantics: mmcv ``ms_deform_attn_forward`` (see ops/msda.py
docstring; reference projects/mmdet3d_plugin/bevformer/modules/
multi_scale_deformable_attn_function.py:15-163).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIM = 32          # per-head channel dim; rows are 4*DIM = 128 lanes
QT = 8            # queries per inner tile

# packed f32 table budget per kernel invocation (VMEM is ~16 MB/core; leave
# room for the weight/output blocks and double buffering)
TABLE_BUDGET_BYTES = 12_600_000


def _fused_kernel(idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref, out_ref,
                  table, sem):
    """One (c, q-block) grid step; see module docstring for layouts."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[2]
    q_blk = out_ref.shape[1]

    # Stage this C's packed table into VMEM once; it stays resident for all
    # of its query blocks (the grid iterates q fastest, sequentially).
    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        # Gather all QT*S rows with dynamic VMEM loads (~1 row/cycle when
        # unrolled; this is the kernel's rate limiter by design).
        rows = []
        for j in range(QT):
            for k in range(s):
                r = idx_ref[0, q0 + j, k]
                rows.append(table[pl.ds(r, 1), :])
        g = jnp.concatenate(rows, axis=0)             # [QT*S, 128]

        # weights: sublane slice (8-aligned ok), transpose sample-major
        wx_t = wx_ref[0, pl.ds(q0, QT), :].T          # [S, QT]
        wy_t = wy_ref[0, pl.ds(q0, QT), :].T
        aw_t = aw_ref[0, pl.ds(q0, QT), :].T

        outs = []
        for j in range(QT):
            wx1 = wx_t[:, j:j + 1]                    # [S, 1] static slice
            wy1 = wy_t[:, j:j + 1]
            aw = aw_t[:, j:j + 1]
            wx0 = 1.0 - wx1
            wy0 = 1.0 - wy1
            # packed-row corner order [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)]
            w4 = (wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1)
            w_tile = jnp.concatenate(
                [jnp.broadcast_to(w * aw, (s, DIM)) for w in w4], axis=1)
            pj = g[j * s:(j + 1) * s] * w_tile
            outs.append(jnp.sum(pj, axis=0, keepdims=True))  # [1, 128]
        r8 = jnp.concatenate(outs, axis=0)            # [QT, 128]
        # corner fold: exact VPU adds of the 4 lane segments (an MXU
        # matmul here silently truncates to bf16 — measured ~1e-3 error)
        out_ref[0, pl.ds(q0, QT), :] = (
            r8[:, 0:DIM] + r8[:, DIM:2 * DIM] +
            r8[:, 2 * DIM:3 * DIM] + r8[:, 3 * DIM:4 * DIM])
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def msda_gather_fused(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                      wx1: jnp.ndarray, wy1: jnp.ndarray, aw: jnp.ndarray,
                      q_block: int = 256, interpret: bool = False
                      ) -> jnp.ndarray:
    """Fused packed-corner gather + bilinear/attention reduce -> [C, Q, DIM].

    See the module docstring for the layout contract.
    """
    c, r, lanes = atlas.shape
    assert atlas.dtype == jnp.float32 and lanes == 4 * DIM
    _, q, s = row_idx.shape
    assert q % q_block == 0 and q_block % QT == 0

    return pl.pallas_call(
        _fused_kernel,
        grid=(c, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, DIM), lambda ci, qi: (ci, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, q, DIM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, atlas)


def _bwd_weights_kernel(idx_ref, wx_ref, wy_ref, aw_ref, dout_ref, atlas_ref,
                        dwx_ref, dwy_ref, daw_ref, table, sem):
    """Backward pass 1: fraction/attention-weight grads (value table resident).

    For sample s of query q with corner values g_c = table[row_s, c*DIM:...]
    and t_c = <dout_q, g_c>:
      daw = sum_c w4_c * t_c
      dwx1 = aw * (-wy0*t0 + wy0*t1 - wy1*t2 + wy1*t3)
      dwy1 = aw * (-wx0*t0 - wx1*t1 + wx0*t2 + wx1*t3)
    """
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[2]
    q_blk = dout_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        rows = []
        for j in range(QT):
            for k in range(s):
                r = idx_ref[0, q0 + j, k]
                rows.append(table[pl.ds(r, 1), :])
        g = jnp.concatenate(rows, axis=0)             # [QT*S, 128]

        wx_t = wx_ref[0, pl.ds(q0, QT), :].T          # [S, QT]
        wy_t = wy_ref[0, pl.ds(q0, QT), :].T
        aw_t = aw_ref[0, pl.ds(q0, QT), :].T
        dout_t = dout_ref[0, pl.ds(q0, QT), :]        # [QT, DIM]

        dwx_cols, dwy_cols, daw_cols = [], [], []
        for j in range(QT):
            dj = dout_t[j:j + 1, :]                   # [1, DIM]
            dj4 = jnp.concatenate([dj] * 4, axis=1)   # [1, 4*DIM]
            m = g[j * s:(j + 1) * s] * jnp.broadcast_to(dj4, (s, 4 * DIM))
            t0 = jnp.sum(m[:, 0:DIM], axis=1, keepdims=True)       # [S, 1]
            t1 = jnp.sum(m[:, DIM:2 * DIM], axis=1, keepdims=True)
            t2 = jnp.sum(m[:, 2 * DIM:3 * DIM], axis=1, keepdims=True)
            t3 = jnp.sum(m[:, 3 * DIM:], axis=1, keepdims=True)
            wx1 = wx_t[:, j:j + 1]
            wy1 = wy_t[:, j:j + 1]
            aw = aw_t[:, j:j + 1]
            wx0 = 1.0 - wx1
            wy0 = 1.0 - wy1
            daw_cols.append(wy0 * wx0 * t0 + wy0 * wx1 * t1 +
                            wy1 * wx0 * t2 + wy1 * wx1 * t3)
            dwx_cols.append(aw * (wy0 * (t1 - t0) + wy1 * (t3 - t2)))
            dwy_cols.append(aw * (wx0 * (t2 - t0) + wx1 * (t3 - t1)))
        dwx_ref[0, pl.ds(q0, QT), :] = jnp.concatenate(dwx_cols, axis=1).T
        dwy_ref[0, pl.ds(q0, QT), :] = jnp.concatenate(dwy_cols, axis=1).T
        daw_ref[0, pl.ds(q0, QT), :] = jnp.concatenate(daw_cols, axis=1).T
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


def _bwd_table_kernel(idx_ref, wx_ref, wy_ref, aw_ref, dout_ref, dtab_ref,
                      acc, sem):
    """Backward pass 2: table-gradient scatter.

    Row gradient of sample s is the fwd weight tile row times the query's
    dout: dtable[row_s] += w_tile[s] * tile4(dout_q). Accumulated in a VMEM
    scratch (sequential, race-free) and DMA'd to HBM after this table's last
    query block.
    """
    qb = pl.program_id(1)
    n_qb = pl.num_programs(1)
    c = pl.program_id(0)
    s = wx_ref.shape[2]
    q_blk = dout_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        wx_t = wx_ref[0, pl.ds(q0, QT), :].T          # [S, QT]
        wy_t = wy_ref[0, pl.ds(q0, QT), :].T
        aw_t = aw_ref[0, pl.ds(q0, QT), :].T
        dout_t = dout_ref[0, pl.ds(q0, QT), :]        # [QT, DIM]
        for j in range(QT):
            wx1 = wx_t[:, j:j + 1]
            wy1 = wy_t[:, j:j + 1]
            aw = aw_t[:, j:j + 1]
            wx0 = 1.0 - wx1
            wy0 = 1.0 - wy1
            w4 = (wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1)
            w_tile = jnp.concatenate(
                [jnp.broadcast_to(w * aw, (s, DIM)) for w in w4], axis=1)
            dj = dout_t[j:j + 1, :]
            rg = w_tile * jnp.broadcast_to(
                jnp.concatenate([dj] * 4, axis=1), (s, 4 * DIM))
            for k in range(s):
                r = idx_ref[0, q0 + j, k]
                acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + rg[k:k + 1]
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)

    @pl.when(qb == n_qb - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dtab_ref.at[c], sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def msda_gather_fused_bwd(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                          wx1: jnp.ndarray, wy1: jnp.ndarray,
                          aw: jnp.ndarray, dout: jnp.ndarray,
                          q_block: int = 256, interpret: bool = False):
    """Backward of ``msda_gather_fused``.

    dout: [C, Q, DIM] f32. Returns (datlas [C, R, 128], dwx1, dwy1, daw
    each [C, Q, S] f32).
    """
    c, r, lanes = atlas.shape
    assert atlas.dtype == jnp.float32 and lanes == 4 * DIM
    _, q, s = row_idx.shape
    assert q % q_block == 0 and q_block % QT == 0

    qspec = pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.SMEM)
    dspec = pl.BlockSpec((1, q_block, DIM), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM)

    dwx, dwy, daw = pl.pallas_call(
        _bwd_weights_kernel,
        grid=(c, q // q_block),
        in_specs=[ispec, qspec, qspec, qspec, dspec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(qspec, qspec, qspec),
        out_shape=(jax.ShapeDtypeStruct((c, q, s), jnp.float32),) * 3,
        scratch_shapes=[pltpu.VMEM((r, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, dout, atlas)

    datlas = pl.pallas_call(
        _bwd_table_kernel,
        grid=(c, q // q_block),
        in_specs=[ispec, qspec, qspec, qspec, dspec],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((c, r, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, dout)

    return datlas, dwx, dwy, daw


