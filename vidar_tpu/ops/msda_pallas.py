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
partial outputs.

Everything is laid out LANE-MAJOR to sidestep Mosaic relayout limits: a
query's gathered samples are concatenated along lanes ([QT, SC*128] tiles),
per-(sample, corner) weights are expanded across channel lanes with a
constant 0/1 MXU matmul, and sample/corner reductions are static lane-segment
adds. Mosaic constraints that shaped this design (each cost a worker crash
or a failed compile to learn):

* dynamic row slices of bf16 (16,128)-tiled buffers don't lower — tables are
  f32 (grouped under a ~12.6 MB VMEM budget, oversized levels column-split);
* dynamic LANE slices must be 128-aligned; sublane slices 8-aligned;
* sublane<->lane reshapes ((QT,S)->(QT*S,1) etc.) are "unsupported shape
  cast" — hence the lane-major formulation;
* HBM->VMEM DMA of a table whose row count is not a sublane multiple faults
  the TPU worker — atlas rows are padded to 8;
* MXU matmuls at DEFAULT precision truncate to bf16 (~1e-3 error) — every
  in-kernel matmul runs at HIGHEST (bf16x3, ~f32-exact).

Layout contract (prepared by ``ops.msda`` when ``impl='fused'``):

- ``atlas``: ``[C, R, 128]`` f32 packed corner tables (zero ring, the
  group's level tables concatenated along rows; rows padded to 8), one per
  (batch, head) pair; rows are ``4*dim`` = 128 lanes (dim 32).
- ``row_idx``: ``[C, S, Q]`` int32 row into the per-C table (group-local
  level bases folded in, clipped in-range), ``S`` = the group's samples
  per query (its levels × points).
- ``wx1/wy1/aw``: ``[C, S, Q]`` f32 bilinear fractions and attention weight
  with out-of-map validity folded in. Corner weights (``[.., S*4]``
  sample-major corner-minor lanes ``[s0c0, s0c1, ..]``) are expanded
  IN-KERNEL once per q-block (``_cw4_block_t``) — materializing them
  host-side was the largest prep term (~10 ms + ~800 MB HBM per SCA call).
- output / ``dout``: ``[C, DIM, Q]``.

Every per-query array is SAMPLE-MAJOR (queries on lanes): Q is a q_block
multiple (so lanes are 128-clean) while S is 4..32 — the query-major
``[C, Q, S]`` layout of rounds 1-3 tile-padded S to 128 lanes, costing
5-16x the useful HBM footprint/traffic per buffer (348 MB per SCA buffer;
the #1 contributor to the flagship train-step OOM). The kernel working
tiles stay query-major: blocks are transposed in-VMEM with exact 0/1
identity matmuls on the MXU (single-product rows at HIGHEST precision —
bit-exact, ~4 MFLOP per 256-query block, noise next to the gather).

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
SC = 8            # samples per lane-chunk ([QT, SC*128] working tiles)

# packed f32 table budget per kernel invocation (VMEM is ~16 MB/core; leave
# room for the weight/output blocks and double buffering)
TABLE_BUDGET_BYTES = 12_600_000

_HI = jax.lax.Precision.HIGHEST


def _chunks(s):
    return [(s0, min(SC, s - s0)) for s0 in range(0, s, SC)]


def _expand_mat(sc):
    """[4*sc, sc*128] 0/1: lane l of the output belongs to input lane
    l // DIM — expands per-(sample, corner) weights across channel lanes."""
    src = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * DIM), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * DIM), 1)
    return (dst // DIM == src).astype(jnp.float32)


def _cw4_mats_kernel(s):
    """Signed 0/1 expansion mats (+biases) building [.., 4*s] corner weights
    from per-sample fractions — same construction/lane order (s*4+corner) as
    ``ops.msda._cw4_mats``, duplicated so this module stays import-light.
    Single-nonzero columns at HIGHEST precision: exact."""
    l = jax.lax.broadcasted_iota(jnp.int32, (s, 4 * s), 1)
    src = jax.lax.broadcasted_iota(jnp.int32, (s, 4 * s), 0)
    corner = l % 4
    hit = (l // 4 == src).astype(jnp.float32)
    ex = hit * jnp.where(corner % 2 == 1, 1.0, -1.0)
    ey = hit * jnp.where(corner >= 2, 1.0, -1.0)
    ea = hit
    lb = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * s), 1)
    bx = (lb % 4 % 2 == 0).astype(jnp.float32)
    by = (lb % 4 < 2).astype(jnp.float32)
    return ex, bx, ey, by, ea


def _ident(n):
    """[n, n] f32 identity (0/1 iota compare — TPU needs 2D iota)."""
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (a == b).astype(jnp.float32)


_DN0 = (((0,), (0,)), ((), ()))   # contract dim 0 of both operands
_DN1 = (((1,), (0,)), ((), ()))   # standard matmul contraction


def _t(x):
    """Exact MXU transpose: [a, b] -> [b, a] via a 0/1 identity contraction
    (single-product outputs at HIGHEST — bit-exact for f32; Mosaic has no
    sublane<->lane relayout, and this costs ~a*a*b MACs, noise next to the
    gather loop)."""
    return jax.lax.dot_general(x, _ident(x.shape[0]), dimension_numbers=_DN0,
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _cw4_block_t(wx_t, wy_t, aw_t, mats):
    """[s, q_blk] fractions -> [q_blk, 4*s] corner weights, value-matching
    the host-side ``ops.msda._cw4_from_fractions`` (same multiply order;
    every matmul output element is a single product at HIGHEST — exact).

    Computed ONCE per (c, q-block) grid step and staged through a VMEM
    scratch (Mosaic cannot dynamic-slice registers): in-kernel expansion
    measured kernel-time-neutral at every production shape while deleting
    the [C, Q, 4S] host-side cw4 stage — the largest prep term (~10 ms and
    ~800 MB of HBM round-trip per SCA call; benchmarks/cw_variants_bench.py).
    Inputs arrive sample-major ([s, q]); contracting the s dim of BOTH
    operands ([s,q] x [s,4s] -> [q,4s]) lands directly in the query-major
    orientation the gather tiles consume — same matmul cost as the old
    query-major expansion, no extra transpose."""
    ex, bx, ey, by, ea = mats
    wyp = jax.lax.dot_general(wy_t, ey, dimension_numbers=_DN0,
                              preferred_element_type=jnp.float32,
                              precision=_HI) + by
    wxp = jax.lax.dot_general(wx_t, ex, dimension_numbers=_DN0,
                              preferred_element_type=jnp.float32,
                              precision=_HI) + bx
    awp = jax.lax.dot_general(aw_t, ea, dimension_numbers=_DN0,
                              preferred_element_type=jnp.float32,
                              precision=_HI)
    return (wyp * wxp) * awp


def _gather_chunk(table, idx_ref, q0, s0, sc, qt=QT):
    """[qt, sc*128] gathered rows, query-major, samples along lanes.
    ``idx_ref`` is sample-major ([1, S, Q] block)."""
    qrows = []
    for j in range(qt):
        samples = [table[pl.ds(idx_ref[0, s0 + k, q0 + j], 1), :]
                   for k in range(sc)]
        qrows.append(samples[0] if sc == 1
                     else jnp.concatenate(samples, axis=1))
    return jnp.concatenate(qrows, axis=0)


def _fused_kernel(qt, heads, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
                  out_ref, table, cwbuf, accbuf, sem):
    """One (c, q-block) grid step; see module docstring for layouts.
    ``qt`` queries per inner tile — raised above QT for small S so the
    fixed per-tile cost (MXU weight expansion, loop overhead) amortizes
    over more gather rows. ``heads``: 0 for a flat [C, R, 128] atlas;
    otherwise the atlas is [B, R, heads, 128] (the natural layout of the
    hoisted-tables fold matmul) and table c is the strided slice
    ``atlas[c // heads, :, c % heads]`` — the DMA engine eats the stride,
    saving the fold a head-major transpose of the 4x-expanded rows."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = out_ref.shape[2]

    # Stage this C's packed table into VMEM once; it stays resident for all
    # of its query blocks (the grid iterates q fastest, sequentially).
    @pl.when(qb == 0)
    def _():
        src = (atlas_ref.at[c] if heads == 0
               else atlas_ref.at[c // heads, :,
                                 pl.ds((c % heads) * 4 * DIM, 4 * DIM)])
        cp = pltpu.make_async_copy(src, table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc) for _, sc in _chunks(s)}
    cwbuf[:] = _cw4_block_t(wx_ref[0, :, :], wy_ref[0, :, :],
                            aw_ref[0, :, :], _cw4_mats_kernel(s))

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc = jnp.zeros((qt, DIM), jnp.float32)
        for (s0, sc) in _chunks(s):
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            p = g * w_rep
            # sum the 4*sc 32-lane segments (samples AND corners)
            for b in range(4 * sc):
                acc = acc + p[:, b * DIM:(b + 1) * DIM]
        accbuf[pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    for m in range(0, q_blk, 256):
        out_ref[0, :, m:m + 256] = _t(accbuf[m:m + 256, :])      # [q_blk, DIM] -> [DIM, q_blk]


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret', 'qt'))
def msda_gather_fused(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                      wx1: jnp.ndarray, wy1: jnp.ndarray, aw: jnp.ndarray,
                      q_block: int = 256,
                      interpret: bool = False,
                      qt: int | None = None) -> jnp.ndarray:
    """Fused packed-corner gather + bilinear/attention reduce -> [C, DIM, Q].

    See the module docstring for the layout contract. ``wx1/wy1/aw``:
    [C, S, Q] f32 bilinear fractions + masked attention weight; corner
    weights are expanded IN-KERNEL once per q-block (``_cw4_block_t``).
    """
    cb, r, lanes = atlas.shape
    assert atlas.dtype == jnp.float32 and lanes % (4 * DIM) == 0
    heads = 0 if lanes == 4 * DIM else lanes // (4 * DIM)
    c = cb * max(heads, 1)
    _, s, q = row_idx.shape
    if qt is None:
        # round-4 chip sweep (benchmarks/kernel_sweep.py): S=24 @qt=32
        # 46.8 ms vs 51.2 @16; S=8 @qt=64 21.3 vs 22.6 @32; S=4 @qt=64
        # 16.0 vs 17.5 @32 — bigger tiles amortize the fixed per-tile
        # MXU weight expansion and loop overhead.
        qt = 64 if s <= 8 else 32
    assert q % q_block == 0 and q_block % qt == 0
    assert wx1.shape == wy1.shape == aw.shape == (c, s, q)

    qspec = pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_kernel, qt, heads),
        grid=(c, q // q_block),
        in_specs=[
            pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.SMEM),
            qspec, qspec, qspec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, DIM, q_block), lambda ci, qi: (ci, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, DIM, q), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r, 4 * DIM), jnp.float32),
            pltpu.VMEM((q_block, 4 * s), jnp.float32),
            pltpu.VMEM((q_block, DIM), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, atlas)


def _gather_chunk16(table, idx_ref, q0, s0, sc, qt=QT):
    """[qt, sc*128] rows gathered from a row-pair-packed uint32 table.

    Table row k packs value rows 2k (high 16 bits) and 2k+1 (low bits) as
    bf16 bit patterns; the f32 value is recovered by shifting the target
    half into the top 16 bits and zeroing the mantissa tail (bf16 -> f32
    widening is exact, so for bf16 model values this path is bit-exact
    with the f32 table kernel at HALF the VMEM/DMA footprint).
    """
    mask = jnp.uint32(0xffff0000)
    qrows = []
    for j in range(qt):
        samples = []
        for k in range(sc):
            r = idx_ref[0, s0 + k, q0 + j]
            word = table[pl.ds(jax.lax.shift_right_logical(r, 1), 1), :]
            shift = ((r & 1) * 16).astype(jnp.uint32)
            y = jax.lax.shift_left(word, jnp.broadcast_to(shift, word.shape))
            y = jax.lax.bitwise_and(y, jnp.broadcast_to(mask, word.shape))
            samples.append(jax.lax.bitcast_convert_type(y, jnp.float32))
        qrows.append(samples[0] if sc == 1
                     else jnp.concatenate(samples, axis=1))
    return jnp.concatenate(qrows, axis=0)


def _fused16_kernel(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref, out_ref,
                    table, cwbuf, accbuf, sem):
    """``_fused_kernel`` over a row-pair-packed uint32 table."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = out_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc) for _, sc in _chunks(s)}
    cwbuf[:] = _cw4_block_t(wx_ref[0, :, :], wy_ref[0, :, :],
                            aw_ref[0, :, :], _cw4_mats_kernel(s))

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc = jnp.zeros((qt, DIM), jnp.float32)
        for (s0, sc) in _chunks(s):
            g = _gather_chunk16(table, idx_ref, q0, s0, sc, qt)
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            p = g * w_rep
            for b in range(4 * sc):
                acc = acc + p[:, b * DIM:(b + 1) * DIM]
        accbuf[pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    for m in range(0, q_blk, 256):
        out_ref[0, :, m:m + 256] = _t(accbuf[m:m + 256, :])


def pack_atlas16(atlas: jnp.ndarray) -> jnp.ndarray:
    """[C, R, 128] f32/bf16 -> [C, ceil(R/2) padded to 8, 128] uint32 pairs.

    Row k of the output packs source rows 2k (high half) and 2k+1 (low):
    exact for bf16-representable values (the production value dtype).
    bf16 input skips the f32 round-trip (half the pack traffic).
    """
    c, r, lanes = atlas.shape
    if r % 2:
        atlas = jnp.pad(atlas, ((0, 0), (0, 1), (0, 0)))
        r += 1
    bf = atlas.astype(jnp.bfloat16)
    u16 = jax.lax.bitcast_convert_type(bf, jnp.uint16).astype(jnp.uint32)
    word = (u16[:, 0::2] << 16) | u16[:, 1::2]
    rpad = (-word.shape[1]) % 8
    if rpad:
        word = jnp.pad(word, ((0, 0), (0, rpad), (0, 0)))
    return word


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret', 'qt'))
def msda_gather_fused16(atlas16: jnp.ndarray, row_idx: jnp.ndarray,
                        wx1: jnp.ndarray, wy1: jnp.ndarray, aw: jnp.ndarray,
                        q_block: int = 256,
                        interpret: bool = False,
                        qt: int | None = None) -> jnp.ndarray:
    """Fused gather+reduce over a row-pair-packed uint32 table.

    Same contract as ``msda_gather_fused`` with ``atlas16 =
    pack_atlas16(atlas)``; row indices still address the UNPACKED rows.
    """
    c, rp, lanes = atlas16.shape
    assert atlas16.dtype == jnp.uint32 and lanes == 4 * DIM
    _, s, q = row_idx.shape
    if qt is None:
        qt = 64 if s <= 8 else 32   # see msda_gather_fused qt note
    assert q % q_block == 0 and q_block % qt == 0
    assert wx1.shape == wy1.shape == aw.shape == (c, s, q)

    qspec = pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused16_kernel, qt),
        grid=(c, q // q_block),
        in_specs=[
            pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.SMEM),
            qspec, qspec, qspec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, DIM, q_block), lambda ci, qi: (ci, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, DIM, q), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rp, lanes), jnp.uint32),
            pltpu.VMEM((q_block, 4 * s), jnp.float32),
            pltpu.VMEM((q_block, DIM), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, atlas16)


def _tsel_mat(sc, corner):
    """[sc*128, sc] 0/1 selecting corner ``corner``: T[l, s] = 1 iff
    l // 128 == s and (l % 128) // DIM == corner."""
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (sc * 4 * DIM, sc), 0)
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (sc * 4 * DIM, sc), 1)
    return ((l_ids // (4 * DIM) == s_ids) &
            ((l_ids % (4 * DIM)) // DIM == corner)).astype(jnp.float32)


def _dout_rep_mat(sc):
    """[DIM, sc*128] 0/1 replicating dout channels to every (sample,
    corner): D[d, l] = 1 iff l % DIM == d."""
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (DIM, sc * 4 * DIM), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (DIM, sc * 4 * DIM), 1)
    return (l_ids % DIM == d_ids).astype(jnp.float32)


def _bwd_weights_kernel(qt, heads, idx_ref, wx_ref, wy_ref, aw_ref,
                        dout_ref, atlas_ref, dwx_ref, dwy_ref, daw_ref,
                        table, fbuf, obuf, sem):
    """Backward pass 1: fraction/attention-weight grads (table resident).

    For sample s of query q with corner values g_c and t_c = <dout_q, g_c>:
      daw  = sum_c w4_c * t_c
      dwx1 = aw * (wy0*(t1-t0) + wy1*(t3-t2))
      dwy1 = aw * (wx0*(t2-t0) + wx1*(t3-t1))

    Sample-major I/O ([C, S, Q] / [C, DIM, Q]); the block is transposed to
    query-major working buffers (``fbuf``: wx|wy|aw|dout stacked along
    lanes, ``obuf``: daw|dwx|dwy) with identity matmuls once per q-block.
    """
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = dout_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        src = (atlas_ref.at[c] if heads == 0
               else atlas_ref.at[c // heads, :,
                                 pl.ds((c % heads) * 4 * DIM, 4 * DIM)])
        cp = pltpu.make_async_copy(src, table, sem)
        cp.start()
        cp.wait()

    dmats = {sc: _dout_rep_mat(sc) for _, sc in _chunks(s)}

    # one fused transpose of the whole block: [3s+DIM, q] -> [q, 3s+DIM]
    fbuf[:] = _t(jnp.concatenate(
        [wx_ref[0, :, :], wy_ref[0, :, :], aw_ref[0, :, :],
         dout_ref[0, :, :]], axis=0))

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        dout_t = fbuf[pl.ds(q0, qt), 3 * s:]          # [qt, DIM]
        t4 = [[], [], [], []]
        for (s0, sc) in _chunks(s):
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            d_rep = jax.lax.dot_general(
                dout_t, dmats[sc],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            m = g * d_rep                             # [QT, sc*128]
            # per-(sample, corner) 32-lane reductions via an add tree +
            # cross-lane sum — the corner-select 0/1 MATMULS this
            # replaces ([QT, sc*128] x [sc*128, sc] at HIGHEST) were
            # K=1024 MXU-fill bound, ~2/3 of the whole backward pass
            for k in range(sc):
                for corner in range(4):
                    seg = m[:, (k * 4 + corner) * DIM:
                            (k * 4 + corner + 1) * DIM]
                    seg = seg[:, :16] + seg[:, 16:]
                    t4[corner].append(jnp.sum(seg, axis=1, keepdims=True))
        t0, t1, t2, t3 = [x[0] if len(x) == 1 else jnp.concatenate(x, axis=1)
                          for x in t4]                # [QT, S]

        wx1 = fbuf[pl.ds(q0, qt), 0:s]                # [qt, S]
        wy1 = fbuf[pl.ds(q0, qt), s:2 * s]
        aw = fbuf[pl.ds(q0, qt), 2 * s:3 * s]
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        daw = (wy0 * wx0 * t0 + wy0 * wx1 * t1 +
               wy1 * wx0 * t2 + wy1 * wx1 * t3)
        dwx = aw * (wy0 * (t1 - t0) + wy1 * (t3 - t2))
        dwy = aw * (wx0 * (t2 - t0) + wx1 * (t3 - t1))
        obuf[pl.ds(q0, qt), :] = jnp.concatenate([daw, dwx, dwy], axis=1)
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    # static LANE slices of the query-major buffer, one exact transpose each
    daw_ref[0, :, :] = _t(obuf[:, 0:s])
    dwx_ref[0, :, :] = _t(obuf[:, s:2 * s])
    dwy_ref[0, :, :] = _t(obuf[:, 2 * s:3 * s])


def _bwd_table_kernel(qt, idx_ref, wx_ref, wy_ref, aw_ref, dout_ref,
                      dtab_ref, acc, cwbuf, dbuf, sem):
    """Backward pass 2: table-gradient scatter.

    Row gradient of sample s is its corner-weight lanes times the query's
    dout: dtable[row_s] += cw4-expanded * dout-replicated (corner weights
    built in-kernel per q-block from the fractions, like the forward).
    Accumulated in a VMEM scratch (sequential, race-free) and DMA'd to HBM
    after this table's last query block. Sample-major I/O like pass 1.
    """
    qb = pl.program_id(1)
    n_qb = pl.num_programs(1)
    c = pl.program_id(0)
    s = wx_ref.shape[1]
    q_blk = dout_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    emats = {sc: _expand_mat(sc) for _, sc in _chunks(s)}
    dmats = {sc: _dout_rep_mat(sc) for _, sc in _chunks(s)}
    cwbuf[:] = _cw4_block_t(wx_ref[0, :, :], wy_ref[0, :, :],
                            aw_ref[0, :, :], _cw4_mats_kernel(s))
    dbuf[:] = _t(dout_ref[0, :, :])                   # [q_blk, DIM]

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        dout_t = dbuf[pl.ds(q0, qt), :]
        for (s0, sc) in _chunks(s):
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            d_rep = jax.lax.dot_general(
                dout_t, dmats[sc],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            rg = w_rep * d_rep                        # [qt, sc*128]
            for j in range(qt):
                for k in range(sc):
                    r = idx_ref[0, s0 + k, q0 + j]
                    seg = rg[j:j + 1, k * 4 * DIM:(k + 1) * 4 * DIM]
                    acc[pl.ds(r, 1), :] = acc[pl.ds(r, 1), :] + seg
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)

    @pl.when(qb == n_qb - 1)
    def _():
        cp = pltpu.make_async_copy(acc, dtab_ref.at[c], sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=('q_block', 'interpret'))
def msda_gather_fused_bwd(atlas: jnp.ndarray, row_idx: jnp.ndarray,
                          wx1: jnp.ndarray,
                          wy1: jnp.ndarray, aw: jnp.ndarray,
                          dout: jnp.ndarray, q_block: int = 256,
                          interpret: bool = False):
    """Backward of ``msda_gather_fused``.

    dout: [C, DIM, Q] f32. Returns (datlas [C, R, 128] — always flat, even
    for a head-folded [B, R, heads*128] atlas — plus dwx1, dwy1, daw each
    [C, S, Q] f32).
    """
    cb, r, lanes = atlas.shape
    assert atlas.dtype == jnp.float32 and lanes % (4 * DIM) == 0
    heads = 0 if lanes == 4 * DIM else lanes // (4 * DIM)
    c = cb * max(heads, 1)
    _, s, q = row_idx.shape
    qt = 64 if s <= 8 else 32   # same chip-swept tiling as the forward
    assert q % q_block == 0 and q_block % qt == 0

    ispec = pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.SMEM)
    qspec = pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, DIM, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)

    dwx, dwy, daw = pl.pallas_call(
        functools.partial(_bwd_weights_kernel, qt, heads),
        grid=(c, q // q_block),
        in_specs=[ispec, qspec, qspec, qspec, dspec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(qspec, qspec, qspec),
        out_shape=(jax.ShapeDtypeStruct((c, s, q), jnp.float32),) * 3,
        scratch_shapes=[pltpu.VMEM((r, 4 * DIM), jnp.float32),
                        pltpu.VMEM((q_block, 3 * s + DIM), jnp.float32),
                        pltpu.VMEM((q_block, 3 * s), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, dout, atlas)

    datlas = pl.pallas_call(
        functools.partial(_bwd_table_kernel, qt),
        grid=(c, q // q_block),
        in_specs=[ispec, qspec, qspec, qspec, dspec],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((c, r, 4 * DIM), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 4 * DIM), jnp.float32),
                        pltpu.VMEM((q_block, 4 * s), jnp.float32),
                        pltpu.VMEM((q_block, DIM), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(row_idx, wx1, wy1, aw, dout)

    return datlas, dwx, dwy, daw
