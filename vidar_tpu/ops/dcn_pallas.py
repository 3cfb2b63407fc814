"""Fused Pallas TPU kernel for modulated deformable-conv (DCNv2) sampling.

DCN needs per-tap sampled values (each 3x3 tap multiplies its own slice of
the conv kernel), so unlike ``msda_pallas`` there is no sample reduction:
the kernel gathers each tap's packed-corner row from a VMEM-resident table,
folds the 4 bilinear corners with the modulation mask, and writes the
per-tap channel rows out.

The intended win over the XLA ``take`` formulation is the load shape: a
packed sample (4 corners x c_in channels) is laid out as ``TR =
4*c_in/128`` consecutive 128-lane rows, so one dynamic slice at a provably
8-aligned offset fetches the whole sample as full (8, 128) tiles.

Measured v5e at RN101 stage-3 shapes (6x58x100x256): 18.6 ms vs 27.0 ms
for the f32 take path — but the production model runs bf16, where the take
path's 2 KB rows measure 11.4 ms, and Mosaic's bf16 dynamic-slice limits
force this kernel's tables to f32. NOT enabled by default (see
models/resnet.py); kept for f32 models and as the base for a u32-packed
bf16 variant (paired-pixel row groups would restore alignment).

Layout contract (prepared by ``models.resnet.DeformConv2d``):

- ``table``: ``[B, Rchunk * TR, 128]`` f32 packed corner rows for one
  packed-column chunk ((h+1) x chunk-width grid, zero ring; row r of the
  chunk occupies rows ``[r*TR, (r+1)*TR)``; corner c occupies the RC =
  c_in/128 rows ``[c*RC, (c+1)*RC)`` of a sample).
- ``row_idx``: ``[B, Q, S]`` int32 chunk-local packed row per tap (S = 9),
  clipped in-range.
- ``cw4``: ``[B, Q, S*4]`` f32 corner weights (sample-major corner-minor)
  with modulation mask, map validity, and chunk membership folded in.

Output: ``[B, Q * S * RC, 128]`` f32 — reshape to [B, Q, S, c_in] is
contiguous. Chunk outputs are summed by the caller (each tap is live in
exactly one chunk).

Reference semantics: mmcv ModulatedDeformConv2d (DCNv2), used by the
RN101 backbone stages 3-4 (reference projects/configs/vidar_pretrain/
nusc_1_8_subset/vidar_1_8_nusc_3future.py:97-98).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QT = 8  # queries (output pixels) per inner tile


def _dcn_kernel(idx_ref, cw_ref, table_hbm, out_ref, table, sem):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    # rows per packed sample and per corner, from static shapes:
    # out rows per tile = QT * S * RC; sample load = [4*RC, 128]
    total_rows = out_ref.shape[1]
    rc = total_rows // (q_blk * s)

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        outs = []
        for j in range(QT):
            for k in range(s):
                r = idx_ref[0, q0 + j, k]
                g = table[pl.ds(pl.multiple_of(r * 4 * rc, 8), 4 * rc), :]
                w0 = cw_ref[0, q0 + j, 4 * k]
                w1 = cw_ref[0, q0 + j, 4 * k + 1]
                w2 = cw_ref[0, q0 + j, 4 * k + 2]
                w3 = cw_ref[0, q0 + j, 4 * k + 3]
                folded = (w0 * g[0:rc] + w1 * g[rc:2 * rc] +
                          w2 * g[2 * rc:3 * rc] + w3 * g[3 * rc:4 * rc])
                outs.append(folded)                    # [RC, 128]
        out_tile = jnp.concatenate(outs, axis=0)       # [QT*S*RC, 128]
        base = pl.multiple_of(i * QT * s * rc, 8)
        out_ref[0, pl.ds(base, QT * s * rc), :] = out_tile
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


TABLE_BUDGET_BYTES = 12_600_000


@functools.partial(jax.jit, static_argnames=('rc', 'q_block', 'interpret'))
def dcn_gather(table: jnp.ndarray, row_idx: jnp.ndarray, cw4: jnp.ndarray,
               rc: int, q_block: int = 128, interpret: bool = False
               ) -> jnp.ndarray:
    """Gather + corner-fold DCN taps. See the module docstring.

    table: [B, R*4*rc, 128] f32 (rows padded so R*4*rc % 8 == 0 holds by
    construction since 4*rc is a multiple of 4 and rc >= 2).
    Returns [B, Q * S * rc, 128] f32.
    """
    bsz, rrows, lanes = table.shape
    assert table.dtype == jnp.float32 and lanes == 128
    _, q, s = row_idx.shape
    assert q % q_block == 0 and q_block % QT == 0
    assert cw4.shape == (bsz, q, 4 * s)
    assert (4 * rc) % 8 == 0, 'sample rows must be a sublane multiple'

    return pl.pallas_call(
        _dcn_kernel,
        grid=(bsz, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block * s * rc, 128),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, q * s * rc, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rrows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, cw4, table)


def _pack_full(x):
    """[B, H, W, C] -> [B, H+1, W+1, 4C] packed corner grid (zero ring)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [xp[:, :-1, :-1], xp[:, :-1, 1:], xp[:, 1:, :-1], xp[:, 1:, 1:]],
        axis=-1)


def _col_chunks(h, w, c):
    """Packed-column ranges [(a, b)] so each chunk table fits the budget."""
    per_col = (h + 1) * 4 * c * 4
    total = per_col * (w + 1)
    k = max(1, -(-total // TABLE_BUDGET_BYTES))
    if k > w + 1:
        return None
    import numpy as np
    edges = np.linspace(0, w + 1, k + 1).astype(int)
    return [(int(edges[i]), int(edges[i + 1]) - 1) for i in range(k)
            if edges[i + 1] > edges[i]]


def _dcn_sample_ref(x, sx, sy, mask):
    """XLA reference (packed-corner take): [B, Q, S, C] f32 taps."""
    from vidar_tpu.ops.gather import (bilinear_weights, pack_corners_2d,
                                      take_rows)
    b, h, w, c = x.shape
    _, q, s = sx.shape
    packed = pack_corners_2d(x.astype(jnp.float32))
    rows = packed.shape[1]
    row, cw = bilinear_weights(sx.reshape(b, -1), sy.reshape(b, -1), h, w)
    offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
    g = take_rows(packed.reshape(b * rows, 4 * c), row + offs)
    g = g.reshape(b, q * s, 4, c)
    out = jnp.einsum('bncd,bnc->bnd', g, cw.astype(jnp.float32))
    return out.reshape(b, q, s, c) * mask[..., None]


def _dcn_sample_fwd_impl(x, sx, sy, mask, q_block=None):
    b, h, w, c = x.shape
    _, q, s = sx.shape
    rc = c // 128
    if q_block is None:
        # bound the out block VMEM (q_block * S * rc * 512B, double-buffered)
        q_block = max(QT, 128 // max(1, rc // 2))
    chunks = _col_chunks(h, w, c)
    interpret = jax.default_backend() == 'cpu'
    packed = _pack_full(x.astype(jnp.float32))   # [B, H+1, W+1, 4C]

    qp = q + ((-q) % q_block)
    x_pix = sx.astype(jnp.float32)
    y_pix = sy.astype(jnp.float32)
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    wx1 = x_pix - x0
    wy1 = y_pix - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    xp_col = jnp.clip(ix0 + 1, 0, w)
    yp_row = jnp.clip(iy0 + 1, 0, h)

    out = None
    for (a, bcol) in chunks:
        wc = bcol - a + 1
        tab = packed[:, :, a:bcol + 1, :].reshape(b, (h + 1) * wc * 4 * rc,
                                                  128)
        in_chunk = (xp_col >= a) & (xp_col <= bcol)
        row = yp_row * wc + jnp.clip(xp_col - a, 0, wc - 1)
        aw = (mask.astype(jnp.float32) *
              (valid & in_chunk).astype(jnp.float32))
        cw4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                        axis=-1) * aw[..., None]
        cw4 = cw4.reshape(b, q, 4 * s)
        row = row.astype(jnp.int32)
        if qp != q:
            row = jnp.pad(row, ((0, 0), (0, qp - q), (0, 0)))
            cw4 = jnp.pad(cw4, ((0, 0), (0, qp - q), (0, 0)))
        part = dcn_gather(tab, row, cw4, rc=rc, q_block=q_block,
                          interpret=interpret)
        out = part if out is None else out + part
    out = out.reshape(b, qp, s, rc * 128)[:, :q]
    return out


@jax.custom_vjp
def dcn_sample(x, sx, sy, mask):
    """Modulated DCN tap sampling: [B,H,W,C], [B,Q,S] coords/mask ->
    [B, Q, S, C] f32. Pallas forward; backward recomputes through the XLA
    reference formulation."""
    return _dcn_sample_fwd_impl(x, sx, sy, mask)


def _dcn_sample_vfwd(x, sx, sy, mask):
    return dcn_sample(x, sx, sy, mask), (x, sx, sy, mask)


def _dcn_sample_vbwd(res, g):
    x, sx, sy, mask = res
    _, vjp = jax.vjp(_dcn_sample_ref, x, sx, sy, mask)
    return vjp(g)


dcn_sample.defvjp(_dcn_sample_vfwd, _dcn_sample_vbwd)


def dcn_sample_available(h, w, c):
    """Whether the Pallas DCN path can take this shape.

    c must be a multiple of 256 so a packed sample (4*c/128 rows) starts on
    a sublane boundary."""
    return (c % 256 == 0 and _col_chunks(h, w, c) is not None)


# ---------------------------------------------------------------------------
# u32 channel-pair-packed variant ("dcn16"): bf16 values at HALF the VMEM
# and half the dynamic-load rows of the f32 packed-corner kernel above.
#
# Table: per-pixel rows (NO corner packing) over a zero-ring (H+2, W+2)
# grid; lane l of a pixel row packs channels (2l, 2l+1) as bf16 bit
# patterns in one uint32 (exact for bf16 model values — see
# msda_pallas.pack_atlas16). The 4 bilinear corners of a tap live at rows
# (r, r+1, r+W+2, r+W+3), gathered as 4 dynamic row loads and folded
# lane-major like the msda kernel: per 8-query tile the corner rows are
# concatenated along lanes, corner weights are expanded across channel
# lanes with a constant 0/1 MXU matmul, and the corner reduction is 4
# static lane-segment adds. Output channels come out (evens || odds) per
# tap — the caller folds that fixed permutation into the conv kernel.
# ---------------------------------------------------------------------------

QT16 = 8
TABLE16_BUDGET_BYTES = 9_000_000


def _expand_corner_mat(cl):
    """[4, 4*cl] 0/1: output lane l belongs to corner l // cl."""
    src = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cl), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * cl), 1)
    return (dst // cl == src).astype(jnp.float32)


def _dcn16_kernel(w2: int, idx_ref, cw_ref, table_hbm, out_ref, table, sem):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]
    cl = table.shape[1]          # lanes per pixel row = C // 2

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    emat = _expand_corner_mat(cl)
    hi_mask = jnp.uint32(0xffff0000)

    def tile(i, _):
        q0 = pl.multiple_of(i * QT16, QT16)
        tap_outs = []
        for k in range(s):
            qrows = []
            for j in range(QT16):
                r = idx_ref[0, q0 + j, k]
                c00 = table[pl.ds(r, 1), :]
                c01 = table[pl.ds(r + 1, 1), :]
                c10 = table[pl.ds(r + w2, 1), :]
                c11 = table[pl.ds(r + w2 + 1, 1), :]
                qrows.append(jnp.concatenate([c00, c01, c10, c11], axis=1))
            g = jnp.concatenate(qrows, axis=0)          # [QT, 4*cl] u32
            ghi = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(g, jnp.broadcast_to(hi_mask, g.shape)),
                jnp.float32)
            glo = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(g, jnp.broadcast_to(jnp.uint32(16),
                                                       g.shape)),
                jnp.float32)
            cw = cw_ref[0, pl.ds(q0, QT16), 4 * k:4 * (k + 1)]   # [QT, 4]
            w_rep = jax.lax.dot_general(
                cw, emat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            phi = ghi * w_rep
            plo = glo * w_rep
            acc_hi = (phi[:, 0:cl] + phi[:, cl:2 * cl] +
                      phi[:, 2 * cl:3 * cl] + phi[:, 3 * cl:4 * cl])
            acc_lo = (plo[:, 0:cl] + plo[:, cl:2 * cl] +
                      plo[:, 2 * cl:3 * cl] + plo[:, 3 * cl:4 * cl])
            tap_outs.append(acc_hi)
            tap_outs.append(acc_lo)
        out_tile = jnp.concatenate(tap_outs, axis=1)    # [QT, s*2*cl]
        out_ref[0, pl.ds(q0, QT16), :] = out_tile
        return 0

    jax.lax.fori_loop(0, q_blk // QT16, tile, 0)


_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit,
                   static_argnames=('w2', 'q_block', 'interpret'))
def dcn16_gather(table16: jnp.ndarray, row_idx: jnp.ndarray,
                 cw4: jnp.ndarray, w2: int, q_block: int = 128,
                 interpret: bool = False) -> jnp.ndarray:
    """u32-packed DCN tap gather + bilinear fold.

    table16: [B, Rpad, C//2] uint32 channel-pair rows over the zero-ring
    (H+2, W+2) pixel grid (w2 = W + 2), rows padded to 8.
    row_idx: [B, Q, S] int32 top-left corner pixel row (clipped in-range).
    cw4: [B, Q, 4*S] f32 corner weights (y-major corner order) with the
    modulation mask and validity folded in.
    Returns [B, Q, S*C] f32; per tap the channels are (evens || odds).
    """
    bsz, rrows, cl = table16.shape
    assert table16.dtype == jnp.uint32 and cl % 128 == 0
    _, q, s = row_idx.shape
    assert q % q_block == 0 and q_block % QT16 == 0
    assert cw4.shape == (bsz, q, 4 * s)

    kern = functools.partial(_dcn16_kernel, w2)
    return pl.pallas_call(
        kern,
        grid=(bsz, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, s * 2 * cl),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, q, s * 2 * cl), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rrows, cl), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, cw4, table16)


def pack_table16(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, Rpad, C//2] u32 zero-ring channel-pair table."""
    b, h, w, c = x.shape
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    u16 = jax.lax.bitcast_convert_type(xp, jnp.uint16).astype(jnp.uint32)
    word = (u16[..., 0::2] << 16) | u16[..., 1::2]
    word = word.reshape(b, (h + 2) * (w + 2), c // 2)
    rpad = (-word.shape[1]) % 8
    if rpad:
        word = jnp.pad(word, ((0, 0), (0, rpad), (0, 0)))
    return word


def dcn16_channel_perm(c: int) -> list:
    """Per-tap channel order emitted by dcn16_gather: evens then odds."""
    return list(range(0, c, 2)) + list(range(1, c, 2))


def _dcn_sample16_fwd_impl(x, sx, sy, mask, q_block=128):
    b, h, w, c = x.shape
    _, q, s = sx.shape
    interpret = jax.default_backend() == 'cpu'
    table16 = pack_table16(x)

    x_pix = sx.astype(jnp.float32)
    y_pix = sy.astype(jnp.float32)
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    wx1 = x_pix - x0
    wy1 = y_pix - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    row = (jnp.clip(iy0 + 1, 0, h) * (w + 2) +
           jnp.clip(ix0 + 1, 0, w)).astype(jnp.int32)
    aw = mask.astype(jnp.float32) * valid.astype(jnp.float32)
    cw4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                    axis=-1) * aw[..., None]
    cw4 = cw4.reshape(b, q, 4 * s)

    qp = q + ((-q) % q_block)
    if qp != q:
        row = jnp.pad(row, ((0, 0), (0, qp - q), (0, 0)))
        cw4 = jnp.pad(cw4, ((0, 0), (0, qp - q), (0, 0)))
    out = dcn16_gather(table16, row, cw4, w2=w + 2, q_block=q_block,
                       interpret=interpret)
    return out[:, :q]      # [B, Q, S*C], channels (evens||odds) per tap


def _dcn_sample16_ref_perm(x, sx, sy, mask):
    """XLA reference in the dcn16 output layout (bf16 values, permuted)."""
    b, h, w, c = x.shape
    _, q, s = sx.shape
    taps = _dcn_sample_ref(x.astype(jnp.bfloat16).astype(jnp.float32),
                           sx, sy, mask)          # [B, Q, S, C]
    perm = jnp.asarray(dcn16_channel_perm(c), jnp.int32)
    return taps[..., perm].reshape(b, q, s * c)


@jax.custom_vjp
def dcn_sample16(x, sx, sy, mask):
    """u32-packed modulated DCN tap sampling.

    x [B,H,W,C] (bf16-representable values), sx/sy/mask [B,Q,S] ->
    [B, Q, S*C] f32 taps with per-tap channels ordered (evens || odds)
    (fold ``dcn16_channel_perm`` into the consuming conv kernel).
    Pallas forward; backward is a hand-rolled q-chunked recomputation
    (``_dcn_sample16_vbwd``).
    """
    return _dcn_sample16_fwd_impl(x, sx, sy, mask)


def _dcn_sample16_vfwd(x, sx, sy, mask):
    return dcn_sample16(x, sx, sy, mask), (x, sx, sy, mask)


def _dcn_sample16_vbwd(res, g, q_chunk=512):
    """Hand-rolled chunked backward (same math as ``jax.vjp`` of
    ``_dcn_sample16_ref_perm``, which this replaces).

    The autodiff formulation materialized the full gathered-corner tensor
    in f32 — [6, 52200, 4, 256] = 1.28 GB at RN101 stage-3 flagship shapes,
    plus a same-sized corner-gradient tensor: the #2 contributor to the
    flagship train-step OOM. This version scans over ``q_chunk``-query
    slices (~113 MB of f32 transients per chunk), accumulating the packed
    corner-table gradient as the scan carry and emitting per-chunk
    mask/corner-weight gradients; the work (gather rows, scatter adds,
    FLOPs) is identical — only the liveness changes.
    """
    from vidar_tpu.ops.gather import pack_corners_2d, bilinear_weights
    import numpy as np
    x, sx, sy, mask = res
    b, h, w, c = x.shape
    _, q, s = sx.shape

    inv = np.argsort(dcn16_channel_perm(c))
    dtaps = g.reshape(b, q, s, c)[..., jnp.asarray(inv, jnp.int32)]

    packed = pack_corners_2d(x.astype(jnp.bfloat16))   # [b, rows, 4c]
    rows = packed.shape[1]
    flat = packed.reshape(b * rows, 4 * c)

    sxf = sx.astype(jnp.float32)
    syf = sy.astype(jnp.float32)
    row, cw = bilinear_weights(sxf.reshape(b, -1), syf.reshape(b, -1), h, w)
    offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
    row = (row + offs).reshape(b, q, s)
    cw = cw.reshape(b, q, s, 4)

    qc = min(q_chunk, q)
    nch = -(-q // qc)
    qp = nch * qc

    def padq(a):
        return (a if qp == q
                else jnp.pad(a, ((0, 0), (0, qp - q)) +
                             ((0, 0),) * (a.ndim - 2)))

    # [b, qp, ...] -> [nch, b, qc, ...] scan slices
    def chunked(a):
        a = padq(a)
        return jnp.moveaxis(
            a.reshape(b, nch, qc, *a.shape[2:]), 1, 0)

    xs = (chunked(row), chunked(cw), chunked(mask.astype(jnp.float32)),
          chunked(dtaps))

    def body(dpk, xs):
        row_c, cw_c, mask_c, dt_c = xs
        n = qc * s
        gcf = jnp.take(flat, row_c.reshape(-1), axis=0).reshape(
            b, n, 4, c).astype(jnp.float32)
        dt = dt_c.reshape(b, n, c).astype(jnp.float32)
        cw_n = cw_c.reshape(b, n, 4)
        samp = jnp.einsum('bncd,bnc->bnd', gcf, cw_n)     # pre-mask sample
        dmask_c = (dt * samp).sum(-1).reshape(b, qc, s)
        dout_e = dt * mask_c.reshape(b, n, 1)
        dcw_c = jnp.einsum('bncd,bnd->bnc', gcf, dout_e)
        dgc = cw_n[..., None] * dout_e[:, :, None, :]     # [b, n, 4, c]
        dpk = dpk.at[row_c.reshape(-1)].add(
            dgc.reshape(b * n, 4 * c))
        return dpk, (dmask_c, dcw_c.reshape(b, qc, s, 4))

    dpk0 = jnp.zeros((b * rows, 4 * c), jnp.float32)
    dpk, (dmask_ch, dcw_ch) = jax.lax.scan(body, dpk0, xs)
    dmask = jnp.moveaxis(dmask_ch, 0, 1).reshape(b, qp, s)[:, :q]
    dcw = jnp.moveaxis(dcw_ch, 0, 1).reshape(b, qp, s, 4)[:, :q]

    # adjoint of pack_corners_2d: shift-add the 4 corner channel groups
    dp = dpk.reshape(b, h + 1, w + 1, 4 * c)
    dvp = jnp.zeros((b, h + 2, w + 2, c), jnp.float32)
    dvp = dvp.at[:, :-1, :-1].add(dp[..., :c])
    dvp = dvp.at[:, :-1, 1:].add(dp[..., c:2 * c])
    dvp = dvp.at[:, 1:, :-1].add(dp[..., 2 * c:3 * c])
    dvp = dvp.at[:, 1:, 1:].add(dp[..., 3 * c:])
    dx = dvp[:, 1:-1, 1:-1].astype(x.dtype)

    # adjoint of the bilinear corner weights (cw included `valid`)
    x0 = jnp.floor(sxf)
    y0 = jnp.floor(syf)
    wx1 = sxf - x0
    wy1 = syf - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) &
             (ix0 <= w - 1)).astype(jnp.float32)
    dcw = dcw * valid[..., None]
    dsx = (wy0 * (dcw[..., 1] - dcw[..., 0]) +
           wy1 * (dcw[..., 3] - dcw[..., 2])).astype(sx.dtype)
    dsy = (wx0 * (dcw[..., 2] - dcw[..., 0]) +
           wx1 * (dcw[..., 3] - dcw[..., 1])).astype(sy.dtype)
    return dx, dsx, dsy, dmask.astype(mask.dtype)


dcn_sample16.defvjp(_dcn_sample16_vfwd, _dcn_sample16_vbwd)


def dcn_sample16_available(h, w, c):
    """dcn16 needs 128-lane-multiple pixel rows and a VMEM-resident table."""
    table_bytes = (h + 2) * (w + 2) * (c // 2) * 4
    return c % 256 == 0 and table_bytes <= TABLE16_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Fully-fused modulated deformable CONV ("dcn_conv16"): the dcn16 tap
# gather/fold above plus the 3x3 conv matmul, in one kernel. The
# intermediate tap tensor ([B, Q, 9*C] — 159 MB per RN101 stage-3 block at
# flagship shapes) never touches HBM: the forward saves its write+read
# round-trip per DCN block, and the train-step backward no longer keeps 23
# of them alive at once (XLA scheduled every block's recomputed taps before
# any consumer — the last big flagship OOM contributor). The conv kernel
# (permuted to the kernel's evens||odds tap-channel order) sits VMEM-
# resident next to the table; each 8-query tile closes with one
# [QT, 9C] x [9C, CO] MXU matmul (bf16 operands, f32 accumulation — the
# same math as the XLA bf16 matmul it replaces).
# ---------------------------------------------------------------------------


def _dcn16_conv_kernel(w2: int, idx_ref, cw_ref, kp_ref, table_hbm,
                       out_ref, table, tapbuf, sem):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]
    cl = table.shape[1]          # lanes per pixel row = C // 2

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    emat = _expand_corner_mat(cl)
    hi_mask = jnp.uint32(0xffff0000)

    def tile(i, _):
        q0 = pl.multiple_of(i * QT16, QT16)
        tap_outs = []
        for k in range(s):
            qrows = []
            for j in range(QT16):
                r = idx_ref[0, q0 + j, k]
                c00 = table[pl.ds(r, 1), :]
                c01 = table[pl.ds(r + 1, 1), :]
                c10 = table[pl.ds(r + w2, 1), :]
                c11 = table[pl.ds(r + w2 + 1, 1), :]
                qrows.append(jnp.concatenate([c00, c01, c10, c11], axis=1))
            g = jnp.concatenate(qrows, axis=0)          # [QT, 4*cl] u32
            ghi = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(g, jnp.broadcast_to(hi_mask, g.shape)),
                jnp.float32)
            glo = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(g, jnp.broadcast_to(jnp.uint32(16),
                                                       g.shape)),
                jnp.float32)
            cw = cw_ref[0, pl.ds(q0, QT16), 4 * k:4 * (k + 1)]   # [QT, 4]
            w_rep = jax.lax.dot_general(
                cw, emat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            phi = ghi * w_rep
            plo = glo * w_rep
            acc_hi = (phi[:, 0:cl] + phi[:, cl:2 * cl] +
                      phi[:, 2 * cl:3 * cl] + phi[:, 3 * cl:4 * cl])
            acc_lo = (plo[:, 0:cl] + plo[:, cl:2 * cl] +
                      plo[:, 2 * cl:3 * cl] + plo[:, 3 * cl:4 * cl])
            tap_outs.append(acc_hi)
            tap_outs.append(acc_lo)
        taps = jnp.concatenate(tap_outs, axis=1)        # [QT, s*2*cl] f32
        tapbuf[pl.ds(q0, QT16), :] = taps
        return 0

    jax.lax.fori_loop(0, q_blk // QT16, tile, 0)

    # ONE large-M conv matmul per q-block. The round-3 version ran the
    # matmul inside each 8-query tile: M=8 rows streamed through the
    # ~36-72 MXU weight tiles of [s*2*cl, co] — weight-load/fill-latency
    # bound, and the dominant term of the 14.5 ms/call stage-3 kernel
    # (round-4 trace). Staging taps in VMEM and convolving 128 queries at
    # a time amortizes the weight tiles ~16x.
    # bf16 round + MXU conv: bf16 x bf16 is exact on the MXU at DEFAULT
    # precision; accumulation is f32 — same math as the XLA
    # `taps.astype(bf16) @ kperm` this fuses away.
    for m0 in range(0, q_blk, 128):
        mm = min(128, q_blk - m0)
        out_ref[0, m0:m0 + mm, :] = jax.lax.dot_general(
            tapbuf[m0:m0 + mm, :].astype(jnp.bfloat16), kp_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=('w2', 'q_block', 'interpret'))
def dcn16_conv_gather(table16: jnp.ndarray, row_idx: jnp.ndarray,
                      cw4: jnp.ndarray, kperm: jnp.ndarray, w2: int,
                      q_block: int = 128,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused u32-packed DCN tap gather + bilinear fold + conv matmul.

    kperm: [S*C, CO] bf16 conv kernel with per-tap channels in the
    (evens || odds) order the gather emits. Returns [B, Q, CO] f32.
    """
    bsz, rrows, cl = table16.shape
    assert table16.dtype == jnp.uint32 and cl % 128 == 0
    _, q, s = row_idx.shape
    assert q % q_block == 0 and q_block % QT16 == 0 and q_block % 128 == 0
    assert cw4.shape == (bsz, q, 4 * s)
    assert kperm.dtype == jnp.bfloat16 and kperm.shape[0] == s * 2 * cl
    co = kperm.shape[1]
    assert co % 128 == 0

    kern = functools.partial(_dcn16_conv_kernel, w2)
    return pl.pallas_call(
        kern,
        grid=(bsz, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s * 2 * cl, co), lambda bi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, co),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, q, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rrows, cl), jnp.uint32),
            pltpu.VMEM((q_block, s * 2 * cl), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(row_idx, cw4, kperm, table16)


def _dcn_conv16_fwd_impl(x, sx, sy, mask, kperm, q_block=128):
    b, h, w, c = x.shape
    _, q, s = sx.shape
    interpret = jax.default_backend() == 'cpu'
    table16 = pack_table16(x)

    x_pix = sx.astype(jnp.float32)
    y_pix = sy.astype(jnp.float32)
    ix0 = jnp.floor(x_pix).astype(jnp.int32)
    iy0 = jnp.floor(y_pix).astype(jnp.int32)
    wx1 = x_pix - jnp.floor(x_pix)
    wy1 = y_pix - jnp.floor(y_pix)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    row = (jnp.clip(iy0 + 1, 0, h) * (w + 2) +
           jnp.clip(ix0 + 1, 0, w)).astype(jnp.int32)
    aw = mask.astype(jnp.float32) * valid.astype(jnp.float32)
    cw4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                    axis=-1) * aw[..., None]
    cw4 = cw4.reshape(b, q, 4 * s)

    qp = q + ((-q) % q_block)
    if qp != q:
        row = jnp.pad(row, ((0, 0), (0, qp - q), (0, 0)))
        cw4 = jnp.pad(cw4, ((0, 0), (0, qp - q), (0, 0)))
    out = dcn16_conv_gather(table16, row, cw4, kperm.astype(jnp.bfloat16),
                            w2=w + 2, q_block=q_block, interpret=interpret)
    return out[:, :q]      # [B, Q, CO] f32


@jax.custom_vjp
def dcn_conv16(x, sx, sy, mask, kperm):
    """Fully-fused modulated deformable conv.

    x [B,H,W,C] (bf16-representable), sx/sy/mask [B,Q,S],
    kperm [S*C, CO] (per-tap channels in evens||odds order) ->
    [B, Q, CO] f32. Pallas forward (taps never touch HBM); backward is the
    q-chunked scan of ``dcn_sample16`` extended with the conv adjoints.
    """
    return _dcn_conv16_fwd_impl(x, sx, sy, mask, kperm)


def _dcn_conv16_vfwd(x, sx, sy, mask, kperm):
    return dcn_conv16(x, sx, sy, mask, kperm), (x, sx, sy, mask, kperm)


def _dcn_conv16_vbwd(res, g, q_chunk=512):
    """Chunked backward: per chunk, d_taps = g @ kperm^T, then the same
    gather-recompute adjoints as ``_dcn_sample16_vbwd``; d_kperm
    accumulates taps^T @ g in the scan carry."""
    from vidar_tpu.ops.gather import pack_corners_2d, bilinear_weights
    import numpy as np
    x, sx, sy, mask, kperm = res
    b, h, w, c = x.shape
    _, q, s = sx.shape
    co = kperm.shape[1]

    perm = np.asarray(dcn16_channel_perm(c))
    # kernel-layout index of natural channel ch of tap k:
    # pos[k*c + perm[j]] = k*c + j  ->  natural_from_kernel index map
    inv = np.argsort(perm)
    kp16 = kperm.astype(jnp.bfloat16)

    packed = pack_corners_2d(x.astype(jnp.bfloat16))   # [b, rows, 4c]
    rows = packed.shape[1]
    flat = packed.reshape(b * rows, 4 * c)

    sxf = sx.astype(jnp.float32)
    syf = sy.astype(jnp.float32)
    row, cw = bilinear_weights(sxf.reshape(b, -1), syf.reshape(b, -1), h, w)
    offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
    row = (row + offs).reshape(b, q, s)
    cw = cw.reshape(b, q, s, 4)

    qc = min(q_chunk, q)
    nch = -(-q // qc)
    qp = nch * qc

    def padq(a):
        return (a if qp == q
                else jnp.pad(a, ((0, 0), (0, qp - q)) +
                             ((0, 0),) * (a.ndim - 2)))

    def chunked(a):
        a = padq(a)
        return jnp.moveaxis(a.reshape(b, nch, qc, *a.shape[2:]), 1, 0)

    xs = (chunked(row), chunked(cw), chunked(mask.astype(jnp.float32)),
          chunked(g.astype(jnp.float32)))
    inv_j = jnp.asarray(inv, jnp.int32)
    perm_j = jnp.asarray(perm, jnp.int32)

    def body(carry, xs):
        dpk, dkp = carry
        row_c, cw_c, mask_c, g_c = xs
        n = qc * s
        # conv adjoint: d_taps (kernel layout) -> natural tap order
        dt_k = jnp.einsum('bqo,ko->bqk', g_c, kp16.astype(jnp.float32))
        dt = dt_k.reshape(b, qc, s, c)[..., inv_j].reshape(b, n, c)
        gcf = jnp.take(flat, row_c.reshape(-1), axis=0).reshape(
            b, n, 4, c).astype(jnp.float32)
        cw_n = cw_c.reshape(b, n, 4)
        samp = jnp.einsum('bncd,bnc->bnd', gcf, cw_n)     # pre-mask taps
        dmask_c = (dt * samp).sum(-1).reshape(b, qc, s)
        dout_e = dt * mask_c.reshape(b, n, 1)
        dcw_c = jnp.einsum('bncd,bnd->bnc', gcf, dout_e)
        dgc = cw_n[..., None] * dout_e[:, :, None, :]
        dpk = dpk.at[row_c.reshape(-1)].add(dgc.reshape(b * n, 4 * c))
        # d_kperm: taps (masked, kernel layout, bf16-rounded) ^T @ g
        taps = (samp * mask_c.reshape(b, n, 1)).reshape(b, qc, s, c)
        taps_k = taps[..., perm_j].reshape(b, qc, s * c)
        taps_k = taps_k.astype(jnp.bfloat16).astype(jnp.float32)
        dkp = dkp + jnp.einsum('bqk,bqo->ko', taps_k, g_c)
        return (dpk, dkp), (dmask_c, dcw_c.reshape(b, qc, s, 4))

    dpk0 = jnp.zeros((b * rows, 4 * c), jnp.float32)
    dkp0 = jnp.zeros((s * c, co), jnp.float32)
    (dpk, dkp), (dmask_ch, dcw_ch) = jax.lax.scan(body, (dpk0, dkp0), xs)
    dmask = jnp.moveaxis(dmask_ch, 0, 1).reshape(b, qp, s)[:, :q]
    dcw = jnp.moveaxis(dcw_ch, 0, 1).reshape(b, qp, s, 4)[:, :q]

    dp = dpk.reshape(b, h + 1, w + 1, 4 * c)
    dvp = jnp.zeros((b, h + 2, w + 2, c), jnp.float32)
    dvp = dvp.at[:, :-1, :-1].add(dp[..., :c])
    dvp = dvp.at[:, :-1, 1:].add(dp[..., c:2 * c])
    dvp = dvp.at[:, 1:, :-1].add(dp[..., 2 * c:3 * c])
    dvp = dvp.at[:, 1:, 1:].add(dp[..., 3 * c:])
    dx = dvp[:, 1:-1, 1:-1].astype(x.dtype)

    x0 = jnp.floor(sxf)
    y0 = jnp.floor(syf)
    wx1 = sxf - x0
    wy1 = syf - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) &
             (ix0 <= w - 1)).astype(jnp.float32)
    dcw = dcw * valid[..., None]
    dsx = (wy0 * (dcw[..., 1] - dcw[..., 0]) +
           wy1 * (dcw[..., 3] - dcw[..., 2])).astype(sx.dtype)
    dsy = (wx0 * (dcw[..., 2] - dcw[..., 0]) +
           wx1 * (dcw[..., 3] - dcw[..., 1])).astype(sy.dtype)
    return (dx, dsx, dsy, dmask.astype(mask.dtype),
            dkp.astype(kperm.dtype))


dcn_conv16.defvjp(_dcn_conv16_vfwd, _dcn_conv16_vbwd)


def _dcn_conv16_ref(x, sx, sy, mask, kperm):
    """XLA reference: the unfused taps-then-matmul path (the module's old
    formulation) for parity tests."""
    taps = _dcn_sample16_ref_perm(x, sx, sy, mask)      # [B, Q, S*C] f32
    return jnp.einsum('bqk,ko->bqo', taps.astype(jnp.bfloat16),
                      kperm.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


# total VMEM budget for everything the fused conv keeps resident at once
# (~16 MB/core, minus Mosaic's own working space)
DCN_CONV16_VMEM_BUDGET_BYTES = 13_500_000


def dcn_conv16_available(h, w, c, co, s=9, q_block=128):
    """Fused deform-conv feasibility: 128-lane-multiple output channels and
    the COMBINED VMEM residency of one kernel invocation — packed u32
    table + bf16 kperm + f32 tapbuf scratch + double-buffered cw4/output
    blocks — under one budget (gating table and kperm independently let
    near-limit shapes pass the gate and then fail Mosaic allocation)."""
    if not (dcn_sample16_available(h, w, c) and co % 128 == 0):
        return False
    table = (h + 2) * (w + 2) * (c // 2) * 4          # u32 channel pairs
    kperm = s * c * co * 2                            # bf16, VMEM block
    tapbuf = q_block * s * c * 4                      # f32 scratch
    blocks = 2 * (q_block * 4 * s * 4 + q_block * co * 4)  # cw4 + out, 2x
    return (table + kperm + tapbuf + blocks
            <= DCN_CONV16_VMEM_BUDGET_BYTES)
