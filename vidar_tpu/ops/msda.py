"""Multi-scale deformable attention core op (TPU, XLA gather formulation).

Semantics match mmcv's ``multi_scale_deformable_attn_pytorch`` fallback used by
the reference when CUDA is absent (reference:
projects/mmdet3d_plugin/bevformer/modules/spatial_cross_attention.py:392-394 and
mmcv's CUDA ``ms_deform_attn_forward``): for every (query, head, level, point),
bilinearly sample the per-head value map at the sampling location (grid_sample
with align_corners=False, zero padding) and reduce with the attention weights.

This is THE hot primitive of the whole framework — temporal self-attention,
spatial cross-attention, and the future decoder all reduce to it. The default
implementation on accelerators is the fused Pallas kernel (``ops.msda_pallas``:
per-(batch, head) tables VMEM-resident, gather + weighted reduce in one pass);
XLA gather formulations ('packed'/'atlas'/'plain') remain for the CPU backend,
for shapes the kernel cannot take, and as the numerical oracle.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# per-head channel dim of the fused kernel (== msda_pallas.DIM; duplicated
# here so the planning helpers don't import the Pallas module eagerly)
DIM_TABLE = 32


def _level_sample(value_l: jnp.ndarray, loc: jnp.ndarray, h: int, w: int):
    """Bilinear sample of one level's per-head value maps.

    Args:
      value_l: [B, h*w, heads, dim]
      loc: [B, Q, heads, P, 2] sampling locations in [0, 1] (mmcv convention:
        grid = 2*loc - 1 before grid_sample).
    Returns:
      [B, Q, heads, P, dim] sampled values (fp32).
    """
    b, _, heads, dim = value_l.shape
    q = loc.shape[1]
    p = loc.shape[3]
    # unnormalized pixel coords (align_corners=False): x_pix = loc * size - 0.5
    x = loc[..., 0].astype(jnp.float32) * w - 0.5
    y = loc[..., 1].astype(jnp.float32) * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    # [B, heads, h*w, dim] so the gather axis is per-head.
    v = value_l.transpose(0, 2, 1, 3)

    def gather(iy, ix):
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        # idx: [B, Q, heads, P] -> [B, heads, Q*P]
        idx_t = idx.transpose(0, 2, 1, 3).reshape(b, heads, q * p)
        out = jnp.take_along_axis(v, idx_t[..., None], axis=2)
        out = out.reshape(b, heads, q, p, dim)
        mask = valid.transpose(0, 2, 1, 3)[..., None].astype(out.dtype)
        return out * mask

    v00 = gather(iy0, ix0).astype(jnp.float32)
    v01 = gather(iy0, ix0 + 1).astype(jnp.float32)
    v10 = gather(iy0 + 1, ix0).astype(jnp.float32)
    v11 = gather(iy0 + 1, ix0 + 1).astype(jnp.float32)

    wx1 = wx1.transpose(0, 2, 1, 3)[..., None]
    wy1 = wy1.transpose(0, 2, 1, 3)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (v00 * wy0 * wx0 + v01 * wy0 * wx1 +
           v10 * wy1 * wx0 + v11 * wy1 * wx1)
    # [B, heads, Q, P, dim] -> [B, Q, heads, P, dim]
    return out.transpose(0, 2, 1, 3, 4)


def _pack_kernel(dim: int, dtype) -> 'np.ndarray':
    """0/1 HWIO kernel for the conv formulation of ``_pack_corners``:
    input channel d is copied to output channel ``f*dim + d`` where
    ``f = dy*2+dx`` indexes the corner. Single-term sums, so the conv is
    bit-exact. Heads ride the conv BATCH dim (see ``_pack_corners``)."""
    k = np.zeros((2, 2, dim, 4 * dim), np.float32)
    d = np.arange(dim)
    for dy in range(2):
        for dx in range(2):
            f = dy * 2 + dx
            k[dy, dx, d, f * dim + d] = 1.0
    return k.astype(dtype)


def _pack_corners(value_l: jnp.ndarray, h: int, w: int,
                  out_dtype=None) -> jnp.ndarray:
    """Pack the 4 bilinear corners of every pixel into one row.

    value_l: [B, h*w, heads, dim] -> [B, heads, (h+1)*(w+1), 4*dim] where row
    (y+1, x+1) holds [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] with a zero ring
    so out-of-range corners contribute zero. One gather then fetches all four
    corners of a sample (TPU gathers are row-rate-bound: 4x fewer rows and
    wider rows are both wins).

    Implemented as a 2x2 zero-padded convolution with a 0/1 kernel and the
    heads folded into the conv BATCH: the pad IS the zero ring and the
    kernel does the corner gather on the MXU (exact — one term per output
    element). The head de-interleave transpose runs BEFORE the 4x corner
    expansion (moves ``dim``-lane granules of the raw rows, 8x less data
    than transposing the packed table afterwards), and the conv output IS
    the final [B*H, R, 4*dim] table layout — no post-transpose. The naive
    pad+shift+concat formulation measured ~10x the bandwidth floor on v5e
    (benchmarks/pack_bench.py).
    """
    b, _, heads, dim = value_l.shape
    out_dtype = out_dtype or value_l.dtype
    x = value_l.reshape(b, h, w, heads, dim).transpose(0, 3, 1, 2, 4)
    x = x.reshape(b * heads, h, w, dim)
    kern = jnp.asarray(_pack_kernel(dim, value_l.dtype))
    # bf16 operands are exact on the MXU at DEFAULT (and the kernel is
    # 0/1 single-term); HIGHEST on bf16 still runs multi-pass — measured
    # 3.0 ms vs ~0.5 ms for the level-0 pack (trace fusion.648).
    prec = (jax.lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=prec,
        preferred_element_type=out_dtype)
    return out.reshape(b, heads, (h + 1) * (w + 1), 4 * dim)


def _level_sample_packed(packed: jnp.ndarray, loc: jnp.ndarray,
                         h: int, w: int):
    """Packed-corner bilinear sampling.

    packed: [B, heads, (h+1)*(w+1), 4*dim]; loc: [B, Q, heads, P, 2] in [0,1].
    Returns [B, Q, heads, P, dim] fp32.
    """
    b, heads, rows, dim4 = packed.shape
    dim = dim4 // 4
    q, p = loc.shape[1], loc.shape[3]

    x = loc[..., 0].astype(jnp.float32) * w - 0.5
    y = loc[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).transpose(0, 2, 1, 3)  # [B, heads, Q, P]
    wy1 = (y - y0).transpose(0, 2, 1, 3)
    ix0 = x0.astype(jnp.int32).transpose(0, 2, 1, 3)
    iy0 = y0.astype(jnp.int32).transpose(0, 2, 1, 3)

    # corner base must lie in [-1, h-1] x [-1, w-1] to touch the map
    valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
    iy = jnp.clip(iy0 + 1, 0, h)
    ix = jnp.clip(ix0 + 1, 0, w)
    row = iy * (w + 1) + ix  # [B, heads, Q, P]

    # flatten (B, heads) into the row index for a single flat take
    flat = packed.reshape(b * heads * rows, dim4)
    bh_off = (jnp.arange(b * heads, dtype=jnp.int32) * rows).reshape(
        b, heads, 1, 1)
    gathered = jnp.take(flat, (row + bh_off).reshape(-1), axis=0)
    gathered = gathered.reshape(b, heads, q, p, 4, dim).astype(jnp.float32)

    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                   axis=-1)  # [B, heads, Q, P, 4]
    cw = cw * valid[..., None].astype(jnp.float32)
    out = jnp.einsum('bhqpcd,bhqpc->bhqpd', gathered, cw)
    return out.transpose(0, 2, 1, 3, 4)


def _msda_block_packed(packed_levels, spatial_shapes, loc, weights):
    """One query-block of packed-corner deformable attention (per-level takes).

    Measured fastest on v5e: per-level flat takes of 256B rows (the gather
    row-rate sweet spot) + per-level weighted reduction.
    """
    b, qb, heads = loc.shape[:3]
    dim = packed_levels[0].shape[-1] // 4
    out = jnp.zeros((b, qb, heads, dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        sampled = _level_sample_packed(packed_levels[lvl], loc[:, :, :, lvl],
                                       h, w)
        w_l = weights[:, :, :, lvl].astype(jnp.float32)
        out = out + jnp.einsum('bqhpd,bqhp->bqhd', sampled, w_l)
    return out.reshape(b, qb, heads * dim)


def _msda_block_atlas(packed_levels, spatial_shapes, loc, weights):
    """One query-block over ALL levels with a single fused atlas gather.

    The per-(b, head, level) packed tables are concatenated into one flat
    atlas; each sample's row index carries its (b, head, level) base offset so
    the whole block costs ONE `jnp.take` (TPU gathers are launch/row-rate
    bound — one big gather beats 4 level gathers).
    """
    b, qb, heads, num_levels, p, _ = loc.shape
    dim = packed_levels[0].shape[-1] // 4

    level_rows = [pl.shape[2] for pl in packed_levels]
    atlas = jnp.concatenate(packed_levels, axis=2)  # [b, heads, R_tot, 4d]
    r_tot = atlas.shape[2]
    flat = atlas.reshape(b * heads * r_tot, 4 * dim)

    rows = []
    cws = []
    base = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        x = loc[..., lvl, :, 0].astype(jnp.float32) * w - 0.5  # [b,q,h,p]
        y = loc[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
        row = (jnp.clip(iy0 + 1, 0, h) * (w + 1) +
               jnp.clip(ix0 + 1, 0, w)) + base
        wx0 = 1.0 - wx1
        wy0 = 1.0 - wy1
        cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], -1)
        cw = cw * valid[..., None]
        # fold the attention weight into the corner weights
        cw = cw * weights[..., lvl, :, None].astype(jnp.float32)
        rows.append(row)
        cws.append(cw)
        base += (h + 1) * (w + 1)

    row = jnp.stack(rows, axis=3)          # [b, q, heads, L, p]
    cw = jnp.stack(cws, axis=3)            # [b, q, heads, L, p, 4]
    bh_off = (jax.lax.broadcasted_iota(jnp.int32, (b, heads), 0) * heads +
              jax.lax.broadcasted_iota(jnp.int32, (b, heads), 1)) * r_tot
    row = row + bh_off[:, None, :, None, None]

    # Lane-clean reduction: a reshape to [..., 4, dim] tile-pads the trailing
    # dim to 128 lanes (4x memory blowup). Instead keep rows as [M, 4*dim],
    # broadcast corner weights across each dim-block, and contract the
    # (level, point, corner) axes with a constant 0/1 selection matrix on the
    # MXU: out[m, d] = sum_{s, c} P[m, s*4dim + c*dim + d].
    m = b * qb * heads
    lp = num_levels * p
    g = jnp.take(flat, row.reshape(-1), axis=0, mode='clip')  # [M*lp, 4dim]
    cw_flat = cw.reshape(m * lp, 4)
    cw_rep = jnp.repeat(cw_flat, dim, axis=1)  # [M*lp, 4dim]
    pw = g.astype(jnp.float32) * cw_rep

    sel = np.zeros((lp * 4 * dim, dim), np.float32)
    for s in range(lp):
        for c in range(4):
            base2 = (s * 4 + c) * dim
            sel[base2:base2 + dim, :] = np.eye(dim)
    out = pw.reshape(m, lp * 4 * dim) @ jnp.asarray(sel)
    return out.reshape(b, qb, heads * dim)


def _fused_plan(spatial_shapes, packed16: bool = False):
    """Plan for the fused kernel: split levels whose packed f32 table
    exceeds the VMEM budget into packed-COLUMN chunks (each sample belongs
    to exactly one chunk; the others mask it via aw=0), then group chunks
    greedily under the budget.

    ``packed16`` halves the per-row footprint (row-pair uint32 tables —
    exact for bf16 values), typically collapsing the single-level BEV
    tables (TSA, future decoder) into one group instead of two column
    chunks.

    Returns a list of groups, each a list of entries ``(lvl, col_lo,
    col_hi)`` over packed columns ``[0, w]``; or None when infeasible (a
    single column exceeding the budget).
    """
    from vidar_tpu.ops.msda_pallas import DIM, TABLE_BUDGET_BYTES
    row_bytes = 4 * DIM * (2 if packed16 else 4)
    entries = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        total = (h + 1) * (w + 1) * row_bytes
        k = -(-total // TABLE_BUDGET_BYTES)
        if k > w + 1:
            return None
        edges = np.linspace(0, w + 1, k + 1).astype(int)
        for i in range(k):
            if edges[i + 1] > edges[i]:
                entries.append((lvl, int(edges[i]), int(edges[i + 1]) - 1))
    groups, cur, acc = [], [], 0
    for (lvl, a, bcol) in entries:
        h, _ = spatial_shapes[lvl]
        sz = (h + 1) * (bcol - a + 1) * row_bytes
        if cur and acc + sz > TABLE_BUDGET_BYTES:
            groups.append(cur)
            cur, acc = [], 0
        cur.append((lvl, a, bcol))
        acc += sz
    if cur:
        groups.append(cur)
    return groups


def _cw4_mats(s: int):
    """Signed 0/1 expansion matrices (+biases) building [.., 4S] corner
    weights (lane order s*4+corner) from ``wx1/wy1/aw`` [.., S] via three
    matmuls. A matmul's output is already lane-interleaved, so this
    sidesteps the stack/reshape granule-4 lane shuffle that XLA codegens
    ~10x off the bandwidth floor. Exact: single-nonzero columns, f32 at
    HIGHEST precision; ``-wy1 + 1 == 1 - wy1`` in f32."""
    l = np.arange(4 * s)
    src = l // 4
    corner = l % 4
    ex = np.zeros((s, 4 * s), np.float32)
    ey = np.zeros((s, 4 * s), np.float32)
    ea = np.zeros((s, 4 * s), np.float32)
    ex[src, l] = np.where(corner % 2 == 1, 1.0, -1.0)
    ey[src, l] = np.where(corner >= 2, 1.0, -1.0)
    ea[src, l] = 1.0
    bx = (corner % 2 == 0).astype(np.float32)
    by = (corner < 2).astype(np.float32)
    return ex, bx, ey, by, ea


def _cw4_from_fractions(wx1, wy1, aw):
    """[.., S] f32 fractions -> [.., 4S] corner weights, matching
    ``stack([wy0*wx0, wy0*wx1, wy1*wx0, wy1*wx1], -1) * aw`` bit-exactly
    (same multiplication order) without its lane-interleave shuffle."""
    ex, bx, ey, by, ea = (jnp.asarray(m) for m in _cw4_mats(wx1.shape[-1]))
    hi = jax.lax.Precision.HIGHEST
    wyp = jnp.matmul(wy1, ey, precision=hi) + by
    wxp = jnp.matmul(wx1, ex, precision=hi) + bx
    awp = jnp.matmul(aw, ea, precision=hi)
    return (wyp * wxp) * awp


def _entry_rows(spatial_shapes, entry):
    lvl, a, bcol = entry
    h, _ = spatial_shapes[lvl]
    return (h + 1) * (bcol - a + 1)


def _prep_group(packed_cache, spatial_shapes, loc, weights, entries,
                q_block):
    """Host-side layout prep for one fused-kernel invocation.

    packed_cache: lvl -> [B, H, h+1, w+1, 128] f32 packed corner table.
    Returns (atlas [C, R(+pad), 128], row_idx [C, Qp, S], wx1/wy1/aw
    [C, Qp, S] fractions + masked attention weight) with C = B*heads,
    S = len(entries) * points. Corner weights are expanded IN-KERNEL
    (msda_pallas._cw4_block) — materializing the [C, Qp, 4S] cw4 here was
    the largest prep term (~10 ms + ~800 MB HBM round-trip per SCA call).
    """
    b, q, heads = loc.shape[:3]
    tables, rows, wxs, wys, aws = [], [], [], [], []
    base = 0
    for (lvl, a, bcol) in entries:
        h, w = spatial_shapes[lvl]
        wc = bcol - a + 1
        pk = packed_cache[lvl][:, :, :, a:bcol + 1]
        tables.append(pk.reshape(b, heads, (h + 1) * wc, pk.shape[-1]))
        x = loc[..., lvl, :, 0].astype(jnp.float32) * w - 0.5  # [b,q,hd,p]
        y = loc[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
        xp = jnp.clip(ix0 + 1, 0, w)
        in_chunk = (xp >= a) & (xp <= bcol)
        row = (jnp.clip(iy0 + 1, 0, h) * wc +
               jnp.clip(xp - a, 0, wc - 1)) + base
        rows.append(row)
        wxs.append(x - x0)
        wys.append(y - y0)
        aws.append(weights[..., lvl, :].astype(jnp.float32) *
                   (valid & in_chunk).astype(jnp.float32))
        base += (h + 1) * wc

    # [b, q, heads, E, p] -> [b*heads, E*p, q] (sample-major: queries ride
    # the 128-lane dim — the query-major [C, Q, S] layout tile-padded S to
    # 128 lanes, 5-16x the useful HBM footprint per buffer)
    def to_cqs(xs):
        v = jnp.stack(xs, axis=3)
        return v.transpose(0, 2, 3, 4, 1).reshape(b * heads, -1, q)

    row_idx = to_cqs(rows)
    wx1 = to_cqs(wxs)
    wy1 = to_cqs(wys)
    aw = to_cqs(aws)

    pad = (-q) % q_block
    if pad:
        row_idx = jnp.pad(row_idx, ((0, 0), (0, 0), (0, pad)))
        wx1 = jnp.pad(wx1, ((0, 0), (0, 0), (0, pad)))
        wy1 = jnp.pad(wy1, ((0, 0), (0, 0), (0, pad)))
        aw = jnp.pad(aw, ((0, 0), (0, 0), (0, pad)))
    atlas = jnp.concatenate(tables, axis=2)
    atlas = atlas.reshape(b * heads, atlas.shape[2], atlas.shape[-1])
    # pad table rows to a sublane multiple: a partial-tile HBM->VMEM DMA
    # of an odd-row table faults the TPU worker
    rpad = (-atlas.shape[1]) % 8
    if rpad:
        atlas = jnp.pad(atlas, ((0, 0), (0, rpad), (0, 0)))
    return atlas, row_idx, wx1, wy1, aw


def _prep_group_fwd(tables, table_rows, spatial_shapes, loc, weights,
                    entries, q_block):
    """Forward-only layout prep for one fused-kernel invocation.

    ``tables``: lvl -> [C, P, 128] kernel-ready (row-padded, possibly
    row-pair-packed u32) WHOLE-level table; ``table_rows``: lvl -> the
    UNPACKED row count the row indices address. A single-entry group
    aliases its table with zero copies; multi-entry groups concatenate
    the pre-padded tables (no extra pad pass — the old path re-padded the
    ~0.6 GB SCA atlas per call).

    Returns (atlas [C, R, 128], row_idx [C, S, Qp], wx1/wy1/aw [C, S, Qp]
    — the q-padded SAMPLE-MAJOR fractions both the forward (in-kernel
    corner-weight expansion) and backward kernels consume; queries on the
    128-lane dim so the buffers are tile-pad-free).
    """
    b, q, heads = loc.shape[:3]
    rows, aws, wxs, wys = [], [], [], []
    base = 0
    for (lvl, a, bcol) in entries:
        h, w = spatial_shapes[lvl]
        assert (a, bcol) == (0, w)
        x = loc[..., lvl, :, 0].astype(jnp.float32) * w - 0.5  # [b,q,hd,p]
        y = loc[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
        row = (jnp.clip(iy0 + 1, 0, h) * (w + 1) +
               jnp.clip(ix0 + 1, 0, w)) + base
        rows.append(row)
        wxs.append(x - x0)
        wys.append(y - y0)
        aws.append(weights[..., lvl, :].astype(jnp.float32) *
                   valid.astype(jnp.float32))
        base += table_rows[lvl]

    def to_cqs(xs):
        v = jnp.stack(xs, axis=3)
        return v.transpose(0, 2, 3, 4, 1).reshape(b * heads, -1, q)

    row_idx = to_cqs(rows).astype(jnp.int32)
    wx1 = to_cqs(wxs)
    wy1 = to_cqs(wys)
    aw = to_cqs(aws)
    pad = (-q) % q_block
    if pad:
        row_idx = jnp.pad(row_idx, ((0, 0), (0, 0), (0, pad)))
        wx1 = jnp.pad(wx1, ((0, 0), (0, 0), (0, pad)))
        wy1 = jnp.pad(wy1, ((0, 0), (0, 0), (0, pad)))
        aw = jnp.pad(aw, ((0, 0), (0, 0), (0, pad)))
    lvls = [e[0] for e in entries]
    atlas = (tables[lvls[0]] if len(lvls) == 1
             else jnp.concatenate([tables[lv] for lv in lvls], axis=1))
    return atlas, row_idx, wx1, wy1, aw


def pack_raw_levels(value, spatial_shapes):
    """Frame-constant raw corner pack for the table-hoisted fused path.

    The packed-corner tables of ``_msda_fused_fwd_impl`` are rebuilt per
    attention call even though (for spatial cross-attention) the underlying
    camera features are identical across all encoder layers of a frame —
    only the per-layer ``value_proj`` differs. Corner packing is a pure
    data movement, so it commutes with the (linear) projection: pack the
    RAW features once per frame here, and fold each layer's projection into
    the packed rows with ``tables_from_packed_raw``.

    Args:
      value: [B, V, C] pre-``value_proj`` features (levels concatenated).
    Returns:
      tuple over levels of [B, (h+1)*(w+1), 4*(C+1)] packed corners with a
      trailing interior-indicator channel (1 where the corner hits a real
      pixel, 0 on the zero ring) so the projection bias can be masked off
      the ring downstream.
    """
    b, v_len, c = value.shape
    ones = jnp.ones((b, v_len, 1), value.dtype)
    aug = jnp.concatenate([value, ones], axis=-1)[:, :, None, :]
    out = []
    for vl, (h, w) in zip(_split_levels(aug, spatial_shapes), spatial_shapes):
        pk = _pack_corners(vl, h, w)  # [B, 1, rows, 4*(C+1)]
        pk = pk.reshape(b, (h + 1) * (w + 1), 4 * (c + 1))
        # pad rows to the kernel's sublane multiple HERE (frame-constant)
        # so the per-layer fold output needs no pad pass
        rpad = (-pk.shape[1]) % 8
        if rpad:
            pk = jnp.pad(pk, ((0, 0), (0, rpad), (0, 0)))
        out.append(pk)
    return tuple(out)


def tables_from_packed_raw(packed_raw, kernel, bias, heads,
                           round_dtype=None):
    """Kernel-ready fused-msda tables from a frame-constant raw pack.

    Folds a ``value_proj`` (kernel [C, heads*DIM], bias [heads*DIM]) into
    the packed-raw corners (``pack_raw_levels``) as ONE matmul per level
    with a block-diagonal weight: output lanes are already per-head
    ``corner*DIM + d`` granules, so no small-granule lane shuffle remains
    (the per-layer re-pack this replaces measured ~10x the bandwidth
    floor). The interior-indicator channel carries the bias so zero-ring
    corners stay exactly zero.

    Returns (tables: tuple over levels of [B, rows8, heads*128] f32 —
    the fold matmul's natural layout, consumed directly by the kernel's
    lane-slice DMA — and table_rows: tuple of padded row counts) matching
    the ``_prep_group_fwd`` contract.
    """
    cin = kernel.shape[0]
    assert kernel.shape[1] == heads * DIM_TABLE and bias.shape == (
        heads * DIM_TABLE,)
    wk = kernel.reshape(cin, heads, DIM_TABLE)
    wb = bias.reshape(heads, DIM_TABLE)
    blocks = []
    for corner in range(4):
        blk = jnp.zeros((cin + 1, heads, 4, DIM_TABLE), kernel.dtype)
        blk = blk.at[:cin, :, corner, :].set(wk)
        blk = blk.at[cin, :, corner, :].set(wb)
        blocks.append(blk)
    w2 = jnp.concatenate(blocks, 0).reshape(4 * (cin + 1),
                                            heads * 4 * DIM_TABLE)
    # bf16 inputs are exact on the MXU at DEFAULT; f32 inputs need HIGHEST
    # (DEFAULT truncates f32 operands to bf16).
    prec = (None if packed_raw[0].dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    tables, table_rows = [], []
    for pr in packed_raw:
        b, rows, _ = pr.shape
        assert rows % 8 == 0, 'pack_raw_levels pads rows to 8'
        out = jnp.dot(pr, w2.astype(pr.dtype), precision=prec,
                      preferred_element_type=jnp.float32)
        if round_dtype is not None and round_dtype != jnp.float32:
            # match the reference path's Dense(dtype=bf16) output rounding
            out = out.astype(round_dtype)
        out = out.astype(jnp.float32)
        # keep the dot's NATURAL layout [B, rows, heads*4*DIM] untouched:
        # the fused kernel DMAs a 128-aligned per-(b, head) LANE slice, so
        # neither a head-major transpose (round 3) nor the 4D-reshape
        # relayout copy XLA inserted at the pallas boundary (round 4
        # trace copy.1714, ~580 MB x2 per layer for level 0) remains.
        tables.append(out)
        table_rows.append(rows)
    return tuple(tables), tuple(table_rows)


def fused_tables_feasible(spatial_shapes, head_dim) -> bool:
    """True when the table-hoisted fused path can take these shapes:
    head dim 32 and an f32 plan with only whole-level entries."""
    if head_dim != DIM_TABLE:
        return False
    groups = _fused_plan(spatial_shapes, packed16=False)
    return groups is not None and all(
        e[1] == 0 and e[2] == spatial_shapes[e[0]][1]
        for g in groups for e in g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _msda_tables(spatial_shapes, table_rows, tables, loc, weights):
    """Fused deformable attention over PREBUILT kernel-ready tables.

    Differentiable: backward runs the same two Pallas passes as
    ``_msda_fused_bwd`` but returns the table gradient directly (the
    caller's table-build matmul and raw pack are plain XLA ops that
    autodiff handles)."""
    return _msda_tables_fwd_impl(spatial_shapes, table_rows, tables, loc,
                                 weights)


def _msda_tables_fwd_impl(spatial_shapes, table_rows, tables, loc, weights,
                          q_block=256):
    from vidar_tpu.ops.msda_pallas import msda_gather_fused
    b, q, heads = loc.shape[:3]
    groups = _fused_plan(spatial_shapes, packed16=False)
    interpret = jax.default_backend() == 'cpu'
    out = None
    for entries in groups:
        atlas, row_idx, wx1, wy1, aw = _prep_group_fwd(
            tables, table_rows, spatial_shapes, loc, weights, entries,
            q_block)
        part = msda_gather_fused(atlas, row_idx, wx1, wy1, aw,
                                 q_block=q_block, interpret=interpret)
        out = part if out is None else out + part
    dim = out.shape[1]
    out = out[:, :, :q].reshape(b, heads, dim, q).transpose(0, 3, 1, 2)
    return out.reshape(b, q, heads * dim)


def _msda_tables_fwd(spatial_shapes, table_rows, tables, loc, weights):
    return _msda_tables(spatial_shapes, table_rows, tables, loc, weights), (
        tables, loc, weights)


def _msda_tables_bwd(spatial_shapes, table_rows, res, g):
    from vidar_tpu.ops.msda_pallas import msda_gather_fused_bwd
    tables, loc, weights = res
    b, q, heads, num_levels, p, _ = loc.shape
    dim = DIM_TABLE
    q_block = 256
    qp = q + ((-q) % q_block)
    groups = _fused_plan(spatial_shapes, packed16=False)
    interpret = jax.default_backend() == 'cpu'

    dout = g.reshape(b, q, heads, dim).transpose(0, 2, 3, 1).reshape(
        b * heads, dim, q).astype(jnp.float32)
    if qp != q:
        dout = jnp.pad(dout, ((0, 0), (0, 0), (0, qp - q)))

    dtab = [jnp.zeros(t.shape, jnp.float32) for t in tables]
    zeros_q = jnp.zeros((b, q, heads, p), jnp.float32)
    dwx_l = [zeros_q] * num_levels
    dwy_l = [zeros_q] * num_levels
    daw_l = [zeros_q] * num_levels

    for entries in groups:
        atlas, row_idx, wx1, wy1, aw = _prep_group_fwd(
            tables, table_rows, spatial_shapes, loc, weights, entries,
            q_block)
        datlas, dwx, dwy, daw = msda_gather_fused_bwd(
            atlas, row_idx, wx1, wy1, aw, dout,
            q_block=q_block, interpret=interpret)

        ecount = len(entries)

        def to_bqhep(x, ecount=ecount):
            return x[:, :, :q].reshape(b, heads, ecount, p, q).transpose(
                0, 4, 1, 2, 3)

        dwx = to_bqhep(dwx)
        dwy = to_bqhep(dwy)
        daw = to_bqhep(daw)

        start = 0
        for i, (lvl, a, bcol) in enumerate(entries):
            rows_l = table_rows[lvl]
            # datlas is flat [B*H, rows, 128]; tables are head-folded
            # [B, rows, H*128] (transpose only here, on the train path)
            dt = datlas[:, start:start + rows_l].reshape(
                b, heads, rows_l, 4 * dim).transpose(0, 2, 1, 3).reshape(
                b, rows_l, heads * 4 * dim)
            dtab[lvl] = dtab[lvl] + dt
            start += rows_l
            # whole-level entries: no column-chunk masking needed
            dwx_l[lvl] = dwx_l[lvl] + dwx[:, :, :, i]
            dwy_l[lvl] = dwy_l[lvl] + dwy[:, :, :, i]
            daw_l[lvl] = daw_l[lvl] + daw[:, :, :, i]

    dloc_parts, dw_parts = [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        dloc_parts.append(jnp.stack(
            [dwx_l[lvl] * w, dwy_l[lvl] * h], axis=-1))
        x = loc[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = loc[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        ix0 = jnp.floor(x).astype(jnp.int32)
        iy0 = jnp.floor(y).astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) &
                 (ix0 >= -1) & (ix0 <= w - 1))
        dw_parts.append(daw_l[lvl] * valid.astype(jnp.float32))

    dloc = jnp.stack(dloc_parts, axis=3).astype(loc.dtype)
    dweights = jnp.stack(dw_parts, axis=3).astype(weights.dtype)
    return tuple(dtab), dloc, dweights


_msda_tables.defvjp(_msda_tables_fwd, _msda_tables_bwd)


def msdeform_attn_tables(tables, table_rows, spatial_shapes,
                         sampling_locations, attention_weights):
    """Multi-scale deformable attention over prebuilt kernel-ready tables
    (``tables_from_packed_raw``). Same semantics as ``msdeform_attn`` with
    the value/pack work hoisted out; feasibility must be pre-checked with
    ``fused_tables_feasible``."""
    return _msda_tables(tuple(spatial_shapes), tuple(table_rows), tuple(
        tables), sampling_locations, attention_weights)


def _packed_cache(value_levels, spatial_shapes, needed_lvls,
                  dtype=jnp.float32):
    """lvl -> [B, H, h+1, w+1, 4d] packed corner tables.

    ``dtype=bfloat16`` packs at half the HBM traffic — used by the fused16
    forward, whose u32 row-pair tables are built from bf16 bit patterns
    anyway (the f32 detour costs a full extra pass over the ~0.8 GB SCA
    atlas per call)."""
    cache = {}
    for lvl in needed_lvls:
        h, w = spatial_shapes[lvl]
        b, _, heads, dim = value_levels[lvl].shape
        pk = _pack_corners(value_levels[lvl], h, w, out_dtype=dtype)
        cache[lvl] = pk.reshape(b, heads, h + 1, w + 1, 4 * dim)
    return cache


def _msda_fused_fwd_impl(value_levels, spatial_shapes, loc, weights,
                         q_block=None):
    """Fused-kernel forward: one invocation per VMEM-sized table group,
    partial outputs summed. Mosaic can't row-slice bf16 tiles dynamically,
    so tables are 32-bit (see msda_pallas module docstring) — f32 for f32
    values, row-pair-packed uint32 (half the VMEM/DMA, exact) for bf16
    values; grouping keeps each table resident."""
    from vidar_tpu.ops.msda_pallas import (msda_gather_fused,
                                           msda_gather_fused16, pack_atlas16)
    b, q, heads = loc.shape[:3]
    if q_block is None:
        # small-S calls (TSA/decoder: levels*points <= 8) amortize the
        # per-grid-step fixed cost over bigger query blocks (measured
        # 16.5 -> 15.4 ms on the TSA shape at 1024)
        s_total = loc.shape[3] * loc.shape[4]
        q_block = 1024 if (s_total <= 8 and q >= 4096) else 256
    # Table dtype choice (measured v5e, SCA shapes: f32 47 ms vs u16 69 ms
    # for the same single-group row work — the per-row u16 unpack costs
    # ~0.9 cyc/row): prefer f32 tables UNLESS the f32 plan would
    # column-split a level. Column chunks duplicate the full q x points row
    # work of that level per chunk (every chunk processes all queries with
    # off-chunk samples masked), which is far worse than the unpack — the
    # u16 half-size tables typically keep such levels whole (TSA/decoder
    # 200x200 BEV tables).
    packed16 = False
    if value_levels[0].dtype == jnp.bfloat16:
        plan32 = _fused_plan(spatial_shapes, packed16=False)
        n_entries32 = None if plan32 is None else sum(len(g) for g in plan32)
        if plan32 is None or n_entries32 > len(spatial_shapes):
            packed16 = True
    groups = _fused_plan(spatial_shapes, packed16=packed16)
    assert groups is not None  # caller checked
    interpret = jax.default_backend() == 'cpu'
    needed = {e[0] for g in groups for e in g}
    whole = all(e[1] == 0 and e[2] == spatial_shapes[e[0]][1]
                for g in groups for e in g)

    out = None
    if whole:
        # fast path (every production shape): per-level kernel-ready
        # tables built once — row-padded at pack time and (for bf16)
        # row-pair-packed — so single-entry groups alias with zero copies.
        cache = _packed_cache(
            value_levels, spatial_shapes, needed,
            dtype=jnp.bfloat16 if packed16 else jnp.float32)
        tables, table_rows = {}, {}
        for lvl in needed:
            h, w = spatial_shapes[lvl]
            pk = cache[lvl].reshape(b * heads, (h + 1) * (w + 1), -1)
            rpad = (-pk.shape[1]) % 8
            if rpad:
                pk = jnp.pad(pk, ((0, 0), (0, rpad), (0, 0)))
            if packed16:
                pk = pack_atlas16(pk)
                table_rows[lvl] = 2 * pk.shape[1]
            else:
                table_rows[lvl] = pk.shape[1]
            tables[lvl] = pk
        kern = msda_gather_fused16 if packed16 else msda_gather_fused
        for entries in groups:
            atlas, row_idx, wx1, wy1, aw = _prep_group_fwd(
                tables, table_rows, spatial_shapes, loc, weights, entries,
                q_block)
            part = kern(atlas, row_idx, wx1, wy1, aw, q_block=q_block,
                        interpret=interpret)
            out = part if out is None else out + part
    else:
        cache = _packed_cache(
            value_levels, spatial_shapes, needed,
            dtype=jnp.bfloat16 if packed16 else jnp.float32)
        for entries in groups:
            atlas, row_idx, wx1, wy1, aw = _prep_group(
                cache, spatial_shapes, loc, weights, entries, q_block)
            if packed16:
                part = msda_gather_fused16(pack_atlas16(atlas), row_idx,
                                           wx1, wy1, aw, q_block=q_block,
                                           interpret=interpret)
            else:
                part = msda_gather_fused(atlas, row_idx, wx1, wy1, aw,
                                         q_block=q_block,
                                         interpret=interpret)
            out = part if out is None else out + part
    dim = out.shape[1]
    out = out[:, :, :q].reshape(b, heads, dim, q).transpose(0, 3, 1, 2)
    return out.reshape(b, q, heads * dim)


def _msda_block(value_levels, spatial_shapes, loc, weights):
    """One query-block of deformable attention. loc: [B, Qb, H, L, P, 2]."""
    b, qb, heads, num_levels, p, _ = loc.shape
    dim = value_levels[0].shape[-1]
    out = jnp.zeros((b, qb, heads, dim), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        sampled = _level_sample(value_levels[lvl], loc[:, :, :, lvl], h, w)
        w_l = weights[:, :, :, lvl].astype(jnp.float32)
        out = out + jnp.einsum('bqhpd,bqhp->bqhd', sampled, w_l)
    return out.reshape(b, qb, heads * dim)


def _split_levels(value, spatial_shapes):
    value_levels = []
    start = 0
    for (h, w) in spatial_shapes:
        value_levels.append(
            jax.lax.slice_in_dim(value, start, start + h * w, axis=1))
        start += h * w
    return value_levels


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_fused(spatial_shapes, value, loc, weights):
    """Pallas-fwd deformable attention; backward recomputes via the packed
    XLA formulation (the fwd gather never materializes residuals)."""
    return _msda_fused_fwd_impl(_split_levels(value, spatial_shapes),
                                spatial_shapes, loc, weights)


def _msda_fused_fwd(spatial_shapes, value, loc, weights):
    return _msda_fused(spatial_shapes, value, loc, weights), (
        value, loc, weights)


def _unpack_corners_adjoint(dpacked, h, w, b, heads, dim, out_dtype):
    """Adjoint of ``_pack_corners``: [B, H, (h+1)(w+1), 4d] -> value grads
    [B, (h*w), H, d]."""
    dp = dpacked.reshape(b * heads, h + 1, w + 1, 4 * dim)
    dvp = jnp.zeros((b * heads, h + 2, w + 2, dim), jnp.float32)
    dvp = dvp.at[:, :-1, :-1].add(dp[..., :dim])
    dvp = dvp.at[:, :-1, 1:].add(dp[..., dim:2 * dim])
    dvp = dvp.at[:, 1:, :-1].add(dp[..., 2 * dim:3 * dim])
    dvp = dvp.at[:, 1:, 1:].add(dp[..., 3 * dim:])
    dv = dvp[:, 1:-1, 1:-1].reshape(b, heads, h * w, dim)
    return dv.transpose(0, 2, 1, 3).astype(out_dtype)


def _msda_fused_bwd(spatial_shapes, res, g):
    """Pallas backward: pass 1 (weight/fraction grads) + pass 2 (table
    scatter), then host-side adjoints back to (value, loc, weights).

    Entries of a split level partition the samples (aw masks the rest), so
    per-level grads are sums of their entries' contributions.
    """
    from vidar_tpu.ops.msda_pallas import msda_gather_fused_bwd
    value, loc, weights = res
    b, q, heads, num_levels, p, _ = loc.shape
    dim = value.shape[-1]
    q_block = 256
    qp = q + ((-q) % q_block)
    groups = _fused_plan(spatial_shapes)
    interpret = jax.default_backend() == 'cpu'
    value_levels = _split_levels(value, spatial_shapes)
    cache = _packed_cache(value_levels, spatial_shapes,
                          {e[0] for gr in groups for e in gr})

    dout = g.reshape(b, q, heads, dim).transpose(0, 2, 3, 1).reshape(
        b * heads, dim, q).astype(jnp.float32)
    if qp != q:
        dout = jnp.pad(dout, ((0, 0), (0, 0), (0, qp - q)))

    # accumulators: packed-table grads per level, per-level dwx/dwy/daw
    dpk = {lvl: jnp.zeros(cache[lvl].shape, jnp.float32) for lvl in cache}
    zeros_q = jnp.zeros((b, q, heads, p), jnp.float32)
    dwx_l = [zeros_q] * num_levels
    dwy_l = [zeros_q] * num_levels
    daw_l = [zeros_q] * num_levels

    for entries in groups:
        atlas, row_idx, wx1, wy1, aw = _prep_group(
            cache, spatial_shapes, loc, weights, entries, q_block)
        datlas, dwx, dwy, daw = msda_gather_fused_bwd(
            atlas, row_idx, wx1, wy1, aw, dout,
            q_block=q_block, interpret=interpret)

        ecount = len(entries)
        # [C, E*p, Qp] -> [b, q, heads, E, p]
        def to_bqhep(x, ecount=ecount):
            return x[:, :, :q].reshape(b, heads, ecount, p, q).transpose(
                0, 4, 1, 2, 3)

        dwx = to_bqhep(dwx)
        dwy = to_bqhep(dwy)
        daw = to_bqhep(daw)

        start = 0
        for i, (lvl, a, bcol) in enumerate(entries):
            h, w = spatial_shapes[lvl]
            wc = bcol - a + 1
            rows_e = (h + 1) * wc
            de = datlas[:, start:start + rows_e].reshape(
                b, heads, h + 1, wc, 4 * dim)
            dpk[lvl] = dpk[lvl].at[:, :, :, a:bcol + 1].add(de)
            start += rows_e
            # dwx/dwy carry the aw factor (zero off-chunk); daw does NOT —
            # mask it to this entry's chunk (aw_e = weights*valid*in_chunk)
            ix0 = jnp.floor(loc[..., lvl, :, 0].astype(jnp.float32) * w
                            - 0.5).astype(jnp.int32)
            xp = jnp.clip(ix0 + 1, 0, w)
            in_chunk = ((xp >= a) & (xp <= bcol)).astype(jnp.float32)
            dwx_l[lvl] = dwx_l[lvl] + dwx[:, :, :, i]
            dwy_l[lvl] = dwy_l[lvl] + dwy[:, :, :, i]
            daw_l[lvl] = daw_l[lvl] + daw[:, :, :, i] * in_chunk

    dval_levels, dloc_parts, dw_parts = [], [], []
    for lvl, (h, w) in enumerate(spatial_shapes):
        dval_levels.append(_unpack_corners_adjoint(
            dpk[lvl].reshape(b, heads, (h + 1) * (w + 1), 4 * dim),
            h, w, b, heads, dim, value.dtype))
        dloc_parts.append(jnp.stack(
            [dwx_l[lvl] * w, dwy_l[lvl] * h], axis=-1))
        # aw folded the validity mask; recompute it for the weight chain
        x = loc[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = loc[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        ix0 = jnp.floor(x).astype(jnp.int32)
        iy0 = jnp.floor(y).astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) &
                 (ix0 >= -1) & (ix0 <= w - 1))
        dw_parts.append(daw_l[lvl] * valid.astype(jnp.float32))

    dvalue = jnp.concatenate(dval_levels, axis=1)
    dloc = jnp.stack(dloc_parts, axis=3).astype(loc.dtype)
    dweights = jnp.stack(dw_parts, axis=3).astype(weights.dtype)
    return dvalue, dloc, dweights


_msda_fused.defvjp(_msda_fused_fwd, _msda_fused_bwd)


def msdeform_attn(value: jnp.ndarray,
                  spatial_shapes: Sequence[Tuple[int, int]],
                  sampling_locations: jnp.ndarray,
                  attention_weights: jnp.ndarray,
                  query_chunk: int = 1024,
                  impl: str = 'auto') -> jnp.ndarray:
    """Multi-scale deformable attention.

    Args:
      value: [B, V, heads, dim] flattened multi-level per-head values, levels
        concatenated along V in the order of ``spatial_shapes``.
      spatial_shapes: static python sequence of (h, w) per level.
      sampling_locations: [B, Q, heads, L, P, 2] in [0, 1].
      attention_weights: [B, Q, heads, L, P] (already softmaxed over L*P).
      query_chunk: queries processed per scan step — bounds the gather
        temporaries (the gather materialises [B, chunk, H, P, {4}dim]).
      impl: 'auto' (default; 'fused' on accelerators, 'packed' on the CPU
        backend where the Pallas kernel would run interpreted),
        'packed' (4 bilinear corners pre-packed into one row —
        4x fewer gather rows, the TPU gather bound), 'atlas' (one flat take
        over all levels), 'plain' (4 separate corner gathers, lower memory),
        or 'fused' (Pallas kernel: per-(batch, head) tables VMEM-resident,
        gather + weighted reduce fused — fastest at production shapes;
        requires dim=32, falls back to 'packed' otherwise; backward
        recomputes through the packed path).

    Returns:
      [B, Q, heads * dim] fp32.
    """
    b, v_len, heads, dim = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    assert sampling_locations.shape[3] == num_levels
    assert sum(h * w for h, w in spatial_shapes) == v_len

    auto = impl == 'auto'
    if auto:
        impl = 'packed' if jax.default_backend() == 'cpu' else 'fused'
    if impl == 'fused':
        feasible = dim == 32 and _fused_plan(
            spatial_shapes,
            packed16=value.dtype == jnp.bfloat16) is not None
        # Small-S calls ride the kernel too: an earlier measurement (86 ms
        # fused vs 57 ms atlas at TSA's L*P=4) hit a pathological
        # small-sample grid mode since fixed — re-measured 16 ms fused vs
        # 57 ms atlas at the same shape (tools: benchmarks/msda_bench.py).
        if feasible:
            return _msda_fused(tuple(spatial_shapes), value,
                               sampling_locations, attention_weights)
        impl = ('packed' if jax.default_backend() == 'cpu' else 'atlas')

    value_levels = _split_levels(value, spatial_shapes)

    if impl in ('packed', 'atlas'):
        block = (_msda_block_packed if impl == 'packed'
                 else _msda_block_atlas)
        packed_levels = [
            _pack_corners(v_l, h, w)
            for v_l, (h, w) in zip(value_levels, spatial_shapes)]
        if q <= query_chunk:
            return block(packed_levels, spatial_shapes,
                         sampling_locations, attention_weights)
        return _scan_query_chunks(
            lambda l_c, w_c: block(packed_levels, spatial_shapes, l_c, w_c),
            sampling_locations, attention_weights, heads * dim, query_chunk)

    if q <= query_chunk:
        return _msda_block(value_levels, spatial_shapes, sampling_locations,
                           attention_weights)

    return _scan_query_chunks(
        lambda l_c, w_c: _msda_block(value_levels, spatial_shapes, l_c, w_c),
        sampling_locations, attention_weights, heads * dim, query_chunk)


def _scan_query_chunks(block_fn, sampling_locations, attention_weights,
                       out_dim: int, query_chunk: int):
    """Pad Q to a multiple of the chunk and scan block_fn over chunks.

    The block is checkpointed: without it the scan stacks every chunk's
    gathered corners as backward residuals (observed 15 GB at SCA shapes);
    re-gathering in the backward pass is far cheaper than storing it.
    """
    block_fn = jax.checkpoint(block_fn)
    b, q, heads, num_levels = sampling_locations.shape[:4]
    num_chunks = (q + query_chunk - 1) // query_chunk
    pad = num_chunks * query_chunk - q
    loc = jnp.pad(sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0),
                                       (0, 0), (0, 0)))
    wts = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0),
                                      (0, 0)))
    loc = loc.reshape(b, num_chunks, query_chunk, heads, num_levels, -1, 2)
    wts = wts.reshape(b, num_chunks, query_chunk, heads, num_levels, -1)
    loc = jnp.moveaxis(loc, 1, 0)
    wts = jnp.moveaxis(wts, 1, 0)

    def body(_, xs):
        loc_c, w_c = xs
        return None, block_fn(loc_c, w_c)

    _, chunks = jax.lax.scan(body, None, (loc, wts))
    out = jnp.moveaxis(chunks, 0, 1).reshape(b, num_chunks * query_chunk,
                                             out_dim)
    return out[:, :q]
