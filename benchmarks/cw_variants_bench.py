"""msda fused-kernel design-space bench (SCA shape, in-jit loop timing).

Variants of the corner-weight expansion and the sample/corner fold:
  weights: 'cw4'   — host-precomputed [C,Q,4S] corner weights (round-2 kernel)
           'tile'  — fractions in, per-tile cw_full via 3 small matmuls + the
                     per-chunk [qt,4sc]@[4sc,sc*128] expand (working tree)
           'wide'  — fractions in, per-chunk THREE [qt,sc]@[sc,sc*128] signed
                     0/1 expands multiplied elementwise (no cw4 stage at all)
  fold:    'seq'   — 4*sc sequential 32-lane adds (round-2 kernel)
           'tree'  — log2 halving adds at full width, then corner fold
  qt: 8 / 16

Timed by running the kernel ITERS times inside one jit with a data
dependency between iterations (the tunnel's ~30 ms dispatch+readback makes
single-call timing noise exceed the effects under test).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

DIM = 32
SC = 8
_HI = jax.lax.Precision.HIGHEST


def _chunks(s):
    return [(s0, min(SC, s - s0)) for s0 in range(0, s, SC)]


def _expand_mat(sc):
    src = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * DIM), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (4 * sc, sc * 4 * DIM), 1)
    return (dst // DIM == src).astype(jnp.float32)


def _cw4_chunk_mats(sc):
    l = jax.lax.broadcasted_iota(jnp.int32, (sc, 4 * sc), 1)
    src = jax.lax.broadcasted_iota(jnp.int32, (sc, 4 * sc), 0)
    corner = l % 4
    hit = (l // 4 == src).astype(jnp.float32)
    ex = hit * jnp.where(corner % 2 == 1, 1.0, -1.0)
    ey = hit * jnp.where(corner >= 2, 1.0, -1.0)
    ea = hit
    lb = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * sc), 1)
    bx = (lb % 4 % 2 == 0).astype(jnp.float32)
    by = (lb % 4 < 2).astype(jnp.float32)
    return ex, bx, ey, by, ea


def _cw4_tile(wx, wy, aw, mats):
    ex, bx, ey, by, ea = mats
    dn = (((1,), (0,)), ((), ()))
    wyp = jax.lax.dot_general(wy, ey, dimension_numbers=dn,
                              preferred_element_type=jnp.float32,
                              precision=_HI) + by
    wxp = jax.lax.dot_general(wx, ex, dimension_numbers=dn,
                              preferred_element_type=jnp.float32,
                              precision=_HI) + bx
    awp = jax.lax.dot_general(aw, ea, dimension_numbers=dn,
                              preferred_element_type=jnp.float32,
                              precision=_HI)
    return (wyp * wxp) * awp


def _wide_mats(sc):
    """[sc, sc*128] signed expansions + [1, sc*128] biases: lane l belongs to
    sample l//128, corner (l%128)//DIM."""
    src = jax.lax.broadcasted_iota(jnp.int32, (sc, sc * 4 * DIM), 0)
    dst = jax.lax.broadcasted_iota(jnp.int32, (sc, sc * 4 * DIM), 1)
    corner = (dst % (4 * DIM)) // DIM
    hit = (dst // (4 * DIM) == src).astype(jnp.float32)
    ex = hit * jnp.where(corner % 2 == 1, 1.0, -1.0)
    ey = hit * jnp.where(corner >= 2, 1.0, -1.0)
    ea = hit
    lb = jax.lax.broadcasted_iota(jnp.int32, (1, sc * 4 * DIM), 1)
    cb = (lb % (4 * DIM)) // DIM
    bx = (cb % 2 == 0).astype(jnp.float32)
    by = (cb < 2).astype(jnp.float32)
    return ex, bx, ey, by, ea


def _gather_chunk(table, idx_ref, q0, s0, sc, qt):
    qrows = []
    for j in range(qt):
        samples = [table[pl.ds(idx_ref[0, q0 + j, s0 + k], 1), :]
                   for k in range(sc)]
        qrows.append(samples[0] if sc == 1
                     else jnp.concatenate(samples, axis=1))
    return jnp.concatenate(qrows, axis=0)


def _seg_fold(p, sc):
    """[qt, sc*128] -> [qt, 128]: sum the sc sample segments at full width."""
    if sc & (sc - 1):  # not a power of two: sequential segment adds
        acc = p[:, :4 * DIM]
        for k in range(1, sc):
            acc = acc + p[:, k * 4 * DIM:(k + 1) * 4 * DIM]
        return acc
    w = sc * 4 * DIM
    while w > 4 * DIM:
        w //= 2
        p = p[:, :w] + p[:, w:2 * w]
    return p


def _fold(p, sc, tree):
    if tree:
        w = sc * 4 * DIM
        while w > 4 * DIM:
            w //= 2
            p = p[:, :w] + p[:, w:2 * w]
        p = p[:, :2 * DIM] + p[:, 2 * DIM:]
        return p[:, :DIM] + p[:, DIM:]
    acc = jnp.zeros((p.shape[0], DIM), jnp.float32)
    for b in range(4 * sc):
        acc = acc + p[:, b * DIM:(b + 1) * DIM]
    return acc


def _kernel(qt, weights, tree, idx_ref, w0_ref, w1_ref, w2_ref, atlas_ref,
            out_ref, table, cwbuf, sem):
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = w0_ref.shape[2] // 4 if weights == 'cw4' else w0_ref.shape[2]
    q_blk = out_ref.shape[1]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    emats = {sc: _expand_mat(sc) for _, sc in _chunks(s)}
    cmats = _cw4_chunk_mats(s)
    wmats = {sc: _wide_mats(sc) for _, sc in _chunks(s)}
    dn = (((1,), (0,)), ((), ()))

    if weights == 'blk':
        # corner weights for the WHOLE q-block up front: 3 matmuls of
        # [q_blk, s] @ [s, 4s] once per grid step (vs 16x smaller per tile),
        # staged via VMEM scratch (Mosaic can't dynamic-slice registers)
        cwbuf[:] = _cw4_tile(w0_ref[0, :, :], w1_ref[0, :, :],
                             w2_ref[0, :, :], cmats)

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        if tree == 'acc':
            # full-width accumulator: corners fold ONCE per tile (3 adds)
            # instead of 4 narrow adds per sample
            acc = jnp.zeros((qt, 4 * DIM), jnp.float32)
        else:
            acc = jnp.zeros((qt, DIM), jnp.float32)
        if weights == 'tile':
            cw_full = _cw4_tile(w0_ref[0, pl.ds(q0, qt), :],
                                w1_ref[0, pl.ds(q0, qt), :],
                                w2_ref[0, pl.ds(q0, qt), :], cmats)
        elif weights == 'blk':
            cw_full = cwbuf[pl.ds(q0, qt), :]
        for (s0, sc) in _chunks(s):
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            if weights == 'cw4':
                cw = w0_ref[0, pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
                w_rep = jax.lax.dot_general(
                    cw, emats[sc], dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI)
            elif weights in ('tile', 'blk'):
                cw = cw_full[:, 4 * s0:4 * (s0 + sc)]
                w_rep = jax.lax.dot_general(
                    cw, emats[sc], dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI)
            else:  # wide
                ex, bx, ey, by, ea = wmats[sc]
                wx = w0_ref[0, pl.ds(q0, qt), s0:s0 + sc]
                wy = w1_ref[0, pl.ds(q0, qt), s0:s0 + sc]
                aw = w2_ref[0, pl.ds(q0, qt), s0:s0 + sc]
                xp = jax.lax.dot_general(
                    wx, ex, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI) + bx
                yp = jax.lax.dot_general(
                    wy, ey, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI) + by
                ap = jax.lax.dot_general(
                    aw, ea, dimension_numbers=dn,
                    preferred_element_type=jnp.float32, precision=_HI)
                w_rep = (yp * xp) * ap
            if tree == 'acc':
                acc = acc + _seg_fold(g * w_rep, sc)
            else:
                acc = acc + _fold(g * w_rep, sc, tree)
        if tree == 'acc':
            acc = acc[:, :2 * DIM] + acc[:, 2 * DIM:]
            acc = acc[:, :DIM] + acc[:, DIM:]
        out_ref[0, pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)


@functools.partial(jax.jit,
                   static_argnames=('weights', 'tree', 'qt', 'q_block'))
def run_kernel(atlas, row_idx, w0, w1, w2, weights='cw4', tree=False, qt=8,
               q_block=256):
    c, r, lanes = atlas.shape
    _, q, s = row_idx.shape
    wdim = 4 * s if weights == 'cw4' else s

    qspec = pl.BlockSpec((1, q_block, wdim), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, qt, weights, tree),
        grid=(c, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda ci, qi: (ci, qi, 0),
                         memory_space=pltpu.SMEM),
            qspec, qspec, qspec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, DIM), lambda ci, qi: (ci, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, q, DIM), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r, lanes), jnp.float32),
            pltpu.VMEM((q_block, 4 * s), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(row_idx, w0, w1, w2, atlas)


def cw4_host(wx, wy, aw):
    """[C,Q,S] fractions -> [C,Q,4S] corner weights (lane order s*4+corner)."""
    x1 = 1.0 - wx
    y1 = 1.0 - wy
    c00 = y1 * x1
    c01 = y1 * wx
    c10 = wy * x1
    c11 = wy * wx
    cw = jnp.stack([c00, c01, c10, c11], axis=-1) * aw[..., None]
    return cw.reshape(wx.shape[0], wx.shape[1], -1)


ITERS = 16


@functools.partial(jax.jit,
                   static_argnames=('weights', 'tree', 'qt'))
def run_loop(atlas, row_idx, w0, w1, w2, weights='cw4', tree=False, qt=8):
    def body(i, carry):
        out = run_kernel(atlas, row_idx, w0 + carry, w1, w2,
                         weights=weights, tree=tree, qt=qt)
        return out[0, 0, 0] * 1e-30
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))


def main():
    shapes = [
        (48, 16128, 32, 23408, (8, 16), 'SCA-one-group'),
        (16, 39936, 4, 20000, (32,), 'TSA'),
        (8, 39936, 8, 20000, (16, 32), 'decoder')]
    if os.environ.get('CW_PROD'):
        # the shapes the production SCA plan actually runs (two groups:
        # level0 alone, levels 1-3 together), cap 0.4
        shapes = [
            (48, 16128, 8, 23520, (32, 64), 'SCA-group1 (lvl0, s=8)'),
            (48, 16128, 24, 7936, (8, 16, 32), 'SCA-group2 (lvl1-3, s=24)'),
        ]
    for (c, q, s, r, qts, label) in shapes:
        print(f'--- {label} (c={c} q={q} s={s} r={r})', flush=True)
        run_shape(c, q, s, r, qts)


def run_shape(c, q, s, r, qts):
    key = jax.random.PRNGKey(0)
    r += (-r) % 8
    atlas = jax.random.normal(key, (c, r, 4 * DIM), jnp.float32)
    idx = jax.random.randint(key, (c, q, s), 0, r, jnp.int32)
    wx = jax.random.uniform(key, (c, q, s), jnp.float32)
    wy = jax.random.uniform(key, (c, q, s), jnp.float32)
    aw = jax.random.uniform(key, (c, q, s), jnp.float32)
    cw4 = cw4_host(wx, wy, aw)
    qpad = (-q) % 256
    idx = jnp.pad(idx, ((0, 0), (0, qpad), (0, 0)))
    for a in ('wx', 'wy', 'aw', 'cw4'):
        pass
    wx = jnp.pad(wx, ((0, 0), (0, qpad), (0, 0)))
    wy = jnp.pad(wy, ((0, 0), (0, qpad), (0, 0)))
    aw = jnp.pad(aw, ((0, 0), (0, qpad), (0, 0)))
    cw4 = jnp.pad(cw4, ((0, 0), (0, qpad), (0, 0)))

    rows = c * (q + qpad) * s

    # correctness cross-check (one tile worth would do; full is cheap enough)
    ref = None
    results = {}
    grid = [(w, t, qt) for w in ('cw4', 'blk') for t in (False, 'acc')
            for qt in qts]
    if os.environ.get('CW_FULL'):
        grid = [(w, t, qt) for w in ('cw4', 'tile', 'wide', 'blk')
                for t in (False, True) for qt in qts]
    for (weights, tree, qt) in grid:
        args = (cw4, cw4, cw4) if weights == 'cw4' else (wx, wy, aw)
        if True:
            if True:
                tag = f'{weights}/{"tree" if tree else "seq"}/qt{qt}'
                out = run_kernel(atlas, idx, *args, weights=weights,
                                 tree=tree, qt=qt)
                out = np.asarray(out)
                if ref is None:
                    ref = out
                else:
                    err = np.max(np.abs(out - ref))
                    if err > 1e-3:
                        print(f'{tag}: MISMATCH {err}')
                # time: loop of ITERS in one jit
                f = functools.partial(run_loop, weights=weights, tree=tree,
                                      qt=qt)
                float(f(atlas, idx, *args))  # warm
                t0 = time.perf_counter()
                float(f(atlas, idx, *args))
                dt = (time.perf_counter() - t0) / ITERS
                results[tag] = dt
                print(f'{tag}: {dt*1e3:.1f} ms/call, '
                      f'{rows/dt/1e6:.0f} M rows/s', flush=True)

    best = min(results, key=results.get)
    print(f'BEST: {best} {results[best]*1e3:.1f} ms')


if __name__ == '__main__':
    main()
