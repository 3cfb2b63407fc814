"""A/B decomposition of the msda fused-kernel restructure candidates.

Variants (all produce identical math):
  A  round-4 shipped kernel: per-tile HIGHEST expansion matmul, 4*sc
     narrow [qt, DIM] fold adds, tile-outer/chunk-inner, acc in regs.
  B  A with the expansion matmul at 3 exact bf16 passes (_dot3).
  C  B with the WIDE fold: per chunk sc adds of [qt, 128] segments into
     a [qt, 128] register accumulator carried across chunks; single
     4-corner fold per tile at the end.
  D  chunk-outer with the expansion hoisted to a per-(chunk, q-block)
     VMEM scratch + per-sample FMA (the first v2 attempt).

Run: python benchmarks/sca_kernel_variants.py
"""
import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from vidar_tpu.ops.msda_pallas import (
    DIM, SC, _HI, _chunks, _expand_mat, _cw4_mats_kernel, _cw4_block_t,
    _t, _gather_chunk)

_DN1 = (((1,), (0,)), ((), ()))


def _dot3(a, b01, dn):
    a1 = a.astype(jnp.bfloat16)
    r1 = a - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    bb = b01.astype(jnp.bfloat16)

    def d(x):
        return jax.lax.dot_general(x, bb, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)
    return (d(a1) + d(a2)) + d(a3)


def _gather_sample(table, idx_ref, q0, k, qt):
    rows = [table[pl.ds(idx_ref[0, k, q0 + j], 1), :] for j in range(qt)]
    return rows[0] if qt == 1 else jnp.concatenate(rows, axis=0)


def _kern_A(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
            out_ref, table, cwbuf, accbuf, sem):
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
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = jax.lax.dot_general(
                cw, emats[sc], dimension_numbers=_DN1,
                preferred_element_type=jnp.float32, precision=_HI)
            p = g * w_rep
            for b in range(4 * sc):
                acc = acc + p[:, b * DIM:(b + 1) * DIM]
        accbuf[pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, :])


def _kern_B(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
            out_ref, table, cwbuf, accbuf, sem):
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
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = _dot3(cw, emats[sc], _DN1)
            p = g * w_rep
            for b in range(4 * sc):
                acc = acc + p[:, b * DIM:(b + 1) * DIM]
        accbuf[pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, :])


def _kern_C(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
            out_ref, table, cwbuf, accbuf, sem):
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
        acc = jnp.zeros((qt, 4 * DIM), jnp.float32)
        for (s0, sc) in _chunks(s):
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)
            cw = cwbuf[pl.ds(q0, qt), 4 * s0:4 * (s0 + sc)]
            w_rep = _dot3(cw, emats[sc], _DN1)
            p = g * w_rep
            for k in range(sc):
                acc = acc + p[:, k * 4 * DIM:(k + 1) * 4 * DIM]
        accbuf[pl.ds(q0, qt), :] = (
            acc[:, 0:DIM] + acc[:, DIM:2 * DIM] +
            acc[:, 2 * DIM:3 * DIM] + acc[:, 3 * DIM:4 * DIM])
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, :])


def _kern_D(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
            out_ref, table, cwbuf, wrbuf, accbuf, sem):
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
    accbuf[:] = jnp.zeros_like(accbuf)

    for (s0, sc) in _chunks(s):
        wrbuf[:, :sc * 4 * DIM] = _dot3(
            cwbuf[:, 4 * s0:4 * (s0 + sc)], emats[sc], _DN1)

        def tile(i, _):
            q0 = pl.multiple_of(i * qt, qt)
            a = accbuf[pl.ds(q0, qt), :]
            for k in range(sc):
                g = _gather_sample(table, idx_ref, q0, s0 + k, qt)
                a = a + g * wrbuf[pl.ds(q0, qt),
                                  k * 4 * DIM:(k + 1) * 4 * DIM]
            accbuf[pl.ds(q0, qt), :] = a
            return 0

        jax.lax.fori_loop(0, q_blk // qt, tile, 0)

    final = (accbuf[:, 0:DIM] + accbuf[:, DIM:2 * DIM] +
             accbuf[:, 2 * DIM:3 * DIM] + accbuf[:, 3 * DIM:4 * DIM])
    out_ref[0, :, :] = _t(final)


def build_call(kern, scratches, qt, c, r, s, q, q_block=256):
    qspec = pl.BlockSpec((1, s, q_block), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kern, qt),
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
        scratch_shapes=scratches + [pltpu.SemaphoreType.DMA],
    )


def timeit(fn, args, n=10):
    @jax.jit
    def chained(*args):
        def body(_, carry):
            dep, acc = carry
            out = fn(args[0], args[1] + (dep * 0).astype(args[1].dtype),
                     *args[2:])
            return out[0, 0, 0], acc + out[0, 1, 1]
        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), jnp.float32(0)))
        return acc
    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / n


def make(c, rows, q, s, seed=0):
    rng = np.random.default_rng(seed)
    rows8 = rows + (-rows) % 8
    atlas = jnp.asarray(rng.normal(size=(c, rows8, 128)).astype(np.float32))
    row = jnp.asarray(rng.integers(0, rows, (c, s, q)).astype(np.int32))
    wx = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    aw = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    return atlas, row, wx, wy, aw


CASES = [
    ('SCA-L123(S=24, 4MB)', 48, 7905, 14848, 24),
    ('SCA-L0  (S=8, 12MB)', 48, 23517, 14848, 8),
]

QB = 256


def variants(r8, s, q_block=QB):
    tab = pltpu.VMEM((r8, 128), jnp.float32)
    cw = pltpu.VMEM((q_block, 4 * s), jnp.float32)
    return {
        'A': (_kern_A, [tab, cw, pltpu.VMEM((q_block, DIM), jnp.float32)]),
        'B': (_kern_B, [tab, cw, pltpu.VMEM((q_block, DIM), jnp.float32)]),
        'C': (_kern_C, [tab, cw, pltpu.VMEM((q_block, DIM), jnp.float32)]),
        'D': (_kern_D, [tab, cw,
                        pltpu.VMEM((q_block, min(s, SC) * 4 * DIM),
                                   jnp.float32),
                        pltpu.VMEM((q_block, 4 * DIM), jnp.float32)]),
    }


def main():
    only = sys.argv[1:] or ['A', 'B', 'C', 'D']
    for name, c, rows, q, s in CASES:
        args = make(c, rows, q, s)
        r8 = rows + (-rows) % 8
        ref = None
        for vn, (kern, scr) in variants(r8, s).items():
            if vn not in only:
                continue
            for qt in (8, 16, 32):
                try:
                    call = build_call(kern, scr, qt, c, r8, s, q)
                    out = call(*([args[1]] + list(args[2:]) + [args[0]]))
                    # positional order: idx, wx, wy, aw, atlas
                    if ref is None:
                        ref = np.asarray(out)
                        err = 0.0
                    else:
                        err = float(np.max(np.abs(np.asarray(out) - ref)))
                    dt = timeit(lambda *a: call(a[1], a[2], a[3], a[4], a[0]),
                                args, n=10)
                    rowsMs = c * q * s / dt / 1e6
                    print(f'{name:22s} {vn} qt={qt:2d}: {dt*1e3:7.2f} ms '
                          f'({rowsMs:6.0f} M rows/s) maxerr={err:.2e}',
                          flush=True)
                except Exception as e:
                    print(f'{name:22s} {vn} qt={qt:2d}: FAIL {str(e)[:100]}',
                          flush=True)





# ---------------- pure-gather probes (no weights, no fold) ----------------

def _kern_G0(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
             out_ref, table, cwbuf, accbuf, sem):
    """Load ceiling: per-sample [qt,128] gather + plain accumulate."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = out_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc = jnp.zeros((qt, 4 * DIM), jnp.float32)
        for k in range(s):
            acc = acc + _gather_sample(table, idx_ref, q0, k, qt)
        accbuf[pl.ds(q0, qt), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, 0:DIM])


def _kern_G8(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
             out_ref, table, cwbuf, accbuf, sem):
    """Width probe: one 8-sublane-aligned [8,128] load per (q, s) --
    gauges whether wide loads cost the same as [1,128] loads."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = out_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc = jnp.zeros((8, 4 * DIM), jnp.float32)
        for k in range(s):
            for j in range(qt):
                r = idx_ref[0, k, q0 + j]
                r8 = (jax.lax.shift_right_logical(r, 3)) * 8
                acc = acc + table[pl.ds(r8, 8), :]
        accbuf[pl.ds(q0, 8), :] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, 0:DIM])


def probes():
    for name, c, rows, q, s in CASES:
        args = make(c, rows, q, s)
        r8 = rows + (-rows) % 8
        tab = pltpu.VMEM((r8, 128), jnp.float32)
        cw = pltpu.VMEM((QB, 4 * s), jnp.float32)
        for vn, kern in (('G0', _kern_G0), ('G8', _kern_G8)):
            for qt in (8, 16, 32):
                try:
                    scr = [tab, cw, pltpu.VMEM((QB, 4 * DIM), jnp.float32)]
                    call = build_call(kern, scr, qt, c, r8, s, q)
                    dt = timeit(lambda *a: call(a[1], a[2], a[3], a[4], a[0]),
                                args, n=10)
                    rowsMs = c * q * s / dt / 1e6
                    print(f'{name:22s} {vn} qt={qt:2d}: {dt*1e3:7.2f} ms '
                          f'({rowsMs:6.0f} M rows/s)', flush=True)
                except Exception as e:
                    print(f'{name:22s} {vn} qt={qt:2d}: FAIL {str(e)[:100]}',
                          flush=True)




def _kern_E(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
            out_ref, table, cwbuf, wrbuf, accbuf, sem):
    """Tile-outer, ALL chunks' expanded weights precomputed per q-block
    (no MXU in the tile loop), dual register accumulators to break the
    FMA dependency chain."""
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
    for (s0, sc) in _chunks(s):
        wrbuf[:, s0 * 4 * DIM:(s0 + sc) * 4 * DIM] = _dot3(
            cwbuf[:, 4 * s0:4 * (s0 + sc)], emats[sc], _DN1)

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        wr = wrbuf[pl.ds(q0, qt), :]
        acc_a = jnp.zeros((qt, 4 * DIM), jnp.float32)
        acc_b = jnp.zeros((qt, 4 * DIM), jnp.float32)
        for k in range(s):
            g = _gather_sample(table, idx_ref, q0, k, qt)
            p = g * wr[:, k * 4 * DIM:(k + 1) * 4 * DIM]
            if k % 2 == 0:
                acc_a = acc_a + p
            else:
                acc_b = acc_b + p
        acc = acc_a + acc_b
        accbuf[pl.ds(q0, qt), :] = (
            acc[:, 0:DIM] + acc[:, DIM:2 * DIM] +
            acc[:, 2 * DIM:3 * DIM] + acc[:, 3 * DIM:4 * DIM])
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, :])


def _kern_G2(qt, idx_ref, wx_ref, wy_ref, aw_ref, atlas_ref,
             out_ref, table, cwbuf, accbuf, sem):
    """Pure gather, DUAL accumulators (dependency-chain probe)."""
    c = pl.program_id(0)
    qb = pl.program_id(1)
    s = wx_ref.shape[1]
    q_blk = out_ref.shape[2]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[c], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc_a = jnp.zeros((qt, 4 * DIM), jnp.float32)
        acc_b = jnp.zeros((qt, 4 * DIM), jnp.float32)
        for k in range(s):
            g = _gather_sample(table, idx_ref, q0, k, qt)
            if k % 2 == 0:
                acc_a = acc_a + g
            else:
                acc_b = acc_b + g
        accbuf[pl.ds(q0, qt), :] = acc_a + acc_b
        return 0

    jax.lax.fori_loop(0, q_blk // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, 0:DIM])


def probes2():
    for name, c, rows, q, s in CASES:
        args = make(c, rows, q, s)
        r8 = rows + (-rows) % 8
        tab = pltpu.VMEM((r8, 128), jnp.float32)
        cw = pltpu.VMEM((QB, 4 * s), jnp.float32)
        for vn, kern, scr in (
            ('E ', _kern_E, [tab, cw,
                             pltpu.VMEM((QB, s * 4 * DIM), jnp.float32),
                             pltpu.VMEM((QB, 4 * DIM), jnp.float32)]),
            ('G2', _kern_G2, [tab, cw,
                              pltpu.VMEM((QB, 4 * DIM), jnp.float32)]),
            ('A ', _kern_A, [tab, cw,
                             pltpu.VMEM((QB, DIM), jnp.float32)]),
        ):
            for qt in (8, 16, 32, 64, 128):
                try:
                    call = build_call(kern, scr, qt, c, r8, s, q)
                    dt = timeit(lambda *a: call(a[1], a[2], a[3], a[4], a[0]),
                                args, n=10)
                    rowsMs = c * q * s / dt / 1e6
                    print(f'{name:22s} {vn} qt={qt:3d}: {dt*1e3:7.2f} ms '
                          f'({rowsMs:6.0f} M rows/s)', flush=True)
                except Exception as e:
                    print(f'{name:22s} {vn} qt={qt:3d}: FAIL {str(e)[:90]}',
                          flush=True)

if __name__ == '__main__':
    if 'probe2' in sys.argv:
        probes2()
    elif 'probe' in sys.argv:
        probes()
    else:
        main()
