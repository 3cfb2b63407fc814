"""Probe: can the dcn16 tap gather use 2-row dynamic slices (corners are
row-adjacent pairs) instead of 4 single-row loads, and what does it cost?

Variants on the stage-3 shape (b=30, 58x100, C=256 -> cl=128 u32 lanes):
  L4   current: 4 x [1, cl] loads per tap
  L2   2 x [2, cl] loads per tap + weighted sublane fold via 0/1 matmul
  L2s  2 x [2, cl] loads, crude sum (load-cost floor for the 2-row shape)
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

QT = 8
_HI = jax.lax.Precision.HIGHEST


def _kern_L4(w2, idx_ref, cw_ref, table_hbm, out_ref, table, sem):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]
    cl = table.shape[1]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        acc = jnp.zeros((QT, cl), jnp.uint32)
        for k in range(s):
            for j in range(QT):
                r = idx_ref[0, q0 + j, k]
                c00 = table[pl.ds(r, 1), :]
                c01 = table[pl.ds(r + 1, 1), :]
                c10 = table[pl.ds(r + w2, 1), :]
                c11 = table[pl.ds(r + w2 + 1, 1), :]
                acc = acc + jnp.concatenate(
                    [c00, c01, c10, c11], axis=1)[:, :cl] * 0
        out_ref[0, pl.ds(q0, QT), :cl] = acc
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


def _kern_L2s(w2, idx_ref, cw_ref, table_hbm, out_ref, table, sem):
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]
    cl = table.shape[1]

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        acc = jnp.zeros((2 * QT, cl), jnp.uint32)
        for k in range(s):
            pairs0 = []
            pairs1 = []
            for j in range(QT):
                r = idx_ref[0, q0 + j, k]
                pairs0.append(table[pl.ds(r, 2), :])
                pairs1.append(table[pl.ds(r + w2, 2), :])
            p0 = jnp.concatenate(pairs0, axis=0)   # [2QT, cl]
            p1 = jnp.concatenate(pairs1, axis=0)
            acc = acc + p0 + p1
        out_ref[0, pl.ds(q0, QT), :cl] = acc[:QT] + acc[QT:]
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


def _pairsel_masks(cl):
    """[QT, 2*QT] 0/1 masks selecting even / odd pair members."""
    r = jax.lax.broadcasted_iota(jnp.int32, (QT, 2 * QT), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (QT, 2 * QT), 1)
    m0 = (l == 2 * r).astype(jnp.float32)
    m1 = (l == 2 * r + 1).astype(jnp.float32)
    return m0, m1


def _kern_L2(w2, idx_ref, cw_ref, table_hbm, out_ref, table, sem):
    """2-row loads + weighted pair fold: Mw = m0*w_a + m1*w_b (weights
    lane-broadcast), acc = Mw @ (pair block) on the MXU."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    s = cw_ref.shape[2] // 4
    q_blk = idx_ref.shape[1]
    cl = table.shape[1]
    m0, m1 = _pairsel_masks(cl)
    hi_mask = jnp.uint32(0xffff0000)

    @pl.when(qb == 0)
    def _():
        cp = pltpu.make_async_copy(table_hbm.at[b], table, sem)
        cp.start()
        cp.wait()

    def tile(i, _):
        q0 = pl.multiple_of(i * QT, QT)
        outs = []
        for k in range(s):
            pairs0 = []
            pairs1 = []
            for j in range(QT):
                r = idx_ref[0, q0 + j, k]
                pairs0.append(table[pl.ds(r, 2), :])
                pairs1.append(table[pl.ds(r + w2, 2), :])
            p0 = jnp.concatenate(pairs0, axis=0)   # [2QT, cl] u32
            p1 = jnp.concatenate(pairs1, axis=0)
            cw = cw_ref[0, pl.ds(q0, QT), 4 * k:4 * (k + 1)]  # [QT,4]
            w00 = jnp.broadcast_to(cw[:, 0:1], (QT, 2 * QT))
            w01 = jnp.broadcast_to(cw[:, 1:2], (QT, 2 * QT))
            w10 = jnp.broadcast_to(cw[:, 2:3], (QT, 2 * QT))
            w11 = jnp.broadcast_to(cw[:, 3:4], (QT, 2 * QT))
            mw0 = m0 * w00 + m1 * w01              # [QT, 2QT]
            mw1 = m0 * w10 + m1 * w11
            hi0 = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(p0, jnp.broadcast_to(hi_mask, p0.shape)),
                jnp.float32)
            lo0 = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(p0, jnp.broadcast_to(jnp.uint32(16),
                                                        p0.shape)),
                jnp.float32)
            hi1 = jax.lax.bitcast_convert_type(
                jax.lax.bitwise_and(p1, jnp.broadcast_to(hi_mask, p1.shape)),
                jnp.float32)
            lo1 = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(p1, jnp.broadcast_to(jnp.uint32(16),
                                                        p1.shape)),
                jnp.float32)
            dn = (((1,), (0,)), ((), ()))
            acc_hi = (jax.lax.dot_general(mw0, hi0, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32,
                                          precision=_HI) +
                      jax.lax.dot_general(mw1, hi1, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32,
                                          precision=_HI))
            acc_lo = (jax.lax.dot_general(mw0, lo0, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32,
                                          precision=_HI) +
                      jax.lax.dot_general(mw1, lo1, dimension_numbers=dn,
                                          preferred_element_type=jnp.float32,
                                          precision=_HI))
            outs.append(acc_hi)
            outs.append(acc_lo)
        out_tile = jnp.concatenate(outs, axis=1)
        out_ref[0, pl.ds(q0, QT), :] = out_tile
        return 0

    jax.lax.fori_loop(0, q_blk // QT, tile, 0)


def build(kern, b, rrows, cl, q, s, out_lanes, out_dtype, q_block=128):
    w2 = 102
    return pl.pallas_call(
        functools.partial(kern, w2),
        grid=(b, q // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, q_block, 4 * s), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, q_block, out_lanes),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, q, out_lanes), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rrows, cl), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
    )


def timeit(fn, args, n=5):
    @jax.jit
    def chained(*args):
        def body(_, carry):
            dep, acc = carry
            out = fn(args[0] + (dep * 0).astype(args[0].dtype), *args[1:])
            return out[0, 0, 0].astype(jnp.float32), \
                acc + out[0, 1, 1].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), jnp.float32(0)))
        return acc
    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / n


def main():
    b, h, w, c = 8, 58, 100, 256
    cl = c // 2
    rrows = (h + 2) * (w + 2)  # 6120, already a multiple of 8
    q, s = 5888, 9
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, (b, rrows, cl),
                                     dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, (h + 1) * 102, (b, q, s),
                                   dtype=np.int64).astype(np.int32))
    cw = jnp.asarray(rng.uniform(0, 1, (b, q, 4 * s)).astype(np.float32))
    loads = b * q * s
    for name, kern, out_lanes, dt in (
            ('L4 ', _kern_L4, cl, jnp.uint32),
            ('L2s', _kern_L2s, cl, jnp.uint32),
            ('L2 ', _kern_L2, s * 2 * cl, jnp.float32)):
        try:
            call = build(kern, b, rrows, cl, q, s, out_lanes, dt)
            t = timeit(lambda *a: call(*a), (idx, cw, table))
            print(f'{name}: {t*1e3:7.2f} ms  '
                  f'({loads/t/1e6:6.0f} M taps/s)', flush=True)
        except Exception as e:
            print(f'{name}: FAIL {str(e)[:160]}', flush=True)


if __name__ == '__main__':
    main()
