"""Probe Mosaic lowerings for the msda inner row-gather.

The fused msda kernels (ops/msda_pallas.py) spend ~2.4 cyc/row in the
scalar-loop gather (`_gather_chunk`): one dynamic [1,128] VMEM load per row
plus two register concatenations. This probes whether jax 0.9.0 Mosaic can
lower a VECTORIZED row gather (take / take_along_axis on a VMEM-resident
value) to a hardware gather, and times fold-matmul variants of the reduce.

Synthetic SCA-L123 shape: 48 tables x 7905 rows x 128 lanes, S=24,
q=14848 (17.1 M rows/invocation; floor ~19.5 ms at 1 row/cycle @940 MHz).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

C, R, Q, S = 48, 7905, 14848, 24
QBLK = 256
DIM = 32


def timeit(fn, args, n=10):
    @jax.jit
    def chained(*args):
        def body(_, carry):
            dep, acc = carry
            out = fn(args[0], (args[1] + (dep * 0).astype(args[1].dtype)),
                     *args[2:])
            return out.ravel()[0], acc + out.ravel()[1]
        _, acc = jax.lax.fori_loop(0, n, body,
                                   (jnp.float32(0), jnp.float32(0)))
        return acc
    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / n


def make(seed=0):
    rng = np.random.default_rng(seed)
    r8 = R + (-R) % 8
    atlas = jnp.asarray(rng.normal(size=(C, r8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, (C, S, Q)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (C, S, Q)).astype(np.float32))
    idx_t = jnp.swapaxes(idx, 1, 2)          # [C, Q, S] for tala variants
    return atlas, idx, w, idx_t


def run_case(name, kernel_body, atlas, idx, w, qt, idx_space,
             idx_layout='sq'):
    if idx_layout == 'sq':
        ispec = pl.BlockSpec((1, S, QBLK), lambda ci, qi: (ci, 0, qi),
                             memory_space=idx_space)
    else:
        ispec = pl.BlockSpec((1, QBLK, S), lambda ci, qi: (ci, qi, 0),
                             memory_space=idx_space)
    wspec = pl.BlockSpec((1, S, QBLK), lambda ci, qi: (ci, 0, qi),
                         memory_space=pltpu.VMEM)

    def call(atlas, idx, w):
        return pl.pallas_call(
            functools.partial(kernel_body, qt),
            grid=(C, Q // QBLK),
            in_specs=[ispec, wspec, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, DIM, QBLK),
                                   lambda ci, qi: (ci, 0, qi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, DIM, Q), jnp.float32),
            scratch_shapes=[pltpu.VMEM((atlas.shape[1], 128), jnp.float32),
                            pltpu.VMEM((QBLK, DIM), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )(idx, w, atlas)

    try:
        dt = timeit(call, (atlas, idx, w), n=10)
        rows = C * S * Q
        print(f'{name:30s} qt={qt:2d}: {dt*1e3:7.2f} ms '
              f'({rows/dt/1e6:6.0f} M rows/s, '
              f'{0.94e9*dt/rows:4.2f} cyc/row)', flush=True)
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:200]
        print(f'{name:30s} qt={qt:2d}: FAIL {msg}', flush=True)


def stage_table(atlas_ref, table, sem):
    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[pl.program_id(0)], table, sem)
        cp.start()
        cp.wait()


def _ident(n):
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (a == b).astype(jnp.float32)


_DN0 = (((0,), (0,)), ((), ()))
_DN1 = (((1,), (0,)), ((), ()))
_HI = jax.lax.Precision.HIGHEST


def _t(x):
    return jax.lax.dot_general(x, _ident(x.shape[0]), dimension_numbers=_DN0,
                               preferred_element_type=jnp.float32,
                               precision=_HI)


def _fold_mat():
    """[128, DIM] 0/1 summing the four 32-lane corner segments."""
    l_ = jax.lax.broadcasted_iota(jnp.int32, (128, DIM), 0)
    d = jax.lax.broadcasted_iota(jnp.int32, (128, DIM), 1)
    return (l_ % DIM == d).astype(jnp.float32)


# all variants compute out[c, :, q] = sum_s w[c,s,q] * fold4(tab[idx[c,s,q]])


def kern_loop_baseline(qt, idx_ref, w_ref, atlas_ref, out_ref,
                       table, accbuf, sem):
    """Production structure: per-row loads + nested concats, slice-add
    fold (weights applied per 128-lane sample segment)."""
    stage_table(atlas_ref, table, sem)
    wq = _t(w_ref[0, :, :])                     # [QBLK, S]

    def tile(i, _):
        q0 = pl.multiple_of(i * qt, qt)
        acc = jnp.zeros((qt, 128), jnp.float32)
        wt = jax.lax.dynamic_slice(wq, (q0, 0), (qt, S))
        for s0 in range(0, S, 8):
            sc = min(8, S - s0)
            qrows = []
            for j in range(qt):
                samples = [table[pl.ds(idx_ref[0, s0 + k, q0 + j], 1), :]
                           for k in range(sc)]
                qrows.append(jnp.concatenate(samples, axis=1))
            g = jnp.concatenate(qrows, axis=0)  # [qt, sc*128]
            for k in range(sc):
                wk = jax.lax.broadcast_in_dim(wt[:, s0 + k], (qt, 128),
                                              (0,))
                acc = acc + wk * g[:, k * 128:(k + 1) * 128]
        accbuf[pl.ds(q0, qt), :] = jax.lax.dot_general(
            acc, _fold_mat(), dimension_numbers=_DN1,
            preferred_element_type=jnp.float32, precision=_HI)
        return 0

    jax.lax.fori_loop(0, QBLK // qt, tile, 0)
    out_ref[0, :, :] = _t(accbuf[:, :])


def kern_take_1d(qt, idx_ref, w_ref, atlas_ref, out_ref, table, accbuf,
                 sem):
    """Per-sample vectorized take with 1-D lane indices over the whole
    q-block; weights lane-broadcast; one fold matmul."""
    del qt
    stage_table(atlas_ref, table, sem)
    wq = _t(w_ref[0, :, :])                         # [QBLK, S]
    tab = table[...]
    acc = jnp.zeros((QBLK, 128), jnp.float32)
    for s in range(S):
        ids = idx_ref[0, s, :]                      # [QBLK] lanes
        g = jnp.take(tab, ids, axis=0)              # [QBLK, 128]
        wk = jax.lax.broadcast_in_dim(wq[:, s], (QBLK, 128), (0,))
        acc = acc + wk * g
    accbuf[:, :] = jax.lax.dot_general(
        acc, _fold_mat(), dimension_numbers=_DN1,
        preferred_element_type=jnp.float32, precision=_HI)
    out_ref[0, :, :] = _t(accbuf[:, :])


def kern_tala(qt, idx_ref, w_ref, atlas_ref, out_ref, table, accbuf, sem):
    """take_along_axis with [QBLK, 128] sublane-major broadcast indices
    (idx arrives [C, Q, S])."""
    del qt
    stage_table(atlas_ref, table, sem)
    wq = _t(w_ref[0, :, :])                         # [QBLK, S]
    tab = table[...]
    acc = jnp.zeros((QBLK, 128), jnp.float32)
    for s in range(S):
        ids = jax.lax.broadcast_in_dim(idx_ref[0, :, s], (QBLK, 128), (0,))
        g = jnp.take_along_axis(tab, ids, axis=0)   # [QBLK, 128]
        wk = jax.lax.broadcast_in_dim(wq[:, s], (QBLK, 128), (0,))
        acc = acc + wk * g
    accbuf[:, :] = jax.lax.dot_general(
        acc, _fold_mat(), dimension_numbers=_DN1,
        preferred_element_type=jnp.float32, precision=_HI)
    out_ref[0, :, :] = _t(accbuf[:, :])


def main():
    atlas, idx, w, idx_t = make()
    run_case('loop-baseline', kern_loop_baseline, atlas, idx, w, 16,
             pltpu.SMEM)
    run_case('loop-baseline', kern_loop_baseline, atlas, idx, w, 32,
             pltpu.SMEM)
    run_case('take-1d-lane-idx', kern_take_1d, atlas, idx, w, 0,
             pltpu.VMEM)
    run_case('take-along-axis', kern_tala, atlas, idx_t, w, 0,
             pltpu.VMEM, idx_layout='qs')


if __name__ == '__main__':
    main()
