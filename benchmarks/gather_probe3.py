"""Probe 3: split the fused-msda inner-loop cost into (a) raw dynamic-load
issue rate and (b) sublane-packing cost, at the SCA-L123 shape
(48 tables x 7905 rows, S=24, q=14848; 17.1 M rows).

Variants (all consume every gathered row so nothing is DCE'd):
  loads-rowacc : per-row load, += into 8 rotating [1,128] accumulators —
                 NO sublane packing. Pure load+add issue rate.
  loads-pack   : production _gather_chunk packing ([qt, sc*128]) plus
                 128-aligned segment adds — pack cost on top of loads.
  full-prod    : the production msda_gather_fused kernel on the same data.
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

from vidar_tpu.ops.msda_pallas import msda_gather_fused, _gather_chunk

C, R, Q, S = 48, 7905, 14848, 24
QBLK = 256


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


def stage_table(atlas_ref, table, sem):
    @pl.when(pl.program_id(1) == 0)
    def _():
        cp = pltpu.make_async_copy(atlas_ref.at[pl.program_id(0)], table, sem)
        cp.start()
        cp.wait()


def kern_loads_rowacc(qt, idx_ref, atlas_ref, out_ref, table, sem):
    """Per-row loads accumulated into 8 independent [1,128] registers,
    no sublane packing. fori over queries, unrolled S loads inside."""
    del qt
    stage_table(atlas_ref, table, sem)

    def body(j, accs):
        new = list(accs)
        for s in range(S):
            row = table[pl.ds(idx_ref[0, s, j], 1), :]
            new[s % 8] = new[s % 8] + row
        return tuple(new)

    accs = jax.lax.fori_loop(
        0, QBLK, body,
        tuple(jnp.zeros((1, 128), jnp.float32) for _ in range(8)))
    tot = accs[0]
    for a in accs[1:]:
        tot = tot + a
    out_ref[0, :, :] = jnp.broadcast_to(tot[:, 0:1], (32, QBLK))


def kern_loads_pack(qt, idx_ref, atlas_ref, out_ref, table, sem):
    """Production packing, consumed by 128-aligned segment adds."""
    stage_table(atlas_ref, table, sem)

    def tile(i, acc):
        q0 = pl.multiple_of(i * qt, qt)
        for s0 in range(0, S, 8):
            sc = min(8, S - s0)
            g = _gather_chunk(table, idx_ref, q0, s0, sc, qt)  # [qt, sc*128]
            for k in range(sc):
                acc = acc + g[:, k * 128:(k + 1) * 128]
        return acc

    acc = jax.lax.fori_loop(0, QBLK // qt, tile,
                            jnp.zeros((qt, 128), jnp.float32))
    out_ref[0, :, :] = jnp.broadcast_to(acc[0:1, 0:1], (32, QBLK))


def kern_store_pack(qt, idx_ref, atlas_ref, out_ref, table, gbuf, sem):
    """Pack via VMEM stores (1 store/row into a [qt, S*128] scratch)
    instead of register concatenation, then bulk re-load + segment adds."""
    stage_table(atlas_ref, table, sem)

    def tile(i, acc):
        q0 = pl.multiple_of(i * qt, qt)
        for j in range(qt):
            for s in range(S):
                gbuf[pl.ds(j, 1), s * 128:(s + 1) * 128] = table[
                    pl.ds(idx_ref[0, s, q0 + j], 1), :]
        g = gbuf[:, :]                                  # [qt, S*128]
        for k in range(S):
            acc = acc + g[:, k * 128:(k + 1) * 128]
        return acc

    acc = jax.lax.fori_loop(0, QBLK // qt, tile,
                            jnp.zeros((qt, 128), jnp.float32))
    out_ref[0, :, :] = jnp.broadcast_to(acc[0:1, 0:1], (32, QBLK))


def run_case(name, body, atlas, idx, qt, extra_scratch=None):
    scratch = [pltpu.VMEM((atlas.shape[1], 128), jnp.float32)]
    if extra_scratch is not None:
        scratch.append(extra_scratch)
    scratch.append(pltpu.SemaphoreType.DMA)

    def call(atlas, idx):
        return pl.pallas_call(
            functools.partial(body, qt),
            grid=(C, Q // QBLK),
            in_specs=[pl.BlockSpec((1, S, QBLK), lambda ci, qi: (ci, 0, qi),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 32, QBLK), lambda ci, qi: (ci, 0, qi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 32, Q), jnp.float32),
            scratch_shapes=scratch,
        )(idx, atlas)
    try:
        dt = timeit(call, (atlas, idx), n=10)
        rows = C * S * Q
        print(f'{name:14s} qt={qt:2d}: {dt*1e3:7.2f} ms '
              f'({rows/dt/1e6:5.0f} M rows/s, {0.94e9*dt/rows:4.2f} cyc/row)',
              flush=True)
    except Exception as e:
        print(f'{name:14s} qt={qt:2d}: FAIL',
              str(e).replace(chr(10), ' ')[:200], flush=True)


def main():
    rng = np.random.default_rng(0)
    r8 = R + (-R) % 8
    atlas = jnp.asarray(rng.normal(size=(C, r8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, (C, S, Q)).astype(np.int32))
    w = jnp.asarray(rng.uniform(0, 1, (C, S, Q)).astype(np.float32))

    run_case('loads-rowacc', kern_loads_rowacc, atlas, idx, 0)
    run_case('loads-pack', kern_loads_pack, atlas, idx, 32)
    run_case('loads-pack', kern_loads_pack, atlas, idx, 16)
    run_case('store-pack', kern_store_pack, atlas, idx, 32,
             extra_scratch=pltpu.VMEM((32, S * 128), jnp.float32))

    dt = timeit(lambda a, i, wx, wy, aw: msda_gather_fused(a, i, wx, wy, aw),
                (atlas, idx, w, w, w), n=10)
    rows = C * S * Q
    print(f'{"full-prod":14s} qt=32: {dt*1e3:7.2f} ms '
          f'({rows/dt/1e6:5.0f} M rows/s, {0.94e9*dt/rows:4.2f} cyc/row)',
          flush=True)


if __name__ == '__main__':
    main()
