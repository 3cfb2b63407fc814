"""Probe 2: does Mosaic lower take_along_axis(tab, idx2d, axis=0) with
idx2d.shape == tab.shape, and is it a TRUE arbitrary-row gather (not a
mod-8 sublane shuffle)? Checks correctness against numpy, then rate.
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

R = 7912   # sublane-multiple table rows


def kern(idx_ref, tab_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :],
                                        axis=0)


@jax.jit
def gather2d(tab, idx):
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )(idx, tab)


def main():
    rng = np.random.default_rng(0)
    tab_np = rng.normal(size=(R, 128)).astype(np.float32)
    idx_np = rng.integers(0, R, (R, 128)).astype(np.int32)
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(idx_np)
    try:
        out = np.asarray(gather2d(tab, idx))
    except Exception as e:
        print('FAIL compile:', str(e).replace(chr(10), ' ')[:300])
        return
    ref = np.take_along_axis(tab_np, idx_np, axis=0)
    ok = np.array_equal(out, ref)
    print('correct:', ok)
    if not ok:
        bad = np.argwhere(out != ref)
        print('mismatches:', bad.shape[0], 'of', out.size)
        i, j = bad[0]
        print('first bad at', i, j, 'idx=', idx_np[i, j],
              'got', out[i, j], 'want', ref[i, j])
        # check mod-8 hypothesis
        ref8 = np.take_along_axis(
            tab_np.reshape(R // 8, 8, 128),
            (idx_np % 8).reshape(R // 8, 8, 128), axis=1).reshape(R, 128)
        print('matches mod-8 shuffle:', np.array_equal(out, ref8))

    # rate: chain n gathers with a data dependency
    n = 50
    @jax.jit
    def chained(tab, idx):
        def body(_, carry):
            dep, acc = carry
            out = gather2d(tab + dep * 0, idx)
            return out[0, 0], acc + out[1, 1]
        return jax.lax.fori_loop(0, n, body,
                                 (jnp.float32(0), jnp.float32(0)))[1]
    float(chained(tab, idx))
    t0 = time.perf_counter()
    float(chained(tab, idx))
    dt = (time.perf_counter() - t0) / n
    rows = R * 128  # element-level gathers
    print(f'{dt*1e3:.3f} ms per [R,128] gather; '
          f'{R/dt/1e6:.0f} M rows/s ({0.94e9*dt/R:.2f} cyc/row), '
          f'{rows/dt/1e9:.2f} G elems/s')


if __name__ == '__main__':
    main()
