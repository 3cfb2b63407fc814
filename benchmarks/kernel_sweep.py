"""Sweep msda fused-kernel inner-tile size (qt) at the production shapes
the round-4 encode trace flagged: the SCA level-0 group (S=8, 12 MB table)
runs at 172 M rows/s while the S=24 group hits 1.1 G rows/s.

Isolates the KERNEL from the prep: synthetic kernel-ready layouts.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from vidar_tpu.ops.msda_pallas import msda_gather_fused, msda_gather_fused16, pack_atlas16


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
    # sample-major [C, S, Q] layout (see ops/msda_pallas.py contract)
    row = jnp.asarray(rng.integers(0, rows, (c, s, q)).astype(np.int32))
    wx = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    aw = jnp.asarray(rng.uniform(0, 1, (c, s, q)).astype(np.float32))
    return atlas, row, wx, wy, aw


CASES = [
    # name, c, table_rows, q(padded), s
    ('SCA-L0  (S=8, 12MB)', 48, 23517, 14848, 8),
    ('SCA-L123(S=24, 4MB)', 48, 7905, 14848, 24),
    ('TSA     (S=4, 20MB->16)', 16, 40401, 40192, 4),
    ('SCA-L0-smalltab (S=8, 4MB)', 48, 7905, 14848, 8),
]


def main():
    for name, c, rows, q, s in CASES:
        args = make(c, rows, q, s)
        rowsM = c * q * s / 1e6
        use16 = rows * 128 * 4 > 12_600_000
        for qt in (8, 16, 32, 64):
            if 256 % qt:
                continue
            try:
                if use16:
                    a16 = pack_atlas16(args[0])
                    dt = timeit(lambda *a, qt=qt: msda_gather_fused16(
                        a16, *a[1:], qt=qt), args, n=10)
                else:
                    dt = timeit(lambda *a, qt=qt: msda_gather_fused(
                        *a, qt=qt), args, n=10)
                print(f'{name:28s} qt={qt:2d}: {dt*1e3:7.2f} ms '
                      f'({rowsM/dt/1e3:6.0f} M rows/s)', flush=True)
            except Exception as e:
                print(f'{name:28s} qt={qt:2d}: FAIL {str(e)[:120]}',
                      flush=True)


if __name__ == '__main__':
    main()
