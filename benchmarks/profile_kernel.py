"""Kernel-level gather-rate bench: msda_gather_fused at SCA/TSA shapes."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np


def bench(fn, *args, iters=8, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.core.platform import select_backend
    select_backend()
    from vidar_tpu.ops.msda_pallas import msda_gather_fused, DIM

    key = jax.random.PRNGKey(0)

    # overhead baseline
    ident = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)
    ovh = bench(ident, z)
    print(f'dispatch+readback overhead: {ovh * 1e3:.2f} ms')

    def run(c, q, s, r, label, q_block=256):
        atlas = jax.random.normal(key, (c, r, 4 * DIM), jnp.float32)
        # sample-major [C, S, Q] layout (see ops/msda_pallas.py contract)
        idx = jax.random.randint(key, (c, s, q), 0, r, jnp.int32)
        wx = jax.random.uniform(key, (c, s, q), jnp.float32)
        wy = jax.random.uniform(key, (c, s, q), jnp.float32)
        aw = jax.random.uniform(key, (c, s, q), jnp.float32)
        f = jax.jit(partial(msda_gather_fused, q_block=q_block))
        t = bench(f, atlas, idx, wx, wy, aw) - ovh
        rows = c * q * s
        print(f'{label}: {t * 1e3:.1f} ms, {rows / t / 1e6:.0f} M rows/s '
              f'(c={c} q={q} s={s} r={r}, table {r * 512 / 1e6:.1f} MB)')

    # SCA regime: per (cam,head) tables; group = all 4 levels packed.
    # cap 0.4 -> q=16000; heads*cams = 48 tables; s = 4 lv * 8 p = 32.
    run(48, 16128, 32, 23408, 'SCA-like (L*P=32)')
    # TSA regime: 16 tables (bs*2queue*8heads), q=40000, s=4, table 40000
    # rows -> column-split in production; raw kernel at half table here.
    run(16, 39936, 4, 20000, 'TSA-like half-table (s=4)')
    run(16, 39936, 4, 20000, 'TSA-like q_block=512', q_block=512)
    # small-q sanity: decoder msda
    run(8, 39936, 8, 20000, 'decoder-like (s=8)')


if __name__ == '__main__':
    main()
