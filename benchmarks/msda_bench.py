"""TPU benchmark: msdeform_attn impl variants at production shapes.

Measured v5e (2026-08): SCA packed 560 ms / atlas 725 ms / fused 121 ms;
TSA packed 62 ms / atlas 57 ms / fused 86 ms (small-S overhead — hence the
auto gating in ops.msda). Timings use chained invocations inside one jit
with a single scalar readback (the axon tunnel makes per-call
block_until_ready unreliable).
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

from vidar_tpu.ops.msda import msdeform_attn


def timeit(name, fn, args, n=10):
    @jax.jit
    def chained(*args):
        def body(_, carry):
            dep, acc = carry
            out = fn(args[0] + (dep * 0), *args[1:])
            return out[0, 0, 0], acc + out[0, 1, 1]
        _, acc = jax.lax.fori_loop(
            0, n, body, (jnp.float32(0), jnp.float32(0)))
        return acc
    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.1f} ms', flush=True)


def bench(tag, b, q, heads, shapes, p, dtype):
    rng = np.random.default_rng(0)
    v_len = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.normal(size=(b, v_len, heads, 32))
                        .astype(np.float32)).astype(dtype)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (b, q, heads, L, p, 2))
                      .astype(np.float32))
    w = jax.nn.softmax(jnp.asarray(
        rng.normal(size=(b, q, heads, L * p)).astype(np.float32)), -1
    ).reshape(b, q, heads, L, p)
    for impl in ('packed', 'atlas', 'fused'):
        fn = lambda v, l, a, impl=impl: msdeform_attn(
            v, shapes, l, a, impl=impl)
        try:
            timeit(f'{tag} {impl:7s}', fn, (value, loc, w))
        except Exception as e:
            print(f'{tag} {impl}: FAILED {str(e)[:200]}', flush=True)


# SCA: cams=6 folded into batch, capacity-compacted 20000 queries
bench('SCA  ', 6, 20000, 8, [(116, 200), (58, 100), (29, 50), (15, 25)], 8,
      jnp.bfloat16)
# TSA: 2-queue BEV, 40000 queries, 1 level, 4 points
bench('TSA  ', 2, 40000, 8, [(200, 200)], 4, jnp.bfloat16)
