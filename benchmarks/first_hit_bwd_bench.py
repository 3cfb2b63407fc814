"""Isolate the latent-render module cost, forward and backward, at the
production configuration (VERDICT r4 missing #4 / next #5).

The forward runs the fused Pallas kernels (ray_prob + ray_agg); the
backward of the FIRST-HIT pass currently recomputes through the XLA path
(models/latent_rendering.py _first_hit_bwd) while the aggregation pass
has a Pallas backward. This measures fwd and fwd+bwd of the whole module
so the Pallas-backward decision is grounded in its actual share of the
train step.

Run: python benchmarks/first_hit_bwd_bench.py
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

from vidar_tpu.models.latent_rendering import LatentRendering
from vidar_tpu.configs import LATENT_RENDER_CFG


def sync(x):
    jax.block_until_ready(x)


def bench(fn, *args, n=5):
    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    bs, bev_h, bev_w, c = 1, 200, 200, 256
    model = LatentRendering(**LATENT_RENDER_CFG, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.normal(size=(bs, bev_h, bev_w, c))
                        .astype(np.float32)).astype(jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), embed)

    fwd = jax.jit(lambda p, e: model.apply(p, e))
    t = bench(fwd, params, embed)
    print(f'latent-render fwd: {t*1e3:.1f} ms', flush=True)

    def loss(p, e):
        return fwd(p, e).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t = bench(g, params, embed)
    print(f'latent-render fwd+bwd: {t*1e3:.1f} ms '
          f'(first-hit bwd = XLA recompute fallback)', flush=True)


if __name__ == '__main__':
    main()
