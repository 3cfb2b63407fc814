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
    # scalar readback — block_until_ready is unreliable through the axon
    # tunnel (docs/PERFORMANCE.md)
    leaves = jax.tree.leaves(x)
    return float(jnp.asarray(leaves[0]).reshape(-1)[0].astype(jnp.float32))


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
          f'(first-hit bwd = Pallas K1+K2)', flush=True)


if __name__ == '__main__' and False:
    main()


def decompose():
    """Split the backward cost between the two passes."""
    from vidar_tpu.models.latent_rendering import (ray_first_hit,
                                                   ray_aggregate)
    bs, bev_h, bev_w = 1, 200, 200
    n = bev_h * bev_w
    zdim, c_r, g_num = 16, 16, 256
    rng = np.random.default_rng(0)
    import numpy as _np
    gx, gy = _np.meshgrid((_np.arange(bev_w) + 0.5) / bev_w,
                          (_np.arange(bev_h) + 0.5) / bev_h)
    grids = jnp.asarray(_np.stack([gx, gy], -1).reshape(1, n, 2)
                        .astype(_np.float32))
    radial = grids - 0.5
    radial = radial / jnp.sqrt((radial ** 2).sum(-1, keepdims=True))
    radial = jnp.nan_to_num(radial)
    step = 0.5 / (bev_h // 2)
    steps = (jnp.arange(g_num, dtype=jnp.float32) + 0.5) * step
    occ = jnp.asarray(rng.normal(size=(bs, bev_h, bev_w, zdim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    fused = jnp.asarray(rng.normal(size=(bs, bev_h, bev_w, c_r + zdim))
                        .astype(np.float32)).astype(jnp.bfloat16)

    fh = jax.jit(jax.grad(lambda o: ray_first_hit(
        o, grids, radial, steps, 'sigmoid', 4096)
        .astype(jnp.float32).sum()))
    t = bench(fh, occ)
    print(f'first-hit fwd+bwd alone: {t*1e3:.1f} ms', flush=True)

    ag = jax.jit(jax.grad(lambda f: ray_aggregate(
        f, grids, radial, steps, c_r, zdim, 1e-3, 4096)
        .astype(jnp.float32).sum()))
    t = bench(ag, fused)
    print(f'ray-aggregate fwd+bwd alone: {t*1e3:.1f} ms', flush=True)





def trace():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from trace_profile import capture, device_table
    from vidar_tpu.models.latent_rendering import (ray_first_hit,
                                                   ray_aggregate)
    bs, bev_h, bev_w = 1, 200, 200
    n = bev_h * bev_w
    zdim, c_r, g_num = 16, 16, 256
    rng = np.random.default_rng(0)
    import numpy as _np
    gx, gy = _np.meshgrid((_np.arange(bev_w) + 0.5) / bev_w,
                          (_np.arange(bev_h) + 0.5) / bev_h)
    grids = jnp.asarray(_np.stack([gx, gy], -1).reshape(1, n, 2)
                        .astype(_np.float32))
    radial = grids - 0.5
    radial = radial / jnp.sqrt((radial ** 2).sum(-1, keepdims=True))
    radial = jnp.nan_to_num(radial)
    step = 0.5 / (bev_h // 2)
    steps = (jnp.arange(g_num, dtype=jnp.float32) + 0.5) * step
    occ = jnp.asarray(rng.normal(size=(bs, bev_h, bev_w, zdim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    fused = jnp.asarray(rng.normal(size=(bs, bev_h, bev_w, c_r + zdim))
                        .astype(np.float32)).astype(jnp.bfloat16)

    fh = jax.jit(jax.grad(lambda o: ray_first_hit(
        o, grids, radial, steps, 'sigmoid', 4096)
        .astype(jnp.float32).sum()))
    ag = jax.jit(jax.grad(lambda f: ray_aggregate(
        f, grids, radial, steps, c_r, zdim, 1e-3, 4096)
        .astype(jnp.float32).sum()))
    for name, fn, arg in (('first_hit_grad', fh, occ),
                          ('ray_agg_grad', ag, fused)):
        print(f'===== {name} =====', flush=True)
        ev, tmpdir = capture(lambda: fn(arg), name, iters=2)
        device_table(ev, top=18, iters=2)


if __name__ == '__main__':
    if 'decompose' in sys.argv:
        decompose()
    elif 'trace' in sys.argv:
        trace()
    else:
        main()
