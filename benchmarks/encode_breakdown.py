"""Encoder sub-phase timings at production shapes (v5e, eager + readback).

Times each piece of one encode frame: point_sampling, TSA, SCA, latent
rendering, FFN+norms, and a full single encoder layer — to locate encode
time that is not in the fused msda kernels.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def readback(x):
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def bench(tag, fn, *args, iters=4, warmup=2, **kw):
    for _ in range(warmup):
        readback(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        readback(out)
    print(f'{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms', flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    bs, nq, c = 1, 40000, 256
    bev_h = bev_w = 200
    cams = 6
    dt = jnp.bfloat16
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    tot = sum(h * w for h, w in shapes)

    ident = jax.jit(lambda x: x + 1.0)
    for _ in range(3):
        readback(ident(jnp.zeros((8, 128), jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(10):
        readback(ident(jnp.zeros((8, 128), jnp.float32)))
    ovh = (time.perf_counter() - t0) / 10
    print(f'dispatch+readback overhead: {ovh*1e3:.1f} ms', flush=True)

    # ---- point_sampling ----
    from vidar_tpu.models.encoder import (point_sampling,
                                          reference_points_3d,
                                          BEVFormerLayer)
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    ref3d = jnp.asarray(reference_points_3d(bev_h, bev_w, 8.0, 4))
    l2i = jax.random.normal(key, (bs, cams, 4, 4), jnp.float32)
    bench('point_sampling', jax.jit(partial(
        point_sampling, img_hw=(928, 1600))), ref3d, pc_range, l2i)

    # ---- latent rendering ----
    from vidar_tpu.models.latent_rendering import LatentRendering
    lr = LatentRendering(dtype=dt)
    xg = jax.random.normal(key, (bs, bev_h, bev_w, c), dt)
    p_lr = lr.init(key, xg)
    bench('latent_render', jax.jit(lr.apply), p_lr, xg)

    # ---- FFN + norms ----
    from vidar_tpu.models.layers import FFN
    import flax.linen as nn

    class FFNLN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.LayerNorm()(x)
            x = FFN(512, c, 0.1, dtype=dt)(x, deterministic=True)
            return nn.LayerNorm()(x)

    q = jax.random.normal(key, (bs, nq, c), dt)
    m = FFNLN()
    p_f = m.init(key, q)
    bench('ffn+2ln', jax.jit(m.apply), p_f, q)

    # ---- full encoder layer (no latent render) vs with ----
    value = jax.random.normal(key, (bs, cams, tot, c), dt)
    ref_cam = jax.random.uniform(key, (cams, bs, nq, 4, 2), jnp.float32)
    bev_mask = jax.random.uniform(key, (cams, bs, nq, 4)) > 0.7
    pair = jnp.stack([q, q], axis=1)
    ref2 = jax.random.uniform(key, (bs, 2, nq, 1, 2), jnp.float32)
    pos = jax.random.normal(key, (bs, nq, c), dt)

    for with_lr in (False, True):
        layer = BEVFormerLayer(
            embed_dims=c, num_cams=cams, sca_capacity_ratio=0.4,
            with_latent_render=with_lr, bev_h=bev_h, bev_w=bev_w,
            spatial_shapes=shapes, dtype=dt)
        p_l = layer.init(key, q, pair, ref2, value, ref_cam, bev_mask, pos)
        bench(f'encoder layer (latent_render={with_lr})',
              jax.jit(layer.apply), p_l, q, pair, ref2, value, ref_cam,
              bev_mask, pos)


if __name__ == '__main__':
    main()
