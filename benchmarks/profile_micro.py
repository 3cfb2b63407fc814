"""Micro-profiler: TSA / SCA / FFN / DCN-block at flagship shapes."""

import time
from functools import partial

import numpy as np


def readback(x):
    import jax
    return float(np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0]))


def bench(fn, *args, iters=4, warmup=2):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        readback(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.core.platform import select_backend
    select_backend()
    from vidar_tpu.models.attention import (TemporalSelfAttention,
                                            SpatialCrossAttention)
    import flax.linen as nn

    key = jax.random.PRNGKey(0)
    bs, nq, c = 1, 40000, 256
    bev_h = bev_w = 200
    dt = jnp.bfloat16

    # ---- TSA ----
    tsa = TemporalSelfAttention(embed_dims=c, dtype=dt)
    query = jax.random.normal(key, (bs, nq, c), dt)
    prev_pair = jnp.stack([query, query], axis=1)
    ref = jax.random.uniform(key, (bs, 2, nq, 1, 2), jnp.float32)
    qpos = jax.random.normal(key, (bs, nq, c), dt)
    params = tsa.init(key, query, prev_pair, ref, bev_h, bev_w,
                      query_pos=qpos)
    f = jax.jit(partial(tsa.apply, params, bev_h=bev_h, bev_w=bev_w))
    t = bench(lambda q, p, r, qp: f(q, p, r, query_pos=qp),
              query, prev_pair, ref, qpos)
    print(f'TSA: {t * 1e3:.1f} ms')

    # ---- SCA ----
    cams, levels, points = 6, 4, 8
    sca = SpatialCrossAttention(embed_dims=c, num_cams=cams,
                                deform_num_levels=levels,
                                deform_num_points=points,
                                capacity_ratio=0.4, dtype=dt)
    shapes = [(116, 200), (58, 100), (29, 50), (15, 25)]
    tot = sum(h * w for h, w in shapes)
    value = jax.random.normal(key, (bs, cams, tot, c), dt)
    zanchors = 4
    ref_cam = jax.random.uniform(key, (cams, bs, nq, zanchors, 2),
                                 jnp.float32)
    bev_mask = jax.random.uniform(key, (cams, bs, nq, zanchors)) > 0.7
    sp = tuple(shapes)
    params = sca.init(key, query, value, ref_cam, bev_mask, sp)
    f = jax.jit(partial(sca.apply, params, spatial_shapes=sp))
    t = bench(f, query, value, ref_cam, bev_mask)
    print(f'SCA (cap 0.4): {t * 1e3:.1f} ms')

    # ---- FFN (512 hidden) ----
    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(512, dtype=dt)(x)
            h = nn.relu(h)
            return nn.Dense(256, dtype=dt)(h) + x
    ffn = FFN()
    p = ffn.init(key, query)
    f = jax.jit(ffn.apply)
    t = bench(f, p, query)
    print(f'FFN: {t * 1e3:.1f} ms')

    t = bench(jax.jit(lambda x: nn.LayerNorm(dtype=dt).apply(
        nn.LayerNorm(dtype=dt).init(key, x), x)), query)
    print(f'LayerNorm: {t * 1e3:.1f} ms')

    # ---- backbone: one DCN bottleneck vs one plain bottleneck, stage3 ----
    from vidar_tpu.models.resnet import Bottleneck
    x3 = jax.random.normal(key, (6, 58, 100, 1024), dt)
    blk = Bottleneck(mid_channels=256, stride=1, with_dcn=True,
                     dtype=dt)
    p3 = blk.init(key, x3)
    t = bench(jax.jit(blk.apply), p3, x3)
    print(f'stage3 DCN bottleneck [6,58,100,1024]: {t * 1e3:.2f} ms')
    blk2 = Bottleneck(mid_channels=256, stride=1, with_dcn=False,
                      dtype=dt)
    p32 = blk2.init(key, x3)
    t = bench(jax.jit(blk2.apply), p32, x3)
    print(f'stage3 plain bottleneck: {t * 1e3:.2f} ms')

    x4 = jax.random.normal(key, (6, 29, 50, 2048), dt)
    blk4 = Bottleneck(mid_channels=512, stride=1, with_dcn=True,
                      dtype=dt)
    p4 = blk4.init(key, x4)
    t = bench(jax.jit(blk4.apply), p4, x4)
    print(f'stage4 DCN bottleneck [6,29,50,2048]: {t * 1e3:.2f} ms')

    # stem + stage1/2 cost: approximate via full backbone minus known stages
    # (see profile_phases.py for the full backbone number)


if __name__ == '__main__':
    main()
