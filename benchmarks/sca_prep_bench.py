"""Bisect the SCA module overhead around the fused msda kernel (v5e).

Module measured ~106 ms with a ~49 ms kernel — this times each stage of
the chain separately: projections+compaction, location/weight prep,
atlas pack, kernel alone.
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
    from vidar_tpu.ops import msda as msda_mod
    from vidar_tpu.ops.msda import (_split_levels, _packed_cache,
                                    _prep_group, _fused_plan,
                                    _msda_fused_fwd_impl)

    key = jax.random.PRNGKey(0)
    bs_cams, q, heads, dim = 6, 16128, 8, 32
    levels, points = 4, 8
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    tot = sum(h * w for h, w in shapes)
    dt = jnp.bfloat16

    value = jax.random.normal(key, (bs_cams, tot, heads, dim), dt)
    loc = jax.random.uniform(key, (bs_cams, q, heads, levels, points, 2),
                             jnp.float32)
    weights = jax.random.uniform(key, (bs_cams, q, heads, levels, points),
                                 jnp.float32)

    # full fused msda op (prep + kernel(s))
    f = jax.jit(lambda v, l, w: msda_mod.msdeform_attn(
        v, list(shapes), l, w, impl='fused'))
    bench('msda op (prep+kernel)', f, value, loc, weights)

    # prep only: build atlas/row/fraction arrays for every group
    def prep_only(value, loc, weights):
        vls = _split_levels(value, shapes)
        plan = _fused_plan(shapes, packed16=False)
        cache = _packed_cache(vls, shapes, {e[0] for g in plan for e in g},
                              dtype=jnp.float32)
        outs = []
        for entries in plan:
            atlas, row_idx, wx1, wy1, aw = _prep_group(
                cache, shapes, loc, weights, entries, 256)
            outs.append((atlas, row_idx, wx1, wy1, aw))
        return outs

    bench('prep only (all groups)', jax.jit(prep_only), value, loc, weights)

    # atlas pack only
    def pack_only(value):
        vls = _split_levels(value, shapes)
        plan = _fused_plan(shapes, packed16=False)
        cache = _packed_cache(vls, shapes, {e[0] for g in plan for e in g},
                              dtype=jnp.float32)
        return list(cache.values())

    bench('atlas pack only', jax.jit(pack_only), value)

    # row/cw4 prep minus atlas: measured as prep_only - pack_only

    # module-side: projections + compaction + scatter, msda stubbed out
    from vidar_tpu.models.attention import SpatialCrossAttention
    sca = SpatialCrossAttention(embed_dims=256, num_cams=6,
                                deform_num_levels=levels,
                                deform_num_points=points,
                                capacity_ratio=0.4, dtype=dt)
    nq = 40000
    query = jax.random.normal(key, (1, nq, 256), dt)
    val6 = jax.random.normal(key, (1, 6, tot, 256), dt)
    ref_cam = jax.random.uniform(key, (6, 1, nq, 4, 2), jnp.float32)
    bev_mask = jax.random.uniform(key, (6, 1, nq, 4)) > 0.7
    params = sca.init(key, query, val6, ref_cam, bev_mask, shapes)

    fmod = jax.jit(partial(sca.apply, spatial_shapes=shapes))
    bench('SCA module (full)', fmod, params, query, val6, ref_cam, bev_mask)

    import vidar_tpu.ops.msda as m

    real = m.msdeform_attn

    def stub(value, spatial_shapes, loc, weights, **kw):
        return jnp.zeros(
            (value.shape[0], loc.shape[1], value.shape[2] * value.shape[3]),
            jnp.float32)

    m.msdeform_attn = stub
    import vidar_tpu.models.attention as att
    att.msdeform_attn = stub
    sca2 = SpatialCrossAttention(embed_dims=256, num_cams=6,
                                 deform_num_levels=levels,
                                 deform_num_points=points,
                                 capacity_ratio=0.4, dtype=dt)
    fstub = jax.jit(partial(sca2.apply, spatial_shapes=shapes))
    bench('SCA module (msda stubbed)', fstub, params, query, val6, ref_cam,
          bev_mask)
    m.msdeform_attn = real
    att.msdeform_attn = real


if __name__ == '__main__':
    main()
