"""One-shot TPU measurement battery for the round-2 perf changes.

Runs (in order, all eager per-call with scalar readback):
  1. msda kernel rates: fused f32 vs fused16 at SCA/TSA/decoder shapes
  2. full-module TSA / SCA timings (atlas vs fused auto path)
  3. per-phase forecast profile (batched backbone, encode, rollout, decode)
  4. bench.py-equivalent end-to-end samples/s

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/measure_all.py
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np


def readback(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def bench(fn, *args, iters=4, warmup=2, **kw):
    for _ in range(warmup):
        readback(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        readback(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.core.platform import select_backend
    print('backend:', select_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    # ---- 1. kernel rates ----
    from vidar_tpu.ops.msda_pallas import (msda_gather_fused,
                                           msda_gather_fused16, pack_atlas16)

    ident = jax.jit(lambda x: x + 1.0)
    ovh, _ = bench(ident, jnp.zeros((8, 128), jnp.float32))
    print(f'dispatch overhead: {ovh*1e3:.1f} ms', flush=True)

    def kshape(c, q, s, r, label):
        atlas = jax.random.normal(key, (c, r, 128), jnp.float32)
        # sample-major [C, S, Q] layout (see ops/msda_pallas.py)
        idx = jax.random.randint(key, (c, s, q), 0, r, jnp.int32)
        wx = jax.random.uniform(key, (c, s, q), jnp.float32)
        wy = jax.random.uniform(key, (c, s, q), jnp.float32)
        aw = jax.random.uniform(key, (c, s, q), jnp.float32)
        rows = c * q * s
        if r * 128 * 4 <= 16_000_000:   # f32 table must fit scoped VMEM
            f32 = jax.jit(partial(msda_gather_fused, q_block=256))
            t, _ = bench(f32, atlas, idx, wx, wy, aw)
            print(f'{label} f32: {(t-ovh)*1e3:.1f} ms '
                  f'{rows/(t-ovh)/1e6:.0f} M rows/s', flush=True)
        a16 = pack_atlas16(atlas)
        f16 = jax.jit(partial(msda_gather_fused16, q_block=256))
        t, _ = bench(f16, a16, idx, wx, wy, aw)
        print(f'{label} u16: {(t-ovh)*1e3:.1f} ms '
              f'{rows/(t-ovh)/1e6:.0f} M rows/s', flush=True)

    kshape(48, 16128, 32, 23408, 'SCA-like')
    kshape(16, 39936, 4, 40408, 'TSA-full-table')
    kshape(8, 39936, 8, 40408, 'decoder-full-table')

    # ---- 2. module timings ----
    from vidar_tpu.models.attention import (TemporalSelfAttention,
                                            SpatialCrossAttention)
    bs, nq, c = 1, 40000, 256
    bev_h = bev_w = 200
    dt = jnp.bfloat16
    tsa = TemporalSelfAttention(embed_dims=c, dtype=dt)
    query = jax.random.normal(key, (bs, nq, c), dt)
    prev_pair = jnp.stack([query, query], axis=1)
    ref = jax.random.uniform(key, (bs, 2, nq, 1, 2), jnp.float32)
    qpos = jax.random.normal(key, (bs, nq, c), dt)
    params = tsa.init(key, query, prev_pair, ref, bev_h, bev_w,
                      query_pos=qpos)
    f = jax.jit(partial(tsa.apply, params, bev_h=bev_h, bev_w=bev_w))
    t, _ = bench(lambda q, p, r, qp: f(q, p, r, query_pos=qp),
                 query, prev_pair, ref, qpos)
    print(f'TSA module: {(t-ovh)*1e3:.1f} ms', flush=True)

    cams, levels, points = 6, 4, 8
    sca = SpatialCrossAttention(embed_dims=c, num_cams=cams,
                                deform_num_levels=levels,
                                deform_num_points=points,
                                capacity_ratio=0.4, dtype=dt)
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    tot = sum(h * w for h, w in shapes)
    value = jax.random.normal(key, (bs, cams, tot, c), dt)
    ref_cam = jax.random.uniform(key, (cams, bs, nq, 4, 2), jnp.float32)
    bev_mask = jax.random.uniform(key, (cams, bs, nq, 4)) > 0.7
    params = sca.init(key, query, value, ref_cam, bev_mask, shapes)
    f = jax.jit(partial(sca.apply, params, spatial_shapes=shapes))
    t, _ = bench(f, query, value, ref_cam, bev_mask)
    print(f'SCA module (cap 0.4): {(t-ovh)*1e3:.1f} ms', flush=True)

    # ---- 3. phase profile ----
    from vidar_tpu.models import ViDAR
    from vidar_tpu.configs import vidar_base
    from vidar_tpu.data import make_synthetic_batch
    from vidar_tpu.evals.forecast_runner import ForecastRunner

    cfg = vidar_base()
    cfg['test_future_frame_num'] = 6
    bs, qlen, fut, cams, ih, iw, pts = 1, 4, 6, 6, 928, 1600, 32768
    model = ViDAR(**cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=bs, queue_length=qlen,
                                 future_length=fut, num_cams=cams,
                                 img_h=ih, img_w=iw, max_points=pts)
    init_batch = make_synthetic_batch(rng, bs=bs, queue_length=qlen,
                                      future_length=fut, num_cams=cams,
                                      img_h=96, img_w=160, max_points=256)
    shapes_tree = jax.eval_shape(
        lambda: model.init({'params': key, 'dropout': key}, init_batch,
                           train=False))
    leaves, treedef = jax.tree.flatten(shapes_tree)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, s.dtype) * 0.02
        for k, s in zip(keys, leaves)])

    runner = ForecastRunner(model, params, (ih, iw), num_future=6)

    t_frames = qlen + 1
    imgs = batch.images.reshape(bs * t_frames * cams, ih, iw, 3)
    t, feats_flat = bench(runner._backbone, params, imgs)
    print(f'backbone [{bs*t_frames*cams},928,1600]: {(t-ovh)*1e3:.0f} ms '
          f'({(t-ovh)/t_frames*1e3:.0f} ms/frame-equiv)', flush=True)

    feats = [x.reshape((bs, t_frames, cams) + x.shape[1:])[:, 0]
             for x in feats_flat]
    prev_bev = jnp.zeros((bs, model.bev_h * model.bev_w, model.embed_dims),
                         jnp.float32)
    t, bev = bench(runner._encode, params, feats, batch.can_bus[:, 0],
                   batch.shift[:, 0], batch.rotate_angle[:, 0],
                   batch.lidar2img[:, 0], prev_bev,
                   batch.prev_bev_exists[:, 0])
    print(f'encode_single: {(t-ovh)*1e3:.0f} ms', flush=True)

    layers = model.decoder_num_layers
    hq = model.history_queue_length
    prev_feats = bev[:, None]
    ref2hist = batch.ref2cur[:, hq][:, None]
    dims = [0, 1, 2, 17]
    t, (pred, _) = bench(runner._rollout, params, prev_feats, ref2hist,
                         batch.future2ref[:, 1], batch.ref2future[:, 1],
                         batch.future_can_bus[:, 1][:, dims])
    print(f'rollout_single: {(t-ovh)*1e3:.0f} ms', flush=True)

    ref_stack = jnp.broadcast_to(bev[None], (layers,) + bev.shape)
    stacked = jnp.stack([ref_stack] + [pred] * 6, axis=0)
    t, _ = bench(runner._decode, params, stacked, batch.gt_points,
                 batch.gt_tindex, batch.cur2ref, batch.ref2cur)
    print(f'decode: {(t-ovh)*1e3:.0f} ms', flush=True)

    # ---- 4. end to end ----
    out = runner(batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = runner(batch)
    jax.block_until_ready(out)
    dt_e2e = (time.perf_counter() - t0) / iters
    print(f'END-TO-END: {dt_e2e:.2f} s/sample = {1/dt_e2e:.4f} samples/s '
          f'(vs_baseline {1/dt_e2e/0.5:.3f})', flush=True)


if __name__ == '__main__':
    main()
