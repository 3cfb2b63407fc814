"""Per-phase eager profiler at flagship shapes on the real TPU.

Times each ForecastRunner phase with a scalar readback per call (chained
in-jit timing lets XLA dead-code-slice; block_until_ready is unreliable
through the axon tunnel — see docs/PERFORMANCE.md)."""

import time

import numpy as np


def readback(x):
    import jax
    leaves = jax.tree.leaves(x)
    return float(np.asarray(leaves[0].reshape(-1)[0]))


def bench_fn(fn, *args, iters=4, warmup=2, **kw):
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
    select_backend()
    from functools import partial
    from vidar_tpu.models import ViDAR
    from vidar_tpu.configs import vidar_base
    from vidar_tpu.data import make_synthetic_batch

    cfg = vidar_base()
    cfg['test_future_frame_num'] = 6
    bs, q, f, cams, ih, iw, pts = 1, 4, 6, 6, 928, 1600, 32768
    model = ViDAR(**cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=bs, queue_length=q, future_length=f,
                                 num_cams=cams, img_h=ih, img_w=iw,
                                 max_points=pts)
    key = jax.random.PRNGKey(0)
    init_batch = make_synthetic_batch(rng, bs=bs, queue_length=q,
                                      future_length=f, num_cams=cams,
                                      img_h=96, img_w=160, max_points=256)
    shapes = jax.eval_shape(
        lambda: model.init({'params': key, 'dropout': key}, init_batch,
                           train=False))
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, s.dtype) * 0.02
        for k, s in zip(keys, leaves)])

    backbone = jax.jit(partial(model.apply, method=model.backbone_forward))
    encode = jax.jit(partial(model.apply, method=model.encode_single,
                             img_hw=(ih, iw)))
    rollout = jax.jit(partial(model.apply, method=model.rollout_single))
    decode = jax.jit(partial(model.apply, method=model.decode_from_features,
                             num_future=6))

    imgs = batch.images[:, 0].reshape(bs * cams, ih, iw, 3)
    dt, feats_flat = bench_fn(backbone, params, imgs)
    print(f'backbone [6,928,1600]: {dt * 1e3:.1f} ms')

    feats = [x.reshape((bs, cams) + x.shape[1:]) for x in feats_flat]
    prev_bev = jnp.zeros((bs, model.bev_h * model.bev_w, model.embed_dims),
                         jnp.float32)
    dt, bev = bench_fn(encode, params, feats, batch.can_bus[:, 0],
                       batch.shift[:, 0], batch.rotate_angle[:, 0],
                       batch.lidar2img[:, 0], prev_bev,
                       batch.prev_bev_exists[:, 0])
    print(f'encode_single (6 layers): {dt * 1e3:.1f} ms')

    layers = model.decoder_num_layers
    ref_stack = jnp.broadcast_to(bev[None], (layers,) + bev.shape)
    hq = model.history_queue_length
    prev_feats = bev[:, None]
    ref2hist = batch.ref2cur[:, hq][:, None]
    dims = [0, 1, 2, 17]
    dt, (pred, _) = bench_fn(rollout, params, prev_feats, ref2hist,
                             batch.future2ref[:, 1], batch.ref2future[:, 1],
                             batch.future_can_bus[:, 1][:, dims])
    print(f'rollout_single: {dt * 1e3:.1f} ms')

    stacked = jnp.stack([ref_stack] + [pred] * 6, axis=0)
    dt, _ = bench_fn(decode, params, stacked, batch.gt_points,
                     batch.gt_tindex, batch.cur2ref, batch.ref2cur)
    print(f'decode: {dt * 1e3:.1f} ms')

    total = None
    print('\nphase math: backbone*5 + encode*5 + rollout*6 + decode')


if __name__ == '__main__':
    main()
