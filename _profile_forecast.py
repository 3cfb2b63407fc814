"""Time each forecast component on the real TPU at flagship shapes."""
import time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from functools import partial
from vidar_tpu.models import ViDAR
from vidar_tpu.configs import vidar_base
from vidar_tpu.data import make_synthetic_batch

cfg = vidar_base(); cfg['test_future_frame_num'] = 6
bs, q, f, cams, ih, iw, pts = 1, 4, 6, 6, 928, 1600, 32768
model = ViDAR(**cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
batch = make_synthetic_batch(rng, bs=bs, queue_length=q, future_length=f,
                             num_cams=cams, img_h=ih, img_w=iw, max_points=pts)
key = jax.random.PRNGKey(0)
init_batch = make_synthetic_batch(rng, bs=bs, queue_length=q, future_length=f,
                                  num_cams=cams, img_h=96, img_w=160, max_points=256)
shapes = jax.eval_shape(lambda: model.init({'params': key, 'dropout': key}, init_batch, train=False))
leaves, treedef = jax.tree.flatten(shapes)
keys = jax.random.split(key, len(leaves))
params = jax.tree.unflatten(treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02 for k, s in zip(keys, leaves)])

backbone = jax.jit(partial(model.apply, method=model.backbone_forward))
encode = jax.jit(partial(model.apply, method=model.encode_single, img_hw=(ih, iw)))
rollout = jax.jit(partial(model.apply, method=model.rollout_single))
decode = jax.jit(partial(model.apply, method=model.decode_from_features, num_future=6))

def timeit(name, fn, *a, n=3):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1000:.1f} ms')
    return out

imgs = batch.images[:, 0].reshape(bs*cams, ih, iw, 3)
feats = timeit('backbone(6 cams)', backbone, params, imgs)
feats = [x.reshape((bs, cams) + x.shape[1:]) for x in feats]
prev = jnp.zeros((bs, model.bev_h*model.bev_w, model.embed_dims), jnp.float32)
prev = timeit('encode_single', encode, params, feats, batch.can_bus[:,0], batch.shift[:,0],
              batch.rotate_angle[:,0], batch.lidar2img[:,0], prev, batch.prev_bev_exists[:,0])
layers = model.decoder_num_layers
hq = model.history_queue_length
prev_feats = prev[:, None]
ref2hist = batch.ref2cur[:, hq][:, None]
pred, _ = timeit('rollout_single', rollout, params, prev_feats, ref2hist,
                 batch.future2ref[:,1], batch.ref2future[:,1],
                 batch.future_can_bus[:,1][:, [0,1,2,17]])
stacked = jnp.stack([jnp.broadcast_to(prev[None], (layers,)+prev.shape)]*7, axis=0)
timeit('decode(7 frames)', decode, params, stacked, batch.gt_points, batch.gt_tindex,
       batch.cur2ref, batch.ref2cur)
