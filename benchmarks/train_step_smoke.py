"""Reduced-scale ViDAR train step on the real TPU (fused msda fwd+bwd).

Measured v5e (2026-08): 14.3 s/step at 464x800, queue 2, 1 future with
remat — 2.4x the 34.7 s/step of the pre-Pallas XLA-gather path.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import optax
from vidar_tpu.models import ViDAR
from vidar_tpu.configs import vidar_base
from vidar_tpu.data import make_synthetic_batch
from vidar_tpu.train.step import create_train_state, make_train_step

cfg = vidar_base()
cfg['remat'] = True
cfg['future_pred_frame_num'] = 1
cfg['test_future_frame_num'] = 1
bs, q, f, cams, ih, iw, pts = 1, 2, 1, 6, 464, 800, 8192
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
                       train=True))
leaves, treedef = jax.tree.flatten(shapes)
keys = jax.random.split(key, len(leaves))
params = jax.tree.unflatten(
    treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02
              for k, s in zip(keys, leaves)])
state = create_train_state(params, optax.adamw(1e-4))
step = make_train_step(model)

t0 = time.perf_counter()
state, metrics = step(state, batch, key)
loss = float(metrics['loss'])
print(f'compile+step1: {time.perf_counter()-t0:.1f}s loss={loss:.4f}',
      flush=True)
assert np.isfinite(loss)
t0 = time.perf_counter()
state, metrics = step(state, batch, key)
loss = float(metrics['loss'])
gn = float(metrics.get('grad_norm', np.nan))
print(f'step2: {time.perf_counter()-t0:.1f}s loss={loss:.4f} '
      f'grad_norm={gn:.3f}', flush=True)
assert np.isfinite(loss) and np.isfinite(gn)
print('TRAIN SMOKE OK', flush=True)
