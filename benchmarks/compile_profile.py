"""Where does XLA:CPU compile time go for the dryrun train step?

Lowers + compiles the dryrun graph piecewise on a fresh compile cache and
prints per-piece HLO instruction counts and compile seconds. Run:

    JAX_PLATFORMS=cpu python benchmarks/compile_profile.py [piece...]

pieces: backbone encoder rollout loss full (default: all but full)
"""
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# the axon plugin force-selects TPU over the JAX_PLATFORMS env var; the
# config knob wins (same trick as __graft_entry__.dryrun_multichip)
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
# fresh cache: we are measuring cold compiles
jax.config.update('jax_compilation_cache_dir', '/tmp/cc_profile_fresh')

from vidar_tpu.models import ViDAR
from vidar_tpu.configs import vidar_tiny
from vidar_tpu.data import make_synthetic_batch
from vidar_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from vidar_tpu.train import create_train_state, make_optimizer, make_train_step


def timeit(tag, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    txt = lowered.as_text()
    n_instr = txt.count('\n')
    t2 = time.perf_counter()
    lowered.compile()
    t3 = time.perf_counter()
    print(f'{tag:28s} trace {t1-t0:7.2f}s  hlo_lines {n_instr:8d}  '
          f'compile {t3-t2:7.2f}s', flush=True)


def main():
    pieces = sys.argv[1:] or ['backbone', 'encoder', 'rollout', 'loss']
    model = ViDAR(**vidar_tiny())
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=8, queue_length=2, future_length=2,
                                 num_cams=3, img_h=64, img_w=64, max_points=64)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = model.init({'params': key, 'dropout': key}, batch, train=False)
    print(f'init: {time.perf_counter()-t0:.1f}s', flush=True)

    if 'full' in pieces:
        mesh = make_mesh(8)
        tx, _ = make_optimizer(params, total_steps=100)
        state = create_train_state(params, tx)
        state = jax.device_put(state, replicated_sharding(mesh))
        sbatch = shard_batch(batch, mesh)
        step = make_train_step(model, mesh=mesh, donate=False)
        t0 = time.perf_counter()
        lowered = step.lower(state, sbatch, jax.random.PRNGKey(1))
        t1 = time.perf_counter()
        txt = lowered.as_text()
        t2 = time.perf_counter()
        lowered.compile()
        t3 = time.perf_counter()
        print(f'{"full step":28s} trace {t1-t0:7.2f}s  '
              f'hlo_lines {txt.count(chr(10)):8d}  compile {t3-t2:7.2f}s',
              flush=True)
        return

    imgs = batch.frames.img  # [B, F, N, H, W, 3] presumably; check
    print('img field shape:', imgs.shape, flush=True)

    if 'backbone' in pieces:
        def backbone_loss(params, img):
            # one frame of images through extract_feat
            feats = model.apply(params, img, train=True,
                                rngs={'dropout': jax.random.PRNGKey(0)},
                                method=model.extract_feat)
            return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                       for f in jax.tree.leaves(feats))
        img0 = jnp.asarray(imgs[:, 0])
        timeit('backbone fwd+bwd', jax.value_and_grad(backbone_loss),
               params, img0)


if __name__ == '__main__':
    main()
