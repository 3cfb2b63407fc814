"""Worker for the 2-process multi-host test (run as a subprocess).

Proves the multi-host plumbing end to end on CPU: rendezvous via
``maybe_initialize_distributed`` (env contract), rank-sharded sampling,
global-batch assembly from process-local slices, a pjit train step whose
gradient all-reduce spans processes, and the eval metric gather.
"""

import json
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)  # 2 local devices -> 4 global

sys.path.insert(0, os.environ['VIDAR_REPO'])

from vidar_tpu.parallel import (maybe_initialize_distributed, make_mesh,
                                global_batch_from_local, put_replicated,
                                process_gather_objects)
from vidar_tpu.data.samplers import GroupShuffleSampler, contiguous_shard

assert maybe_initialize_distributed(), 'env rendezvous not picked up'

import jax.numpy as jnp
import numpy as np
import optax

out_path = sys.argv[1]
rank = jax.process_index()
world = jax.process_count()
assert world == 2, world
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()

mesh = make_mesh()
assert mesh.shape['data'] == 4

# --- rank-sharded sampling: per-rank streams must partition the dataset
sampler = GroupShuffleSampler(np.zeros(8, np.int64), rank=rank,
                              world_size=world, seed=0)
my_idx = sampler.epoch_indices(0)
all_idx = process_gather_objects(my_idx)
union = sorted(i for part in all_idx for i in part)
assert union == list(range(8)), union

# --- global batch assembly: 4 global samples, 2 local per process
data = np.arange(16, dtype=np.float32).reshape(4, 4)  # the GLOBAL batch
target = np.ones((4, 1), np.float32)
local = {'x': data[rank * 2:(rank + 1) * 2],
         'y': target[rank * 2:(rank + 1) * 2]}
batch = global_batch_from_local(local, mesh)
assert batch['x'].shape == (4, 4)
total = jax.jit(lambda b: b['x'].sum())(batch)
assert float(total) == float(data.sum()), float(total)

# --- one DP train step: replicated params, batch-sharded data; XLA emits
# the cross-process gradient reduction from the shardings alone
w0 = np.full((4, 1), 0.5, np.float32)
params = put_replicated({'w': jnp.asarray(w0)}, mesh)
tx = optax.sgd(0.1)
opt_state = jax.tree.map(
    lambda s: put_replicated(jnp.zeros(s.shape, s.dtype), mesh),
    jax.eval_shape(tx.init, {'w': jnp.zeros((4, 1), jnp.float32)}))

from jax.sharding import NamedSharding, PartitionSpec as P


@jax.jit
def step(params, opt_state, batch):
    def loss_fn(p):
        pred = batch['x'] @ p['w']
        return jnp.mean((pred - batch['y']) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


params, opt_state, loss = step(params, opt_state, batch)
w_after = np.asarray(params['w'])

# the single-process reference: identical math on the full batch
wr = w0.copy()
pred = data @ wr
grad = 2.0 * data.T @ (pred - target) / 4.0
wr_ref = wr - 0.1 * grad
np.testing.assert_allclose(w_after, wr_ref, rtol=1e-5)

# --- eval-style gather: contiguous shard + object gather preserves order
my_block = contiguous_shard(6, rank, world)
blocks = process_gather_objects(my_block)
assert [i for b in blocks for i in b] == list(range(6))

with open(out_path + f'.rank{rank}', 'w') as f:
    json.dump({'rank': rank, 'loss': float(loss),
               'w': w_after.ravel().tolist()}, f)
print('MH_OK', rank)
