"""Cross-stage orbax partial restore (mmcv load_state_dict(strict=False)
contract): overlapping subtrees load, mismatched/missing leaves keep init."""

import numpy as np
import jax.numpy as jnp

from vidar_tpu.core.checkpoint import (save_checkpoint, load_params_partial)
from vidar_tpu.train import create_train_state
import optax


def test_partial_restore(tmp_path):
    src_params = {'params': {
        'backbone': {'w': jnp.ones((4, 4)), 'b': jnp.ones((4,))},
        'future_head': {'w': jnp.full((3, 3), 7.0)},
    }}
    tx = optax.sgd(1e-3)
    state = create_train_state(src_params, tx)
    save_checkpoint(str(tmp_path / 'ckpt'), state)

    dst_params = {'params': {
        'backbone': {'w': jnp.zeros((4, 4)), 'b': jnp.zeros((4,))},
        'det_head': {'w': jnp.zeros((5, 5))},          # not in src
        'future_head': {'w': jnp.zeros((9, 9))},       # shape mismatch
    }}
    merged, n_ok, n_skip = load_params_partial(str(tmp_path / 'ckpt'),
                                               dst_params)
    assert n_ok == 2 and n_skip == 2
    np.testing.assert_array_equal(
        np.asarray(merged['params']['backbone']['w']), np.ones((4, 4)))
    np.testing.assert_array_equal(
        np.asarray(merged['params']['det_head']['w']), np.zeros((5, 5)))
    np.testing.assert_array_equal(
        np.asarray(merged['params']['future_head']['w']), np.zeros((9, 9)))
