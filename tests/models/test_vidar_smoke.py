"""End-to-end smoke: tiny ViDAR init + train forward/loss + eval decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.models import ViDAR
from vidar_tpu.data import make_synthetic_batch

TINY = dict(
    embed_dims=32,
    bev_h=16,
    bev_w=16,
    num_cams=3,
    backbone_depth=50,
    backbone_dcn=(False, False, True, True),
    future_pred_frame_num=1,
    test_future_frame_num=2,
    history_queue_length=2,
    pred_history_frame_num=1,
    pred_future_frame_num=1,
    per_frame_loss_weight=(0.5, 1.0, 1.2),
    loss_weight=((1,), (1,), (0,)),
    num_pred_height=4,
    ray_grid_num=16,
    ray_grid_step=1.0,
    decoder_num_layers=2,
    encoder_num_layers=2,
    latent_render_lids=(1,),
    latent_render_cfg=dict(pred_height=4, grid_num=8, grid_step=0.5,
                           reduction=8, act='sigmoid', embed_dims=32),
)


@pytest.fixture(scope='module')
def model_and_batch():
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(
        rng, bs=1, queue_length=2, future_length=2, num_cams=3,
        img_h=64, img_w=64, max_points=128)
    model = ViDAR(**TINY)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {'params': key, 'dropout': key}, batch, train=False)
    return model, params, batch


def test_eval_forward(model_and_batch):
    model, params, batch = model_and_batch
    out = model.apply(params, batch, train=False)
    p = np.asarray(out['pred_dist'])
    g = np.asarray(out['gt_dist'])
    assert p.shape == g.shape == (1, 128)
    valid = np.asarray(out['frame_idx'])[0] >= 0
    assert valid.any()
    assert np.isfinite(p[0][valid]).all()
    assert (g[0][valid] > 0).all()


def test_train_losses_finite(model_and_batch):
    model, params, batch = model_and_batch
    key = jax.random.PRNGKey(1)
    losses, aux = model.apply(
        params, batch, train=True,
        rngs={'dropout': key, 'aug': key}, gumbel_rng=key)
    assert any('regularization' in k for k in losses)
    assert any('dense_voxel' in k for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f'{k} not finite'


def test_train_grads_nonzero(model_and_batch):
    model, params, batch = model_and_batch
    key = jax.random.PRNGKey(2)

    def loss_fn(p):
        losses, _ = model.apply(p, batch, train=True,
                                rngs={'dropout': key, 'aug': key},
                                gumbel_rng=key)
        return sum(jax.tree.leaves(losses))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert total > 0
