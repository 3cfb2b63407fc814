"""Fine-tune smoke: tiny BEVFormer detection train step + NMS-free decode
(the reference §3.4 path: frozen+backwarded history, DETR head, Hungarian
loss)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.models import BEVFormer
from vidar_tpu.data import make_synthetic_batch
from vidar_tpu.data.structures import DetBatch
from vidar_tpu.train import (create_train_state, make_optimizer,
                             make_det_train_step)

TINY = dict(
    embed_dims=32,
    bev_h=12,
    bev_w=12,
    num_cams=3,
    num_classes=10,
    num_query=24,
    backbone_depth=50,
    backbone_dcn=(False, False, True, True),
    backwarded_prev_frame_num=1,
    encoder_num_layers=2,
    latent_render_lids=(1,),
    latent_render_cfg=dict(pred_height=4, grid_num=8, grid_step=0.5,
                           reduction=8, act='sigmoid', embed_dims=32),
)


def make_det_batch(rng, max_gt=8):
    frames = make_synthetic_batch(rng, bs=1, queue_length=2, future_length=0,
                                  num_cams=3, img_h=64, img_w=64,
                                  max_points=64)
    g = 3
    gt = np.zeros((1, max_gt, 9), np.float32)
    gt[0, :g, :2] = rng.uniform(-30, 30, (g, 2))
    gt[0, :g, 2] = rng.uniform(-1, 1, g)
    gt[0, :g, 3:6] = rng.uniform(1, 4, (g, 3))
    gt[0, :g, 6] = rng.uniform(-np.pi, np.pi, g)
    labels = np.zeros((1, max_gt), np.int32)
    labels[0, :g] = rng.integers(0, 10, g)
    return DetBatch(frames=frames,
                    gt_bboxes=jnp.asarray(gt),
                    gt_labels=jnp.asarray(labels),
                    num_valid_gt=jnp.asarray(np.array([g], np.int32)))


@pytest.fixture(scope='module')
def setup():
    rng = np.random.default_rng(0)
    batch = make_det_batch(rng)
    model = BEVFormer(**TINY)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'dropout': key, 'aug': key},
                        batch.frames, train=False)
    return model, params, batch


def test_det_train_step(setup):
    model, params, batch = setup
    tx, _ = make_optimizer(params, base_lr=1e-4, total_steps=10)
    state = create_train_state(params, tx)
    step = make_det_train_step(model, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
    assert float(metrics['grad_norm']) > 0
    assert any(k.startswith('loss_cls') for k in metrics)
    assert int(state2.step) == 1
    # a second step with donated state still runs (params updated)
    state3, m2 = step(state2, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2['loss']))


def test_det_decode(setup):
    model, params, batch = setup
    preds = model.apply(params, batch.frames, train=False)
    det = model.apply(params, preds, method=model.get_bboxes)
    assert det['bboxes'].shape[-1] == 9
    assert np.isfinite(np.asarray(det['scores'])).all()
    assert (np.asarray(det['labels']) >= 0).all()
