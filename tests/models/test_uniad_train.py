"""Integrated UniAD training: dataset targets + weighted loss + train step."""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from vidar_tpu.uniad import UniAD
from vidar_tpu.uniad.loss import UniADTargets, uniad_loss
from vidar_tpu.train.step import create_train_state, make_uniad_train_step
from vidar_tpu.data import make_synthetic_batch


def _tiny_model():
    return UniAD(embed_dims=32, bev_h=8, bev_w=8, num_cams=3,
                 num_query=16, num_seg_query=12, backbone_depth=50,
                 predict_steps=4, predict_modes=2, occ_n_future=1,
                 latent_render_lids=(1,),
                 latent_render_cfg=dict(embed_dims=32, pred_height=4,
                                        grid_num=8, grid_step=0.5,
                                        reduction=8, act='sigmoid',
                                        num_pred_fcs=0))


def _tiny_targets(rng, g=6, gm=4, t_m=4, tp=6, to_=2, hw=(8, 8)):
    hh, ww = hw
    boxes = np.zeros((1, g, 9), np.float32)
    boxes[0, :, :2] = rng.uniform(-20, 20, (g, 2))
    boxes[0, :, 3:6] = rng.uniform(1, 4, (g, 3))
    return UniADTargets(
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.integers(0, 5, (1, g)).astype(np.int32)),
        num_valid_gt=jnp.asarray(np.array([g - 2], np.int32)),
        map_boxes=jnp.asarray(
            rng.uniform(0.2, 0.8, (1, gm, 4)).astype(np.float32)),
        map_labels=jnp.asarray(
            rng.integers(0, 3, (1, gm)).astype(np.int32)),
        num_valid_map=jnp.asarray(np.array([gm - 1], np.int32)),
        gt_traj=jnp.asarray(
            rng.normal(size=(1, g, t_m, 2)).astype(np.float32)),
        gt_traj_valid=jnp.asarray(np.ones((1, g, t_m), np.float32)),
        sdc_traj=jnp.asarray(
            rng.normal(size=(1, tp, 3)).astype(np.float32)),
        sdc_mask=jnp.asarray(np.ones((1, tp), np.float32)),
        gt_occ=jnp.asarray(
            (rng.uniform(size=(1, g, to_, hh, ww)) > 0.7)
            .astype(np.float32)),
        map_masks=jnp.asarray(
            (rng.uniform(size=(1, gm, hh, ww)) > 0.6)
            .astype(np.float32)),
    )


def test_uniad_loss_and_train_step():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    frames = make_synthetic_batch(rng, bs=1, queue_length=1, future_length=1,
                                  num_cams=3, img_h=64, img_w=64,
                                  max_points=32)
    targets = _tiny_targets(rng)
    command = jnp.zeros((1,), jnp.int32)

    prev_bev = jnp.zeros((1, 64, 32))
    has_prev = jnp.zeros((1,), bool)
    key = jax.random.PRNGKey(0)
    params = model.init(key, frames, None, prev_bev, has_prev, command,
                        with_masks=True)

    # standalone loss (with the thing-mask branch active)
    out = model.apply(params, frames, None, prev_bev, has_prev, command,
                      with_masks=True)
    total, losses = uniad_loss(out, targets,
                               task_loss_weight=dict(track=1.0, map=1.0,
                                                     motion=1.0, occ=1.0,
                                                     planning=1.0))
    assert np.isfinite(float(total))
    for k in ('track.loss', 'map.loss', 'motion.loss', 'occ.loss',
              'planning.loss'):
        assert np.isfinite(float(losses[k])), k

    # one integrated train step: loss finite, grads flow to every head
    state = create_train_state(params, optax.adamw(1e-4))
    step = make_uniad_train_step(model)
    state2, metrics = step(state, (frames, targets, command),
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['grad_norm']))
    assert float(metrics['grad_norm']) > 0


def test_uniad_dataset_targets(tmp_path):
    from tests.data.fake_nuscenes import make_fake_nuscenes
    from vidar_tpu.data.uniad_data import UniADDataset

    pkl = make_fake_nuscenes(str(tmp_path), num_samples=10, num_cams=2,
                             img_hw=(32, 48))
    ds = UniADDataset(pkl, queue_length=2, predict_steps=3,
                      planning_steps=3, occ_n_future=2, occ_size=(10, 10),
                      max_gt=8)
    assert len(ds) > 0
    frames, targets, command = ds[0]
    assert targets.gt_traj.shape == (1, 8, 3, 2)
    assert targets.gt_occ.shape == (1, 8, 2, 10, 10)
    assert targets.sdc_traj.shape == (1, 3, 3)
    # ego moves +x ~2 m/frame in the fixture; planning gt must see that
    assert float(targets.sdc_mask.sum()) > 0
    assert float(targets.sdc_traj[0, 0, 0]) > 0.5
    assert int(command[0]) in (0, 1, 2)
    # matched agents produce valid future trajectories
    assert float(targets.gt_traj_valid.sum()) > 0
