"""UniAD clip training: persistent track queries over a 2-frame clip with
ClipMatcher identity, velo-compensated refs, MemoryBank + QIM propagation
(reference uniad_track.py:547-633 forward_track_train)."""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from vidar_tpu.uniad import UniAD
from vidar_tpu.uniad.loss import UniADTargets
from vidar_tpu.train.step import create_train_state, make_uniad_train_step
from vidar_tpu.data import make_synthetic_batch


def _tiny_model():
    return UniAD(embed_dims=32, bev_h=8, bev_w=8, num_cams=3,
                 num_query=16, num_seg_query=12, backbone_depth=50,
                 predict_steps=4, predict_modes=2, occ_n_future=1,
                 memory_len=2,
                 latent_render_lids=(1,),
                 latent_render_cfg=dict(embed_dims=32, pred_height=4,
                                        grid_num=8, grid_step=0.5,
                                        reduction=8, act='sigmoid',
                                        num_pred_fcs=0))


def _clip_targets(rng, tc=2, g=6, gm=4, t_m=4, tp=6, to_=2, hw=(8, 8)):
    hh, ww = hw
    boxes = np.zeros((1, g, 9), np.float32)
    boxes[0, :, :2] = rng.uniform(-20, 20, (g, 2))
    boxes[0, :, 3:6] = rng.uniform(1, 4, (g, 3))

    # clip gt: same instances drifting ~1 m/frame, consistent ids
    tb = np.zeros((1, tc, g, 10), np.float32)
    tl = np.zeros((1, tc, g), np.int32)
    tid = np.full((1, tc, g), -1, np.int32)
    tnum = np.full((1, tc), g - 1, np.int32)
    from vidar_tpu.data.uniad_data import UniADDataset
    for t in range(tc):
        b9 = boxes[0].copy()
        b9[:, 0] += t * 1.0
        tb[0, t] = UniADDataset._normalize_np(b9)
        tl[0, t] = rng.integers(0, 5, g)
        tid[0, t] = np.arange(g) + 100
    l2g_r = np.tile(np.eye(3, dtype=np.float32), (1, tc, 1, 1))
    l2g_t = np.zeros((1, tc, 3), np.float32)
    ts = np.arange(tc, dtype=np.float32)[None] * 0.5

    return UniADTargets(
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(tl[:, -1]),
        num_valid_gt=jnp.asarray(np.array([g - 1], np.int32)),
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
        track_boxes=jnp.asarray(tb),
        track_labels=jnp.asarray(tl),
        track_ids=jnp.asarray(tid),
        track_num=jnp.asarray(tnum),
        l2g_r=jnp.asarray(l2g_r),
        l2g_t=jnp.asarray(l2g_t),
        timestamp=jnp.asarray(ts),
    )


def test_uniad_clip_train_step():
    model = _tiny_model()
    rng = np.random.default_rng(0)
    # queue_length=1 -> 2 image frames = the clip
    frames = make_synthetic_batch(rng, bs=1, queue_length=1, future_length=1,
                                  num_cams=3, img_h=64, img_w=64,
                                  max_points=32)
    targets = _clip_targets(rng, tc=frames.images.shape[1])
    command = jnp.zeros((1,), jnp.int32)

    prev_bev = jnp.zeros((1, 64, 32))
    has_prev = jnp.zeros((1,), bool)
    key = jax.random.PRNGKey(0)
    params = model.init(key, frames, None, prev_bev, has_prev, command,
                        with_masks=True)

    state = create_train_state(params, optax.adamw(1e-4))
    step = make_uniad_train_step(model)
    state2, metrics = step(state, (frames, targets, command),
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['track.loss']))
    assert float(metrics['grad_norm']) > 0


def test_clip_forward_propagates_identity():
    """Across the clip, slots matched to a gt id on frame 0 keep it on
    frame 1 (the inheritance path, not re-birth)."""
    model = _tiny_model()
    rng = np.random.default_rng(1)
    frames = make_synthetic_batch(rng, bs=1, queue_length=1, future_length=1,
                                  num_cams=3, img_h=64, img_w=64,
                                  max_points=32)
    targets = _clip_targets(rng, tc=frames.images.shape[1])
    command = jnp.zeros((1,), jnp.int32)
    prev_bev = jnp.zeros((1, 64, 32))
    has_prev = jnp.zeros((1,), bool)
    params = model.init(jax.random.PRNGKey(0), frames, None, prev_bev,
                        has_prev, command, with_masks=True)

    from vidar_tpu.uniad.clip_matcher import FrameGT
    gt = FrameGT(boxes=targets.track_boxes, labels=targets.track_labels,
                 ids=targets.track_ids, num_valid=targets.track_num)
    track_losses, out, matched = model.apply(
        params, frames, gt, targets.l2g_r, targets.l2g_t,
        targets.timestamp, command, deterministic=True, with_masks=False,
        method=model.clip_forward,
        rngs={'dropout': jax.random.PRNGKey(2)})
    obj = np.asarray(out['tracks'].obj_idxes[0])
    m = np.asarray(matched[0])
    # every valid gt of the final frame is tracked by exactly one slot
    n_gt = int(targets.track_num[0, -1])
    matched_rows = sorted(m[m >= 0].tolist())
    assert matched_rows == list(range(n_gt))
    # matched slots carry the gt instance ids (identity, not slot index)
    ids = np.asarray(targets.track_ids[0, -1])
    for slot in np.nonzero(m >= 0)[0]:
        assert obj[slot] == ids[m[slot]]
    for k in track_losses.values():
        assert np.isfinite(float(k))
