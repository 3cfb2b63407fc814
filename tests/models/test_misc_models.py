"""Smoke tests for auxiliary model components (VoVNet, GroupDETR, UniAD)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_vovnet_shapes():
    from vidar_tpu.models.vovnet import VoVNet
    m = VoVNet(spec='V-39-eSE')
    x = jnp.ones((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert len(outs) == 3
    # strides 8/16/32 relative to input
    assert outs[0].shape[1] == 8 and outs[2].shape[1] == 2


def test_group_detr_loss_keys():
    from vidar_tpu.models.detection import BEVFormerHeadGroupDETR
    head = BEVFormerHeadGroupDETR(num_classes=3, num_query=16, embed_dims=32,
                                  bev_h=4, bev_w=4, num_decoder_layers=2,
                                  group_detr=2, bbox_coder_max_num=8)
    bev = jnp.ones((1, 16, 32))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    gt = jnp.asarray([[[0.0, 0, 0, 1, 1, 1, 0, 0, 0]]])
    labels = jnp.zeros((1, 1), jnp.int32)
    losses = head.apply(params, preds, gt, labels, jnp.asarray([1]),
                        method=head.loss)
    assert np.isfinite(float(losses['loss_cls']))
    det = head.apply(params, preds, method=head.get_bboxes)
    assert det['bboxes'].shape[1] == 8


def test_uniad_tracker_births_and_deaths():
    from vidar_tpu.uniad.track import TrackInstances, RuntimeTracker
    cap, c, ncls = 8, 16, 3
    tr = TrackInstances.empty(cap, c, ncls,
                              jnp.zeros((cap, 2 * c)), jnp.zeros((cap, 3)))
    tr = tr.replace(scores=jnp.asarray(
        [0.9, 0.1, 0.8, 0.0, 0.0, 0.0, 0.0, 0.0]))
    tracker = RuntimeTracker(score_thresh=0.5, filter_score_thresh=0.4,
                             miss_tolerance=2)
    tr = tracker.update(tr)
    ids = np.asarray(tr.obj_idxes)
    assert ids[0] == 0 and ids[2] == 1 and ids[1] == -1
    assert int(tr.next_obj_id) == 2
    # weak track dies after miss_tolerance updates
    tr = tr.replace(scores=jnp.zeros((cap,)))
    tr = tracker.update(tr)
    tr = tracker.update(tr)
    ids = np.asarray(tr.obj_idxes)
    assert ids[0] == -1 and ids[2] == -1


def test_sine_positional_encoding():
    from vidar_tpu.models.position_embedding import sine_positional_encoding
    pos = sine_positional_encoding(4, 6, num_feats=8)
    assert pos.shape == (4, 6, 16)
    assert np.isfinite(np.asarray(pos)).all()
