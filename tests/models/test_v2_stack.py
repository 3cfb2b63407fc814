"""Registered-but-unused reference stack (SURVEY §2.2 last row):
BEVFormerV2 / ResNetFusion / BEVHead+Anchor3DHead / GroupMultiheadAttention /
InternImage / layer-decay optimizer / BEVFormerFP16."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.data import make_synthetic_batch


def test_group_multihead_attention_groups():
    from vidar_tpu.models.attention import GroupMultiheadAttention
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    m = GroupMultiheadAttention(embed_dims=16, num_heads=2, group=3)
    params = m.init({'params': jax.random.PRNGKey(0)}, x, deterministic=True)
    out_eval = m.apply(params, x, deterministic=True)
    out_train = m.apply(params, x, deterministic=False,
                        rngs={'dropout': jax.random.PRNGKey(1)})
    assert out_eval.shape == out_train.shape == x.shape
    # grouping changes the attention pattern vs full attention
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))
    # residual: zero-weight attention would return identity; outputs finite
    assert np.isfinite(np.asarray(out_train)).all()


def test_resnet_fusion():
    from vidar_tpu.models.bevformer_v2 import ResNetFusion
    rng = np.random.default_rng(0)
    maps = [jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
            for _ in range(3)]
    m = ResNetFusion(out_channels=16, inter_channels=48, num_layer=2)
    params = m.init(jax.random.PRNGKey(0), maps)
    out = m.apply(params, maps)
    assert out.shape == (1, 64, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope='module')
def v2_setup():
    from vidar_tpu.models.bevformer_v2 import BEVFormerV2
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=1, queue_length=2, future_length=0,
                                 num_cams=3, img_h=64, img_w=64,
                                 max_points=64)
    model = BEVFormerV2(embed_dims=32, bev_h=8, bev_w=8, num_cams=3,
                        num_query=16, backbone_depth=50,
                        backbone_dcn=(False, False, False, False),
                        frames=(-1, 0), num_fusion=1, encoder_num_layers=1)
    params = model.init({'params': jax.random.PRNGKey(0),
                         'dropout': jax.random.PRNGKey(1)}, batch,
                        train=False)
    return model, params, batch


def test_bevformer_v2_forward_and_loss(v2_setup):
    model, params, batch = v2_setup
    preds = model.apply(params, batch, train=False)
    assert preds['all_cls_scores'].shape[-1] == 10
    gt = jnp.zeros((1, 4, 9)).at[:, :, 3:6].set(2.0)
    labels = jnp.zeros((1, 4), jnp.int32)
    losses = model.apply(params, preds, gt, labels,
                         jnp.asarray([2], jnp.int32), method=model.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # mono-loss hook applies the weight
    losses2 = model.apply(params, preds, gt, labels,
                          jnp.asarray([2], jnp.int32),
                          dict(loss_fcos=jnp.asarray(2.0)),
                          method=model.loss)
    assert float(losses2['loss_fcos_mono']) == pytest.approx(2.0)


def test_bev_head_anchor3d():
    from vidar_tpu.models.bev_head import Anchor3DHead
    head = Anchor3DHead(num_classes=4, embed_dims=16,
                        pc_range=(-8, -8, -5, 8, 8, 3))
    bev = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 16)), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    cls_l, reg_p, dir_l, (h, w) = preds
    assert cls_l.shape == (2, 8 * 8 * head.num_anchors, 4)

    gt = jnp.zeros((2, 5, 9))
    gt = gt.at[:, :, 3:6].set(2.0)
    labels = jnp.zeros((2, 5), jnp.int32)
    nv = jnp.asarray([3, 0], jnp.int32)
    losses = head.apply(params, preds, gt, labels, nv, method=head.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = head.apply(params, preds, method=head.get_bboxes)
    assert det['bboxes'].shape[-1] == 9
    assert np.isfinite(np.asarray(det['bboxes'])).all()


def test_internimage_backbone():
    from vidar_tpu.models.internimage import InternImage
    m = InternImage(channels=16, depths=(1, 1, 1, 1), groups=(2, 2, 4, 4),
                    out_indices=(1, 2, 3))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert len(outs) == 3
    # strides 8/16/32
    assert outs[0].shape[1:3] == (8, 8)
    assert outs[1].shape[1:3] == (4, 4)
    assert outs[2].shape[1:3] == (2, 2)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_layer_decay_optimizer():
    from vidar_tpu.train.optim import (layer_decay_lr_mult,
                                       make_layer_decay_optimizer)
    depths = (2, 2)
    # stem shallowest -> smallest multiplier; head = 1.0
    m_stem = layer_decay_lr_mult('img_backbone/stem_conv1/kernel',
                                 depths=depths, decay_rate=0.9)
    m_blk0 = layer_decay_lr_mult('img_backbone/levels_0_blocks_0/x',
                                 depths=depths, decay_rate=0.9)
    m_blk_last = layer_decay_lr_mult('img_backbone/levels_1_blocks_1/x',
                                     depths=depths, decay_rate=0.9)
    m_head = layer_decay_lr_mult('det_head/fc/kernel', depths=depths,
                                 decay_rate=0.9)
    assert m_stem < m_blk0 < m_blk_last < m_head == pytest.approx(1.0)

    params = {'params': {
        'img_backbone': {'stem_conv1': {'kernel': jnp.ones((3,))},
                         'levels_0_blocks_0': {'w': jnp.ones((3,))}},
        'det_head': {'fc': {'kernel': jnp.ones((3,))}}}}
    tx, _ = make_layer_decay_optimizer(params, depths=depths,
                                       decay_rate=0.9, total_steps=10)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    leaves = jax.tree.leaves(updates)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_fp16_variant_dtype():
    from vidar_tpu.models import BEVFormer
    from vidar_tpu.models.bevformer import BEVFormerFP16
    assert BEVFormerFP16(bev_h=4, bev_w=4).dtype == jnp.bfloat16
    assert BEVFormer(bev_h=4, bev_w=4).dtype is None
