"""Backbone-through-neck parity against imported torch weights.

The last link of the parity chain (VERDICT round-2 Missing #2): a
reference-shaped ``.pth`` (the ``load_from`` contract —
``r101_dcn_fcos3d_pretrain.pth``, reference config
vidar_1_8_nusc_3future.py:88-106,400) imported via the REAL
``import_torch_checkpoint`` path must produce the same caffe-BN
ResNet-DCN + FPN feature maps from our NHWC flax stack as the torch oracle
computes from the raw state_dict. Covers: BN folding (scale/bias), caffe
stride-on-conv1 bottlenecks, MaxPool padding, DCNv2 offset/mask layout +
zero-padded bilinear edges, FPN laterals/nearest-2x/extra-conv.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vidar_tpu.models.resnet import ResNet
from vidar_tpu.models.fpn import FPN
from vidar_tpu.core.checkpoint import import_torch_checkpoint

from tests.models.torch_backbone_oracle import (
    make_backbone_state_dict, resnet_forward, fpn_forward)

DEPTH = 50  # identical block/mapping semantics as 101, 2.1x fewer blocks
DCN = (False, False, True, True)


@pytest.fixture(scope='module')
def imported():
    rng = np.random.default_rng(7)
    sd = make_backbone_state_dict(rng, depth=DEPTH, stage_with_dcn=DCN)

    img = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)

    backbone = ResNet(depth=DEPTH, out_indices=(1, 2, 3), frozen_stages=1,
                      stage_with_dcn=DCN)
    neck = FPN(out_channels=256, num_outs=4)
    feats_shapes = [(1, 8, 12, 512), (1, 4, 6, 1024), (1, 2, 3, 2048)]
    params = {'params': {
        'img_backbone': backbone.init(
            jax.random.PRNGKey(0), jnp.asarray(img))['params'],
        'img_neck': neck.init(
            jax.random.PRNGKey(1),
            [jnp.zeros(s, jnp.float32) for s in feats_shapes])['params'],
    }}
    return sd, img, backbone, neck, params


def test_pth_import_backbone_fpn_parity(imported, tmp_path):
    sd, img, backbone, neck, params = imported
    # write a reference-shaped .pth and import through the real shim
    pth = str(tmp_path / 'r50_dcn_synthetic.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v.copy())
                               for k, v in sd.items()}}, pth)
    params = import_torch_checkpoint(pth, params, depth=DEPTH,
                                     stage_with_dcn=DCN)

    feats = backbone.apply({'params': params['params']['img_backbone']},
                           jnp.asarray(img))
    outs = neck.apply({'params': params['params']['img_neck']}, feats)

    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
    ref_feats = resnet_forward(x_t, sd, depth=DEPTH, stage_with_dcn=DCN)
    ref_outs = fpn_forward(ref_feats, sd, num_outs=4)

    assert len(feats) == len(ref_feats) == 3
    for lvl, (ours, ref) in enumerate(zip(feats, ref_feats)):
        r = ref.detach().numpy().transpose(0, 2, 3, 1)
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(ours), r, atol=1e-3 * scale, rtol=1e-3,
            err_msg=f'backbone stage {lvl + 2} feature mismatch')

    assert len(outs) == len(ref_outs) == 4
    for lvl, (ours, ref) in enumerate(zip(outs, ref_outs)):
        r = ref.detach().numpy().transpose(0, 2, 3, 1)
        scale = max(np.abs(r).max(), 1e-6)
        np.testing.assert_allclose(
            np.asarray(ours), r, atol=1e-3 * scale, rtol=1e-3,
            err_msg=f'FPN level {lvl} mismatch')


def test_dcn_offsets_leave_zero_regime(imported):
    """The synthetic weights must actually exercise fractional bilinear
    sampling (non-integer offsets), or the edge-handling parity is vacuous."""
    sd, img, *_ = imported
    x_t = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
    feats = resnet_forward(x_t, sd, depth=DEPTH, stage_with_dcn=DCN)
    # recompute stage-3 first DCN offsets: must be non-integer somewhere
    import torch.nn.functional as F
    from tests.models.torch_backbone_oracle import frozen_bn, _t
    h = F.conv2d(x_t, _t(sd, 'img_backbone.conv1.weight'), stride=2,
                 padding=3)
    h = F.relu(frozen_bn(h, sd, 'img_backbone.bn1'))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    from tests.models.torch_backbone_oracle import bottleneck
    for i in range(3):
        h = bottleneck(h, sd, f'img_backbone.layer1.{i}', stride=1,
                       dcn=False)
    for i in range(4):
        h = bottleneck(h, sd, f'img_backbone.layer2.{i}',
                       stride=2 if i == 0 else 1, dcn=False)
    h1 = F.conv2d(h, _t(sd, 'img_backbone.layer3.0.conv1.weight'), stride=2)
    h1 = F.relu(frozen_bn(h1, sd, 'img_backbone.layer3.0.bn1'))
    om = F.conv2d(h1, _t(sd, 'img_backbone.layer3.0.conv2.conv_offset.weight'),
                  _t(sd, 'img_backbone.layer3.0.conv2.conv_offset.bias'),
                  padding=1)
    off = om[:, :18].detach().numpy()
    assert np.abs(off - np.round(off)).max() > 1e-3
    assert all(f.shape[1] > 0 for f in feats)
