"""Functional torch oracle: caffe-BN ResNet-DCN + mmdet-FPN forward.

Consumes an mmdet-style ``state_dict`` (the exact key schema of
``r101_dcn_fcos3d_pretrain.pth`` — reference config
projects/configs/vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_3future.py:88-106)
and reproduces the reference backbone semantics in plain torch (no
mmcv/torchvision): caffe-style bottlenecks (stride on conv1), frozen BN
(eval-mode running stats), DCNv2 (modulated deformable conv, mmcv
ModulatedDeformConv2dPack offset/mask layout: [y1,x1..y9,x9,m1..m9]), torch
MaxPool2d(3,2,1) stem, and mmdet FPN (1x1 biased laterals, nearest 2x
top-down, 3x3 biased outputs, extra stride-2 conv on relu(last output)).

Used by tests/models/test_backbone_oracle.py to verify that a reference
``.pth`` imported through ``import_torch_checkpoint`` yields the same
feature maps from our NHWC/folded-BN/Pallas-free flax stack.
"""

import numpy as np
import torch
import torch.nn.functional as F

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
BN_EPS = 1e-5


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]).copy()).float()


def frozen_bn(x, sd, pfx):
    g = _t(sd, f'{pfx}.weight')
    b = _t(sd, f'{pfx}.bias')
    rm = _t(sd, f'{pfx}.running_mean')
    rv = _t(sd, f'{pfx}.running_var')
    scale = g / torch.sqrt(rv + BN_EPS)
    return x * scale[None, :, None, None] + (b - rm * scale)[None, :, None,
                                                             None]


def _bilinear_zero(x, py, px):
    """Bilinear sample with zero padding outside.

    x: [B, C, H, W]; py/px: [B, K, Ho, Wo] absolute pixel coords.
    Returns [B, C, K, Ho, Wo].
    """
    b, c, h, w = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    out = 0.0
    flat = x.reshape(b, c, h * w)
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            wgt = ((1 - torch.abs(py - yy)) * (1 - torch.abs(px - xx)))
            valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).float()
            idx = (yy.clamp(0, h - 1) * w + xx.clamp(0, w - 1)).long()
            g = torch.gather(
                flat, 2,
                idx.reshape(b, 1, -1).expand(b, c, -1))
            out = out + g.reshape(b, c, *py.shape[1:]) * (wgt * valid)[:,
                                                                       None]
    return out


def dcnv2(x, sd, pfx, stride=1, dilation=1):
    """mmcv ModulatedDeformConv2dPack: offsets/masks from `conv_offset`,
    then 3x3 modulated deformable conv with `weight` (no bias)."""
    w_off = _t(sd, f'{pfx}.conv_offset.weight')
    b_off = _t(sd, f'{pfx}.conv_offset.bias')
    om = F.conv2d(x, w_off, b_off, stride=stride, padding=dilation,
                  dilation=dilation)
    k2 = 9
    off = om[:, :2 * k2]
    mask = torch.sigmoid(om[:, 2 * k2:])
    b, _, ho, wo = om.shape

    gy, gx = torch.meshgrid(torch.arange(ho).float() * stride,
                            torch.arange(wo).float() * stride,
                            indexing='ij')
    taps_y, taps_x = torch.meshgrid(
        torch.arange(3).float() * dilation - dilation,
        torch.arange(3).float() * dilation - dilation, indexing='ij')
    py = (gy[None, None] + taps_y.reshape(1, k2, 1, 1) +
          off[:, 0::2])
    px = (gx[None, None] + taps_x.reshape(1, k2, 1, 1) +
          off[:, 1::2])
    samp = _bilinear_zero(x, py, px) * mask[:, None]
    w = _t(sd, f'{pfx}.weight')  # [O, C, 3, 3]
    return torch.einsum('bckij,ock->boij',
                        samp.reshape(b, x.shape[1], k2, ho, wo),
                        w.reshape(w.shape[0], w.shape[1], k2))


def bottleneck(x, sd, pfx, stride, dcn, dilation=1):
    h = F.conv2d(x, _t(sd, f'{pfx}.conv1.weight'), stride=stride)
    h = F.relu(frozen_bn(h, sd, f'{pfx}.bn1'))
    if dcn:
        h = dcnv2(h, sd, f'{pfx}.conv2', stride=1, dilation=dilation)
    else:
        h = F.conv2d(h, _t(sd, f'{pfx}.conv2.weight'), stride=1,
                     padding=dilation, dilation=dilation)
    h = F.relu(frozen_bn(h, sd, f'{pfx}.bn2'))
    h = F.conv2d(h, _t(sd, f'{pfx}.conv3.weight'))
    h = frozen_bn(h, sd, f'{pfx}.bn3')
    if f'{pfx}.downsample.0.weight' in sd:
        idn = F.conv2d(x, _t(sd, f'{pfx}.downsample.0.weight'),
                       stride=stride)
        idn = frozen_bn(idn, sd, f'{pfx}.downsample.1')
    else:
        idn = x
    return F.relu(h + idn)


def resnet_forward(x, sd, depth=101,
                   stage_with_dcn=(False, False, True, True),
                   out_indices=(1, 2, 3), prefix='img_backbone.'):
    """x: [B, 3, H, W] caffe-normalised BGR. Returns list of NCHW maps."""
    h = F.conv2d(x, _t(sd, f'{prefix}conv1.weight'), stride=2, padding=3)
    h = F.relu(frozen_bn(h, sd, f'{prefix}bn1'))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    outs = []
    for stage, nblocks in enumerate(ARCH[depth]):
        for i in range(nblocks):
            h = bottleneck(h, sd, f'{prefix}layer{stage + 1}.{i}',
                           stride=(2 if stage > 0 and i == 0 else 1),
                           dcn=stage_with_dcn[stage])
        if stage in out_indices:
            outs.append(h)
    return outs


def fpn_forward(feats, sd, num_outs=4, prefix='img_neck.'):
    """mmdet FPN with add_extra_convs='on_output', relu_before_extra_convs."""
    laterals = [
        F.conv2d(f, _t(sd, f'{prefix}lateral_convs.{i}.conv.weight'),
                 _t(sd, f'{prefix}lateral_convs.{i}.conv.bias'))
        for i, f in enumerate(feats)]
    for i in range(len(laterals) - 1, 0, -1):
        up = F.interpolate(laterals[i], scale_factor=2, mode='nearest')
        up = up[:, :, :laterals[i - 1].shape[2], :laterals[i - 1].shape[3]]
        laterals[i - 1] = laterals[i - 1] + up
    outs = [
        F.conv2d(l, _t(sd, f'{prefix}fpn_convs.{i}.conv.weight'),
                 _t(sd, f'{prefix}fpn_convs.{i}.conv.bias'), padding=1)
        for i, l in enumerate(laterals)]
    for i in range(len(feats), num_outs):
        outs.append(F.conv2d(
            F.relu(outs[-1]),
            _t(sd, f'{prefix}fpn_convs.{i}.conv.weight'),
            _t(sd, f'{prefix}fpn_convs.{i}.conv.bias'),
            stride=2, padding=1))
    return outs


def make_backbone_state_dict(rng, depth=50,
                             stage_with_dcn=(False, False, True, True),
                             fpn_in=(512, 1024, 2048), fpn_out=256,
                             num_outs=4, scale=0.05):
    """Random reference-shaped state_dict (mmdet key schema) for the
    backbone + neck — the synthetic stand-in for
    ``r101_dcn_fcos3d_pretrain.pth`` in this data-less environment."""
    sd = {}

    def conv(k, o, c, kh, kw):
        sd[k] = rng.standard_normal((o, c, kh, kw)).astype(np.float32) * scale

    def bn(pfx, c):
        sd[f'{pfx}.weight'] = 1.0 + 0.1 * rng.standard_normal(c).astype(
            np.float32)
        sd[f'{pfx}.bias'] = 0.1 * rng.standard_normal(c).astype(np.float32)
        sd[f'{pfx}.running_mean'] = 0.1 * rng.standard_normal(c).astype(
            np.float32)
        sd[f'{pfx}.running_var'] = (
            0.5 + rng.random(c).astype(np.float32))

    conv('img_backbone.conv1.weight', 64, 3, 7, 7)
    bn('img_backbone.bn1', 64)
    cin = 64
    for stage, nblocks in enumerate(ARCH[depth]):
        mid = 64 * 2 ** stage
        cout = mid * 4
        for i in range(nblocks):
            pfx = f'img_backbone.layer{stage + 1}.{i}'
            conv(f'{pfx}.conv1.weight', mid, cin if i == 0 else cout, 1, 1)
            bn(f'{pfx}.bn1', mid)
            if stage_with_dcn[stage]:
                conv(f'{pfx}.conv2.weight', mid, mid, 3, 3)
                conv(f'{pfx}.conv2.conv_offset.weight', 27, mid, 3, 3)
                # small random offsets exercise the bilinear path without
                # leaving the zero-init regime entirely
                sd[f'{pfx}.conv2.conv_offset.weight'] *= 0.02
                sd[f'{pfx}.conv2.conv_offset.bias'] = (
                    0.1 * rng.standard_normal(27).astype(np.float32))
            else:
                conv(f'{pfx}.conv2.weight', mid, mid, 3, 3)
            bn(f'{pfx}.bn2', mid)
            conv(f'{pfx}.conv3.weight', cout, mid, 1, 1)
            bn(f'{pfx}.bn3', cout)
            if i == 0:
                conv(f'{pfx}.downsample.0.weight', cout, cin, 1, 1)
                bn(f'{pfx}.downsample.1', cout)
        cin = cout
    for i, c in enumerate(fpn_in):
        conv(f'img_neck.lateral_convs.{i}.conv.weight', fpn_out, c, 1, 1)
        sd[f'img_neck.lateral_convs.{i}.conv.bias'] = (
            0.1 * rng.standard_normal(fpn_out).astype(np.float32))
    for i in range(num_outs):
        conv(f'img_neck.fpn_convs.{i}.conv.weight', fpn_out, fpn_out, 3, 3)
        sd[f'img_neck.fpn_convs.{i}.conv.bias'] = (
            0.1 * rng.standard_normal(fpn_out).astype(np.float32))
    return sd
