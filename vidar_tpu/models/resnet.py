"""ResNet (caffe-style) with DCNv2 stages — NHWC, frozen BatchNorm.

Capability match for the reference's mmdet ResNet-101 backbone config
(projects/configs/vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_3future.py:88-98):
depth 101, out_indices (1,2,3), frozen_stages=1, BN frozen + eval, caffe style
(stride-2 on the bottleneck's first 1x1 conv), DCNv2 (modulated deformable
conv, deform_groups=1) replacing the 3x3 conv in stages 3-4.

TPU-native choices:
  * NHWC layout, bf16-friendly convs via ``nn.Conv`` (XLA conv → MXU).
  * BatchNorm is *always* frozen in the reference, so it is folded into a
    per-channel affine (scale, bias); the checkpoint import shim computes
    scale = gamma/sqrt(var+eps), bias = beta - mean*scale.
  * DCNv2 is a 9-tap bilinear gather (offsets+masks from a zero-init conv)
    followed by a dense [9*Cin -> Cout] matmul — the gather reuses the same
    formulation as our deformable attention; no CUDA im2col.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

ARCH_SETTINGS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def _conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class FrozenBN(nn.Module):
    """Frozen BatchNorm folded to y = x * scale + bias."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class DeformConv2d(nn.Module):
    """Modulated deformable conv (DCNv2), 3x3, deform_groups=1.

    offsets/masks come from a zero-initialised regular conv (mmcv
    ModulatedDeformConv2dPack convention), so at init this is an ordinary 3x3
    conv with 0.5 modulation.
    """
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from ..ops.gather import pack_corners_2d, bilinear_weights, take_rows

        b, h, w, c_in = x.shape
        k = 3
        d = self.dilation
        s = self.stride
        ho, wo = h // s, w // s

        off_mask = nn.Conv(3 * k * k, (k, k), strides=(s, s),
                           padding=[(d, d), (d, d)],
                           kernel_dilation=(d, d),
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           dtype=self.dtype, name='conv_offset')(x)
        # mmcv layout: [o1_y, o1_x, ..., o9_y, o9_x, m1..m9] along channels.
        off = off_mask[..., :2 * k * k].astype(jnp.float32)
        mask = jax.nn.sigmoid(off_mask[..., 2 * k * k:].astype(jnp.float32))
        off = off.reshape(b, ho, wo, k * k, 2)  # (dy, dx) per tap

        # base sampling grid per tap
        ys = jnp.arange(ho, dtype=jnp.float32) * s
        xs = jnp.arange(wo, dtype=jnp.float32) * s
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')  # [ho, wo]
        ky, kx = jnp.meshgrid(
            jnp.arange(k, dtype=jnp.float32) * d - d,
            jnp.arange(k, dtype=jnp.float32) * d - d, indexing='ij')
        ky = ky.reshape(-1)
        kx = kx.reshape(-1)

        sy = (gy[None, :, :, None] + ky + off[..., 0]).reshape(b, -1)
        sx = (gx[None, :, :, None] + kx + off[..., 1]).reshape(b, -1)

        import os
        from ..ops.dcn_pallas import (dcn_sample, dcn_sample_available,
                                      dcn_sample16, dcn_sample16_available,
                                      dcn_conv16, dcn_conv16_available,
                                      dcn16_channel_perm)
        flag16 = os.environ.get('VIDAR_TPU_DCN16', '1')
        use16 = (flag16 != '0' and x.dtype == jnp.bfloat16 and
                 dcn_sample16_available(h, w, c_in) and
                 (jax.default_backend() != 'cpu' or flag16 == 'force'))
        if use16:
            # u32 channel-pair Pallas kernel: whole per-image zero-ring
            # feature table VMEM-resident, 4 single-row loads per tap
            # (see ops/dcn_pallas.py). Per-tap channels come out
            # (evens || odds) — fold that fixed permutation into the conv
            # kernel instead of transposing the 9x-fat tap tensor.
            kernel = self.param('kernel', _conv_kernel_init,
                                (k * k * c_in, self.features))
            perm = jnp.asarray(dcn16_channel_perm(c_in), jnp.int32)
            kperm = kernel.reshape(k * k, c_in, self.features)[:, perm]
            kperm = kperm.reshape(k * k * c_in, self.features)
            if dcn_conv16_available(h, w, c_in, self.features):
                # fully fused: the [B, Q, 9*C] tap tensor never touches
                # HBM (fwd round-trip + train-step liveness both gone)
                out = dcn_conv16(x, sx.reshape(b, ho * wo, k * k),
                                 sy.reshape(b, ho * wo, k * k),
                                 mask.reshape(b, ho * wo, k * k),
                                 kperm.astype(jnp.bfloat16))
                return out.reshape(b, ho, wo, self.features).astype(x.dtype)
            sampled = dcn_sample16(x, sx.reshape(b, ho * wo, k * k),
                                   sy.reshape(b, ho * wo, k * k),
                                   mask.reshape(b, ho * wo, k * k))
            sampled = sampled.reshape(b, ho, wo, k * k * c_in).astype(x.dtype)
            return sampled @ kperm.astype(x.dtype)
        # Off by default: at bf16 model precision the 2KB-row take path
        # measures faster (11.4 vs 18.6 ms at stage-3 shapes) because the
        # Pallas table must be f32 (see ops/dcn_pallas.py). Kept as an
        # opt-in for f32 models / future bf16-table support.
        if os.environ.get('VIDAR_TPU_DCN_PALLAS') and \
                dcn_sample_available(h, w, c_in) and \
                jax.default_backend() != 'cpu':
            # fused Pallas tap sampling: whole packed sample fetched as
            # aligned (8,128) tiles from a VMEM-resident table
            sampled = dcn_sample(x, sx.reshape(b, ho * wo, k * k),
                                 sy.reshape(b, ho * wo, k * k),
                                 mask.reshape(b, ho * wo, k * k))
            sampled = sampled.reshape(b, ho, wo, k * k, c_in).astype(x.dtype)
        else:
            # packed-corner single-row gather (see ops/gather.py)
            packed = pack_corners_2d(x)  # [b, (h+1)(w+1), 4*C]
            rows = packed.shape[1]
            row, cw = bilinear_weights(sx, sy, h, w)  # [b, N], [b, N, 4]
            offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
            g = take_rows(packed.reshape(b * rows, 4 * c_in), row + offs)
            g = g.reshape(b, ho * wo * k * k, 4, c_in)
            sampled = jnp.einsum('bncd,bnc->bnd', g.astype(jnp.float32),
                                 cw.astype(jnp.float32))
            sampled = sampled.reshape(b, ho, wo, k * k, c_in)
            sampled = sampled * mask.reshape(b, ho, wo, k * k, 1)
            sampled = sampled.astype(x.dtype)

        kernel = self.param('kernel', _conv_kernel_init,
                            (k * k * c_in, self.features))
        out = sampled.reshape(b, ho, wo, k * k * c_in) @ kernel.astype(
            sampled.dtype)
        return out


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: stride on conv1; optional DCN on conv2."""
    mid_channels: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    with_dcn: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out_channels = self.mid_channels * 4
        identity = x

        h = nn.Conv(self.mid_channels, (1, 1), strides=(self.stride,) * 2,
                    use_bias=False, kernel_init=_conv_kernel_init,
                    dtype=self.dtype, name='conv1')(x)
        h = FrozenBN(self.mid_channels, name='bn1')(h)
        h = nn.relu(h)

        if self.with_dcn:
            h = DeformConv2d(self.mid_channels, stride=1,
                             dilation=self.dilation, dtype=self.dtype,
                             name='conv2')(h)
        else:
            d = self.dilation
            h = nn.Conv(self.mid_channels, (3, 3), strides=(1, 1),
                        padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                        use_bias=False, kernel_init=_conv_kernel_init,
                        dtype=self.dtype, name='conv2')(h)
        h = FrozenBN(self.mid_channels, name='bn2')(h)
        h = nn.relu(h)

        h = nn.Conv(out_channels, (1, 1), use_bias=False,
                    kernel_init=_conv_kernel_init, dtype=self.dtype,
                    name='conv3')(h)
        h = FrozenBN(out_channels, name='bn3')(h)

        if self.with_downsample:
            identity = nn.Conv(out_channels, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=_conv_kernel_init,
                               dtype=self.dtype, name='downsample_conv')(x)
            identity = FrozenBN(out_channels, name='downsample_bn')(identity)
        return nn.relu(h + identity)


class ResNet(nn.Module):
    """ResNet with frozen-BN and per-stage DCN, returning ``out_indices`` stages."""
    depth: int = 101
    out_indices: Tuple[int, ...] = (1, 2, 3)
    frozen_stages: int = 1
    stage_with_dcn: Tuple[bool, ...] = (False, False, True, True)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    remat: bool = False
    # blocks per outer remat segment (two-level remat: segments save only
    # their input; their backward recomputes the member blocks, which are
    # themselves remat'd). Per-BLOCK remat alone kept every block input as
    # a residual — 23 x 68 MB for RN101 stage 3 at flagship shapes, ~2.5 GB
    # across the backbone and a big slice of the train-step OOM. Segments
    # of 4 cut the stored inputs ~4x for one extra (cheap, conv-bound)
    # within-segment recompute pass.
    remat_segment: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] (caffe-normalised BGR). Returns list of NHWC maps."""
        blocks = ARCH_SETTINGS[self.depth]
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_conv_kernel_init,
                    dtype=self.dtype, name='conv1')(x)
        h = FrozenBN(64, name='bn1')(h)
        h = nn.relu(h)
        # torch MaxPool2d(3, stride=2, padding=1)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        if self.frozen_stages >= 0:
            h = jax.lax.stop_gradient(h)

        outs = []
        mid = 64
        for stage, num_blocks in enumerate(blocks):
            seg = max(1, self.remat_segment) if self.remat else num_blocks

            def run_blocks(mdl, h, *, _stage=stage, _mid=mid, _ids=None):
                for i in _ids:
                    stride = mdl.strides[_stage] if i == 0 else 1
                    h = block_cls(
                        mid_channels=_mid,
                        stride=stride,
                        dilation=mdl.dilations[_stage],
                        with_downsample=(i == 0),
                        with_dcn=mdl.stage_with_dcn[_stage],
                        dtype=mdl.dtype,
                        name=f'layer{_stage + 1}_{i}')(h)
                return h

            for i0 in range(0, num_blocks, seg):
                ids = tuple(range(i0, min(i0 + seg, num_blocks)))
                fn = functools.partial(run_blocks, _ids=ids)
                if self.remat and len(ids) > 1:
                    fn = nn.remat(fn)
                h = fn(self, h)
            if stage + 1 <= self.frozen_stages:
                h = jax.lax.stop_gradient(h)
            if stage in self.out_indices:
                outs.append(h)
            mid *= 2
        return outs
