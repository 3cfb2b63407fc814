"""VoVNet(CP) backbone (the reference model zoo's alternative image backbone,
reference bevformer/backbones/vovnet.py — registered, unused by released
configs). One-shot-aggregation (OSA) blocks with optional identity and eSE
attention, frozen-BN, NHWC.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import FrozenBN, _conv_kernel_init

# stage specs: (stage_ch, concat_ch, layers_per_block, blocks)
VOVNET_SPECS = {
    'V-99-eSE': dict(
        stem=(64, 64, 128),
        stage_ch=(128, 160, 192, 224),
        concat_ch=(256, 512, 768, 1024),
        block_per_stage=(1, 3, 9, 3),
        layer_per_block=5,
    ),
    'V-39-eSE': dict(
        stem=(64, 64, 128),
        stage_ch=(128, 160, 192, 224),
        concat_ch=(256, 512, 768, 1024),
        block_per_stage=(1, 1, 2, 2),
        layer_per_block=5,
    ),
}


def _conv_bn_relu(x, ch, k, s, name, dtype):
    pad = k // 2
    h = nn.Conv(ch, (k, k), strides=(s, s), padding=[(pad, pad)] * 2,
                use_bias=False, kernel_init=_conv_kernel_init,
                dtype=dtype, name=f'{name}_conv')(x)
    h = FrozenBN(ch, name=f'{name}_bn')(h)
    return nn.relu(h)


class _eSE(nn.Module):
    channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        gap = x.mean(axis=(1, 2), keepdims=True)
        att = nn.Conv(self.channels, (1, 1), kernel_init=_conv_kernel_init,
                      dtype=self.dtype, name='fc')(gap)
        # hsigmoid
        att = jnp.clip(att + 3.0, 0.0, 6.0) / 6.0
        return x * att


class _OSABlock(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    identity: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        outputs = [x]
        h = x
        for i in range(self.layer_per_block):
            h = _conv_bn_relu(h, self.stage_ch, 3, 1, f'layer{i}', self.dtype)
            outputs.append(h)
        h = jnp.concatenate(outputs, axis=-1)
        h = _conv_bn_relu(h, self.concat_ch, 1, 1, 'concat', self.dtype)
        h = _eSE(self.concat_ch, dtype=self.dtype, name='ese')(h)
        if self.identity:
            h = h + identity
        return h


class VoVNet(nn.Module):
    spec: str = 'V-99-eSE'
    out_stages: Tuple[int, ...] = (1, 2, 3)
    frozen_stages: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        cfg = VOVNET_SPECS[self.spec]
        s1, s2, s3 = cfg['stem']
        h = _conv_bn_relu(x, s1, 3, 2, 'stem1', self.dtype)
        h = _conv_bn_relu(h, s2, 3, 1, 'stem2', self.dtype)
        h = _conv_bn_relu(h, s3, 3, 2, 'stem3', self.dtype)
        if self.frozen_stages >= 0:
            h = jax.lax.stop_gradient(h)

        outs = []
        for stage in range(4):
            if stage > 0:  # the first OSA stage keeps the stem stride
                h = nn.max_pool(h, (3, 3), strides=(2, 2),
                                padding=[(0, 1), (0, 1)])
            for b in range(cfg['block_per_stage'][stage]):
                h = _OSABlock(
                    stage_ch=cfg['stage_ch'][stage],
                    concat_ch=cfg['concat_ch'][stage],
                    layer_per_block=cfg['layer_per_block'],
                    identity=(b > 0),
                    dtype=self.dtype,
                    name=f'stage{stage + 2}_block{b}')(h)
            if stage + 1 <= self.frozen_stages:
                h = jax.lax.stop_gradient(h)
            if stage in self.out_stages:
                outs.append(h)
        return outs
