"""InternImage backbone (registered-but-unused reference component,
bevformer/backbones/internimage.py, 701 LoC + the ops_dcnv3 CUDA extension):
stem -> 4 stages of DCNv3 blocks with channel doubling, LayerNorm-everywhere,
layer-scale residuals, GELU MLPs; multi-scale outputs for FPN.

TPU re-design: the DCNv3 sampling core is ``ops/dcnv3.dcnv3_core`` (packed-
corner gather, torch-oracle tested); offsets/masks are predicted by a
depthwise 3x3 conv + linear like the reference's DCNv3 module
(ops_dcnv3/modules/dcnv3.py:140-220). Channel-last throughout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.dcnv3 import dcnv3_core
from .layers import TorchLinear


class DCNv3Module(nn.Module):
    """proj_in -> depthwise-conv offset/mask branch -> dcnv3_core -> proj_out
    (reference ops_dcnv3/modules/dcnv3.py DCNv3)."""
    channels: int
    groups: int
    kernel: Tuple[int, int] = (3, 3)
    offset_scale: float = 1.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        k = self.kernel[0] * self.kernel[1]
        v = TorchLinear(self.channels, name='value_proj')(x)
        # offset/mask branch: depthwise 3x3 + norm + act + linears
        q = nn.Conv(self.channels, self.kernel,
                    feature_group_count=self.channels, dtype=self.dtype,
                    name='dw_conv')(x)
        q = nn.LayerNorm(name='dw_norm')(q)
        q = nn.gelu(q)
        offset = TorchLinear(self.groups * k * 2, name='offset')(q)
        mask = TorchLinear(self.groups * k, name='mask')(q)
        out = dcnv3_core(v, offset * self.offset_scale, mask,
                         kernel=self.kernel, groups=self.groups)
        return TorchLinear(self.channels, name='output_proj')(
            out.astype(x.dtype))


class InternImageBlock(nn.Module):
    channels: int
    groups: int
    mlp_ratio: float = 4.0
    layer_scale: Optional[float] = 1.0
    post_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        def scaled(name, y):
            if self.layer_scale is None:
                return y
            gamma = self.param(name, nn.initializers.constant(
                self.layer_scale), (self.channels,))
            return y * gamma

        if self.post_norm:
            y = DCNv3Module(self.channels, self.groups, dtype=self.dtype,
                            name='dcn')(x)
            x = x + scaled('gamma1', nn.LayerNorm(name='norm1')(y))
        else:
            y = nn.LayerNorm(name='norm1')(x)
            y = DCNv3Module(self.channels, self.groups, dtype=self.dtype,
                            name='dcn')(y)
            x = x + scaled('gamma1', y)

        hidden = int(self.channels * self.mlp_ratio)
        if self.post_norm:
            y = TorchLinear(hidden, name='mlp_fc1')(x)
            y = nn.gelu(y)
            y = TorchLinear(self.channels, name='mlp_fc2')(y)
            x = x + scaled('gamma2', nn.LayerNorm(name='norm2')(y))
        else:
            y = nn.LayerNorm(name='norm2')(x)
            y = TorchLinear(hidden, name='mlp_fc1')(y)
            y = nn.gelu(y)
            y = TorchLinear(self.channels, name='mlp_fc2')(y)
            x = x + scaled('gamma2', y)
        return x


class InternImage(nn.Module):
    """4-stage DCNv3 backbone. 'T' preset: channels 64, depths (4,4,18,4),
    groups (4,8,16,32) (reference internimage.py InternImage defaults)."""
    channels: int = 64
    depths: Tuple[int, ...] = (4, 4, 18, 4)
    groups: Tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    layer_scale: Optional[float] = 1.0
    post_norm: bool = False
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # stem: two stride-2 convs (reference StemLayer)
        x = nn.Conv(self.channels // 2, (3, 3), strides=(2, 2),
                    dtype=self.dtype, name='stem_conv1')(x)
        x = nn.LayerNorm(name='stem_norm1')(x)
        x = nn.gelu(x)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name='stem_conv2')(x)
        x = nn.LayerNorm(name='stem_norm2')(x)

        outs = []
        ch = self.channels
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = InternImageBlock(
                    ch, self.groups[i], mlp_ratio=self.mlp_ratio,
                    layer_scale=self.layer_scale, post_norm=self.post_norm,
                    dtype=self.dtype, name=f'levels_{i}_blocks_{j}')(x)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(name=f'out_norm{i}')(x))
            if i < len(self.depths) - 1:
                ch *= 2
                x = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=self.dtype,
                            name=f'downsample{i}_conv')(x)
                x = nn.LayerNorm(name=f'downsample{i}_norm')(x)
        return outs
