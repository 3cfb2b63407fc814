"""Feature Pyramid Network (mmdet-FPN semantics, NHWC).

Capability match for the reference neck config
(projects/configs/vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_3future.py:99-106):
in_channels [512, 1024, 2048], out 256, start_level 0, 4 outputs with the
extra level from a stride-2 conv on relu(last FPN output)
(add_extra_convs='on_output', relu_before_extra_convs=True).
Top-down upsampling is nearest (mmdet default).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def _xavier_conv_init(key, shape, dtype=jnp.float32):
    """mmdet FPN uses xavier_init(distribution='uniform') on its convs."""
    fan_in = int(np.prod(shape[:-1]))
    fan_out = int(shape[-1] * np.prod(shape[:-2]))
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        num_ins = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=_xavier_conv_init,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f'lateral_convs_{i}')(inputs[i])
            for i in range(num_ins)
        ]
        for i in range(num_ins - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            # crop in case of odd spatial dims
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_xavier_conv_init,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name=f'fpn_convs_{i}')(laterals[i])
            for i in range(num_ins)
        ]
        for i in range(num_ins, self.num_outs):
            src = outs[-1]
            if self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=_xavier_conv_init,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name=f'fpn_convs_{i}')(src))
        return outs
