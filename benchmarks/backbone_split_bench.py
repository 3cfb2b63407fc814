"""Backbone stage split on v5e (scan-loop timing, dispatch amortized).

The full RN101-DCN+FPN forward over 30 x 928x1600 images measures ~695 ms
(measure_all.py) while the conv roofline is ~70-140 ms — this splits
stem / res2 / res3 / res4(DCN) / res5(DCN) / FPN to find the off-roofline
stage.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from vidar_tpu.models.resnet import ResNet, Bottleneck, FrozenBN
from vidar_tpu.models.fpn import FPN

ITERS = 4
B, H, W = 30, 928, 1600
DT = jnp.bfloat16


def loop_time(tag, fn, x, flops=None):
    def run_n(n):
        @partial(jax.jit, static_argnames='steps')
        def body(x, steps):
            def step(carry, _):
                out = fn(x + carry.astype(x.dtype))
                leaf = jax.tree.leaves(out)[0]
                return (leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30,
                        None)
            return jax.lax.scan(step, jnp.float32(0.0), None,
                                length=steps)[0]
        float(body(x, steps=n))
        t0 = time.perf_counter()
        float(body(x, steps=n))
        return time.perf_counter() - t0

    per = (run_n(ITERS) - run_n(1)) / (ITERS - 1)
    note = ''
    if flops:
        note = f'  ({flops / per / 1e12:.0f} TFLOP/s, ' \
               f'{flops / per / 197e12 * 100:.0f}% MFU)'
    print(f'{tag}: {per * 1e3:.1f} ms{note}', flush=True)
    return per


class Stem(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from vidar_tpu.models.resnet import _conv_kernel_init
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_conv_kernel_init,
                    dtype=self.dtype, name='conv1')(x)
        h = FrozenBN(64, name='bn1')(h)
        h = nn.relu(h)
        return nn.max_pool(h, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])


class Stage(nn.Module):
    mid: int
    num_blocks: int
    stride: int = 2
    with_dcn: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_blocks):
            h = Bottleneck(mid_channels=self.mid,
                           stride=self.stride if i == 0 else 1,
                           with_downsample=(i == 0),
                           with_dcn=self.with_dcn, dtype=self.dtype,
                           name=f'b{i}')(h)
        return h


def stage_flops(b, h_in, w_in, cin, mid, blocks, stride):
    """MAC*2 for a bottleneck stage (1x1 + 3x3 + 1x1 + downsample)."""
    h_o, w_o = h_in // stride, w_in // stride
    total = 0
    c_out = mid * 4
    for i in range(blocks):
        ci = cin if i == 0 else c_out
        total += h_o * w_o * (ci * mid + mid * mid * 9 + mid * c_out)
        if i == 0:
            total += h_o * w_o * ci * c_out
    return 2 * b * total


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, 3), DT)

    stem = Stem(dtype=DT)
    sp = stem.init(key, x)
    f_stem = lambda x: stem.apply(sp, x)
    stem_fl = 2 * B * (H // 2) * (W // 2) * 3 * 64 * 49
    loop_time('stem (7x7/2 + pool)', f_stem, x, stem_fl)
    x1 = jax.jit(f_stem)(x)                     # [B, 232, 400, 64]

    cfgs = [('res2', 64, 3, 1, False), ('res3', 128, 4, 2, False),
            ('res4 (DCN x23)', 256, 23, 2, True),
            ('res5 (DCN x3)', 512, 3, 2, True)]
    h_cur = x1
    hw = (H // 4, W // 4)
    cin = 64
    for (tag, mid, blocks, stride, dcn) in cfgs:
        stage_in = h_cur
        st = Stage(mid=mid, num_blocks=blocks, stride=stride, with_dcn=dcn,
                   dtype=DT)
        p = st.init(key, stage_in)
        fn = lambda x, st=st, p=p: st.apply(p, x)
        fl = stage_flops(B, *hw, cin, mid, blocks, stride)
        loop_time(f'{tag}', fn, stage_in, fl)
        if dcn:
            # same stage with plain 3x3 convs: isolates the DCN gather cost
            st2 = Stage(mid=mid, num_blocks=blocks, stride=stride,
                        with_dcn=False, dtype=DT)
            p2 = st2.init(key, stage_in)
            loop_time(f'{tag} [plain-conv control]',
                      lambda x, st2=st2, p2=p2: st2.apply(p2, x), stage_in,
                      fl)
        h_cur = jax.jit(fn)(stage_in)
        hw = (hw[0] // stride, hw[1] // stride)
        cin = mid * 4


if __name__ == '__main__':
    main()
