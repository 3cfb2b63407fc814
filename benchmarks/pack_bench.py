"""Atlas pack formulations (v5e): the f32 packed-corner build for the SCA
lvl0 table writes ~577 MB but measures ~14 ms (~10x the BW floor) — compare
fusion-splitting variants.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax, jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def bench(tag, fn, *args, iters=4, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0]))
    print(f'{tag}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms', flush=True)


def main():
    key = jax.random.PRNGKey(0)
    b, heads, dim = 6, 8, 32
    h, w = 116, 200
    hw = h * w
    value = jax.random.normal(key, (b, hw, heads, dim), jnp.bfloat16)

    def pack_current(value_l):
        v = value_l.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
            b * heads, h, w, dim)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        packed = jnp.concatenate([
            vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:],
        ], axis=-1)
        return packed.reshape(b, heads, (h + 1) * (w + 1), 4 * dim)

    def pack_barrier(value_l):
        v = value_l.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
            b * heads, h, w, dim)
        v = jax.lax.optimization_barrier(v)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        packed = jnp.concatenate([
            vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:],
        ], axis=-1)
        return packed.reshape(b, heads, (h + 1) * (w + 1), 4 * dim)

    def pack_bf16_then_cast(value_l):
        v = value_l.transpose(0, 2, 1, 3).reshape(b * heads, h, w, dim)
        v = jax.lax.optimization_barrier(v)
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        packed = jnp.concatenate([
            vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:],
        ], axis=-1).astype(jnp.float32)
        return packed.reshape(b, heads, (h + 1) * (w + 1), 4 * dim)

    def pack_dynslice(value_l):
        # 4 shifted copies via pad-with-offset instead of slice-of-pad
        v = value_l.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
            b * heads, h, w, dim)
        v = jax.lax.optimization_barrier(v)
        c00 = jnp.pad(v, ((0, 0), (1, 0), (1, 0), (0, 0)))
        c01 = jnp.pad(v, ((0, 0), (1, 0), (0, 1), (0, 0)))
        c10 = jnp.pad(v, ((0, 0), (0, 1), (1, 0), (0, 0)))
        c11 = jnp.pad(v, ((0, 0), (0, 1), (0, 1), (0, 0)))
        packed = jnp.concatenate([c00, c01, c10, c11], axis=-1)
        return packed.reshape(b, heads, (h + 1) * (w + 1), 4 * dim)

    def pack_conv(value_l):
        from vidar_tpu.ops.msda import _pack_corners
        return _pack_corners(value_l, h, w, out_dtype=jnp.float32)

    def pack_conv_grouped(value_l):
        # the round-2 formulation: grouped conv over [B,H,W,heads*dim] then
        # a post-conv head transpose of the 4x-expanded table
        kern = np.zeros((2, 2, dim, heads * 4 * dim), np.float32)
        d = np.arange(dim)
        for hh in range(heads):
            for dy in range(2):
                for dx in range(2):
                    f = dy * 2 + dx
                    kern[dy, dx, d, hh * 4 * dim + f * dim + d] = 1.0
        x = value_l.reshape(b, h, w, heads * dim)
        out = jax.lax.conv_general_dilated(
            x, jnp.asarray(kern, value_l.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=heads, preferred_element_type=jnp.float32)
        out = out.reshape(b, (h + 1) * (w + 1), heads, 4 * dim)
        return out.transpose(0, 2, 1, 3)

    # one-time equivalence check: a layout/ordering regression in the conv
    # formulation must not go unnoticed by the bench
    ref = np.asarray(jax.jit(pack_current)(value))
    got = np.asarray(jax.jit(pack_conv)(value))
    np.testing.assert_array_equal(ref, got)
    got_g = np.asarray(jax.jit(pack_conv_grouped)(value))
    np.testing.assert_array_equal(ref, got_g)
    print('pack_conv / pack_conv_grouped match pack_current', flush=True)

    bench('pack current        ', jax.jit(pack_current), value)
    bench('pack barrier        ', jax.jit(pack_barrier), value)
    bench('pack bf16 then cast ', jax.jit(pack_bf16_then_cast), value)
    bench('pack pad-offset     ', jax.jit(pack_dynslice), value)
    bench('pack conv (heads-in-batch)', jax.jit(pack_conv), value)
    bench('pack conv (grouped, r2)   ', jax.jit(pack_conv_grouped), value)


if __name__ == '__main__':
    main()
