"""A/B: head-major (current to_cqs stack+transpose) vs q-major msda prep.

Hypothesis: the [b,q,heads,E,p] -> [b*heads, q, E*p] transpose moves 8-lane
granules through a 16x tile-padded layout and dominates the ~16 ms/call
hoisted-path prep; a q-major contract ([b, q, heads, E*p], no transpose)
should land near the bandwidth floor (~1-2 ms).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

ITERS = 8
B, Q, HEADS, LV, P = 6, 14848, 8, 4, 8
SHAPES = ((116, 200), (58, 100), (29, 50), (15, 25))
TABLE_ROWS = tuple((h + 1) * (w + 1) + (-(h + 1) * (w + 1)) % 8
                   for h, w in SHAPES)


def loop_time(tag, fn, *args):
    def run_n(n):
        @partial(jax.jit, static_argnames='steps')
        def body(args, steps):
            def step(carry, _):
                out = fn(args[0] + carry, *args[1:])
                return (jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                    jnp.float32) * 1e-30, None)
            return jax.lax.scan(step, jnp.float32(0.0), None,
                                length=steps)[0]
        float(body(args, steps=n))
        t0 = time.perf_counter()
        float(body(args, steps=n))
        return time.perf_counter() - t0

    per = (run_n(ITERS) - run_n(1)) / (ITERS - 1)
    print(f'{tag}: {per * 1e3:.2f} ms/call', flush=True)


def prep_current(loc, weights):
    rows, wxs, wys, aws = [], [], [], []
    base = 0
    for lvl, (h, w) in enumerate(SHAPES):
        x = loc[..., lvl, :, 0] * w - 0.5
        y = loc[..., lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
        row = (jnp.clip(iy0 + 1, 0, h) * (w + 1) +
               jnp.clip(ix0 + 1, 0, w)) + base
        rows.append(row)
        wxs.append(x - x0)
        wys.append(y - y0)
        aws.append(weights[..., lvl, :] * valid)
        base += TABLE_ROWS[lvl]

    def to_cqs(xs):
        v = jnp.stack(xs, axis=3)
        return v.transpose(0, 2, 1, 3, 4).reshape(B * HEADS, Q, -1)

    return (to_cqs(rows).astype(jnp.int32), to_cqs(wxs), to_cqs(wys),
            to_cqs(aws))


def prep_qmajor(loc, weights):
    rows, wxs, wys, aws = [], [], [], []
    base = 0
    for lvl, (h, w) in enumerate(SHAPES):
        x = loc[..., lvl, :, 0] * w - 0.5
        y = loc[..., lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        valid = ((iy0 >= -1) & (iy0 <= h - 1) & (ix0 >= -1) & (ix0 <= w - 1))
        row = (jnp.clip(iy0 + 1, 0, h) * (w + 1) +
               jnp.clip(ix0 + 1, 0, w)) + base
        rows.append(row)
        wxs.append(x - x0)
        wys.append(y - y0)
        aws.append(weights[..., lvl, :] * valid)
        base += TABLE_ROWS[lvl]

    def cat(xs):  # [b, q, heads, p] x E -> [b, q, heads, E*p], no transpose
        return jnp.concatenate(xs, axis=-1)

    return (cat(rows).astype(jnp.int32), cat(wxs), cat(wys), cat(aws))


def main():
    key = jax.random.PRNGKey(0)
    loc = jax.random.uniform(key, (B, Q, HEADS, LV, P, 2), jnp.float32)
    weights = jax.random.uniform(key, (B, Q, HEADS, LV, P), jnp.float32)
    loop_time('prep head-major (current)', prep_current, loc, weights)
    loop_time('prep q-major (no transpose)', prep_qmajor, loc, weights)

    # sanity: same values modulo layout
    a = jax.jit(prep_current)(loc, weights)
    bq = jax.jit(prep_qmajor)(loc, weights)
    for i in range(4):
        ref = np.asarray(a[i]).reshape(B, HEADS, Q, LV * P)
        got = np.asarray(bq[i]).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(ref, got, rtol=0, atol=0)
    print('layouts agree', flush=True)


if __name__ == '__main__':
    main()
