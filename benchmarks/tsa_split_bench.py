"""TSA msda-op split (loop-timed): pack vs prep vs kernel at the production
TSA shape (2-slot queue, 200x200 BEV, s=4, u16 single-group table)."""
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


def loop_time(tag, fn, *args):
    def run_n(n):
        @partial(jax.jit, static_argnames='steps')
        def body(args, steps):
            def step(carry, _):
                out = fn(args[0] + carry.astype(args[0].dtype), *args[1:])
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


def main():
    from vidar_tpu.ops import msda as m
    from vidar_tpu.ops.msda_pallas import (msda_gather_fused16, pack_atlas16,
                                           msda_gather_fused)

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    bev_h = bev_w = 200
    nq, heads, dim = 40000, 8, 32
    c2 = 2  # queue slots folded into batch
    shapes = [(bev_h, bev_w)]

    value = jax.random.normal(key, (c2, nq, heads, dim), dt)
    loc = jax.random.uniform(key, (c2, nq, heads, 1, 4, 2), jnp.float32)
    wts = jax.random.uniform(key, (c2, nq, heads, 1, 4), jnp.float32)

    # full op
    loop_time('TSA op total', lambda v, l, w: m.msdeform_attn(
        v, shapes, l, w, impl='fused'), value, loc, wts)

    # pack only (bf16 corner pack + u16 row-pair pack, what the u16 plan does)
    def pack_only(v):
        vls = m._split_levels(v, shapes)
        cache = m._packed_cache(vls, shapes, {0}, dtype=jnp.bfloat16)
        pk = cache[0]
        b, h_, hh, ww, lanes = pk.shape
        return pack_atlas16(pk.reshape(b * h_, hh * ww, lanes))

    loop_time('TSA pack only (corner+u16)', pack_only, value)

    # prep only (row idx + fractions)
    def prep_only(v, l, w):
        plan = m._fused_plan(shapes, packed16=True)
        vls = m._split_levels(v, shapes)
        cache = m._packed_cache(vls, shapes, {0}, dtype=jnp.bfloat16)
        outs = []
        for entries in plan:
            outs.append(m._prep_group(cache, shapes, l, w, entries, 256)[1:])
        return outs

    loop_time('TSA pack+prep', prep_only, value, loc, wts)

    # kernel only: prebuilt u16 full table
    atlas16 = jax.jit(pack_only)(value)
    q_pad = 256 * ((nq + 255) // 256)
    # sample-major [C, S, Q] layout (see ops/msda_pallas.py)
    idx = jax.random.randint(key, (c2 * heads, 4, q_pad), 0,
                             (bev_h + 1) * (bev_w + 1), jnp.int32)
    wx = jax.random.uniform(key, (c2 * heads, 4, q_pad), jnp.float32)
    loop_time('TSA kernel only (u16 full table)',
              lambda wx, a, i: msda_gather_fused16(a, i, wx, wx, wx),
              wx, atlas16, idx)

    # ---- staged attribution with LOC perturbed (so prep can't be DCE'd;
    # the table is prebuilt so pack stays out of the loop) ----
    tables = {0: atlas16}
    table_rows = {0: 2 * atlas16.shape[1]}
    entries = (((0, 0, bev_w),),)

    def prep_stage(l, w):
        outs = []
        for es in entries:
            outs.append(m._prep_group_fwd(tables, table_rows, shapes, l, w,
                                          es, 256))
        return [o[1:] for o in outs]   # drop the aliased atlas

    loop_time('prep only (loc-perturbed)',
              lambda l, w: prep_stage(l, w), loc, wts)

    def prep_kernel(l, w):
        out = None
        for es in entries:
            atlas, row_idx, wx1, wy1, aw = m._prep_group_fwd(
                tables, table_rows, shapes, l, w, es, 256)
            part = msda_gather_fused16(atlas, row_idx, wx1, wy1, aw)
            out = part if out is None else out + part
        return out

    loop_time('prep+kernel (loc-perturbed)', prep_kernel, loc, wts)

    def prep_kernel_glue(l, w):
        out = prep_kernel(l, w)
        dim = out.shape[1]
        out = out[:, :, :nq].reshape(c2, heads, dim, nq).transpose(0, 3, 1, 2)
        return out.reshape(c2, nq, heads * dim).astype(dt)

    loop_time('prep+kernel+out-glue (loc-perturbed)', prep_kernel_glue,
              loc, wts)

    # full op, loc-perturbed: value is loop-invariant so XLA may hoist the
    # pack out of the scan — the delta vs the value-perturbed 'TSA op
    # total' above is the true in-loop pack share.
    loop_time('TSA op total (loc-perturbed, pack hoistable)',
              lambda l, w: m.msdeform_attn(value, shapes, l, w,
                                           impl='fused'), loc, wts)


if __name__ == '__main__':
    main()
