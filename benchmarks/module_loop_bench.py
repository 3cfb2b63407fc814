"""Loop-timed (in-jit, noise-free) module vs op vs kernel costs on v5e.

The eager per-call timings in measure_all.py carry ~30-37 ms of tunnel
dispatch+readback whose variance swamps 5-15 ms effects; here every
measurement runs ITERS times inside ONE jit with a data dependency chained
through the loop carry, so per-call cost = (t_loop - t_1) / (ITERS - 1) with
dispatch amortized away.
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


def loop_time(tag, fn, perturb, *args):
    """fn(*args) -> pytree; perturb(args, eps_scalar) -> new args."""

    def run_n(n):
        @partial(jax.jit, static_argnames='steps')
        def body(args, steps):
            def step(carry, _):
                out = fn(*perturb(args, carry))
                return (jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                    jnp.float32) * 1e-30, None)
            return jax.lax.scan(step, jnp.float32(0.0), None, length=steps)[0]
        float(body(args, steps=n))       # warm/compile
        t0 = time.perf_counter()
        float(body(args, steps=n))
        return time.perf_counter() - t0

    t1 = run_n(1)
    tn = run_n(ITERS)
    per = (tn - t1) / (ITERS - 1)
    print(f'{tag}: {per * 1e3:.1f} ms/call', flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    bs, nq, c = 1, 40000, 256
    bev_h = bev_w = 200

    # ---------------- TSA: module vs msda op ----------------
    from vidar_tpu.models.attention import TemporalSelfAttention
    from vidar_tpu.ops.msda import msdeform_attn

    tsa = TemporalSelfAttention(embed_dims=c, dtype=dt)
    query = jax.random.normal(key, (bs, nq, c), dt)
    prev_pair = jnp.stack([query, query], axis=1)
    ref = jax.random.uniform(key, (bs, 2, nq, 1, 2), jnp.float32)
    qpos = jax.random.normal(key, (bs, nq, c), dt)
    params = tsa.init(key, query, prev_pair, ref, bev_h, bev_w,
                      query_pos=qpos)

    def tsa_fn(q, pp, r, qp):
        return tsa.apply(params, q, pp, r, bev_h, bev_w, query_pos=qp)

    loop_time('TSA module', tsa_fn,
              lambda a, e: (a[0] + e.astype(dt), a[1], a[2], a[3]),
              query, prev_pair, ref, qpos)

    # the msda op alone at the TSA shape (prep incl. pack + kernel)
    vals = jax.random.normal(key, (2, nq, 8, 32), dt)
    loc = jax.random.uniform(key, (2, nq, 8, 1, 4, 2), jnp.float32)
    wts = jax.random.uniform(key, (2, nq, 8, 1, 4), jnp.float32)

    def msda_fn(v, l, w):
        return msdeform_attn(v, [(bev_h, bev_w)], l, w, impl='fused')

    loop_time('TSA msda op (pack+prep+kernel)', msda_fn,
              lambda a, e: (a[0] + e.astype(dt), a[1], a[2]),
              vals, loc, wts)

    # ---------------- SCA: module (hoisted/tables if wired) ----------------
    from vidar_tpu.models.attention import SpatialCrossAttention
    cams, levels, points = 6, 4, 8
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    tot = sum(h * w for h, w in shapes)
    sca = SpatialCrossAttention(embed_dims=c, num_cams=cams,
                                deform_num_levels=levels,
                                deform_num_points=points,
                                capacity_ratio=0.4, dtype=dt)
    value6 = jax.random.normal(key, (bs, cams, tot, c), dt)
    ref_cam = jax.random.uniform(key, (cams, bs, nq, 4, 2), jnp.float32)
    bev_mask = jax.random.uniform(key, (cams, bs, nq, 4)) > 0.7
    sparams = sca.init(key, query, value6, ref_cam, bev_mask, shapes)

    def sca_fn(q, v, r, m):
        return sca.apply(sparams, q, v, r, m, spatial_shapes=shapes)

    loop_time('SCA module (full, per-call pack)', sca_fn,
              lambda a, e: (a[0] + e.astype(dt), a[1], a[2], a[3]),
              query, value6, ref_cam, bev_mask)

    # SCA msda op alone at the compacted shape
    cap = 16128
    svals = jax.random.normal(key, (cams, tot, 8, 32), dt)
    sloc = jax.random.uniform(key, (cams, cap, 8, 4, 8, 2), jnp.float32)
    swts = jax.random.uniform(key, (cams, cap, 8, 4, 8), jnp.float32)

    def smsda_fn(v, l, w):
        return msdeform_attn(v, list(shapes), l, w, impl='fused')

    loop_time('SCA msda op (pack+prep+kernel)', smsda_fn,
              lambda a, e: (a[0] + e.astype(dt), a[1], a[2]),
              svals, sloc, swts)

    # hoisted-tables path: pack once outside the loop, per-call = fold+prep+
    # kernel (what each encoder layer actually pays)
    from vidar_tpu.ops.msda import (pack_raw_levels, tables_from_packed_raw,
                                    msdeform_attn_tables)
    raw = jax.random.normal(key, (cams, tot, c), dt)
    packed = jax.jit(partial(pack_raw_levels,
                             spatial_shapes=shapes))(raw)
    kern = jax.random.normal(key, (c, c), dt) * 0.02
    bias = jax.random.normal(key, (c,), dt) * 0.02

    def tables_fn(pk, l, w):
        tabs, trows = tables_from_packed_raw(pk, kern, bias, 8)
        return msdeform_attn_tables(tabs, trows, list(shapes), l, w)

    loop_time('SCA msda op (hoisted: fold+prep+kernel)', tables_fn,
              lambda a, e: (a[0], a[1] + e * 1e-6, a[2]),
              packed, sloc, swts)

    # ---------------- rollout layer ----------------
    from vidar_tpu.models.vidar_decoder import PredictionTransformerLayer
    f = 5
    layer = PredictionTransformerLayer(embed_dims=c, num_memory_frames=f,
                                       dtype=dt)
    prev_feats = jax.random.normal(key, (bs, f, nq, c), dt)
    tgt = jax.random.uniform(key, (bs, nq, 2), jnp.float32)
    refp = jax.random.uniform(key, (bs, nq, f, 2), jnp.float32)
    bpos = jax.random.normal(key, (bs, nq, c), dt)
    lparams = layer.init(key, query, prev_feats, tgt, refp, bpos, bev_h,
                         bev_w)

    def layer_fn(q, pf):
        return layer.apply(lparams, q, pf, tgt, refp, bpos, bev_h, bev_w)

    loop_time('rollout decoder layer', layer_fn,
              lambda a, e: (a[0] + e.astype(dt), a[1]),
              query, prev_feats)


if __name__ == '__main__':
    main()
