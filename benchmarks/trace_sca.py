"""Capture a jax.profiler trace of the hoisted SCA msda op and print
per-op device times (parsed from the xplane with tensorboard_plugin_profile).
"""
import glob
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from vidar_tpu.ops.msda import (pack_raw_levels, tables_from_packed_raw,
                                msdeform_attn_tables)

OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/jax_trace_sca'


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    cams, c, heads = 6, 256, 8
    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    tot = sum(h * w for h, w in shapes)
    cap = 14848

    raw = jax.random.normal(key, (cams, tot, c), dt)
    packed = jax.jit(partial(pack_raw_levels, spatial_shapes=shapes))(raw)
    kern = jax.random.normal(key, (c, c), dt) * 0.02
    bias = jax.random.normal(key, (c,), dt) * 0.02
    loc = jax.random.uniform(key, (cams, cap, heads, 4, 8, 2), jnp.float32)
    wts = jax.random.uniform(key, (cams, cap, heads, 4, 8), jnp.float32)

    @jax.jit
    def op(pk, l, w):
        tabs, trows = tables_from_packed_raw(pk, kern, bias, heads)
        def step(carry, _):
            out = msdeform_attn_tables(tabs, trows, list(shapes),
                                       l + carry * 1e-30, w)
            return out.reshape(-1)[0].astype(jnp.float32), None
        return jax.lax.scan(step, jnp.float32(0.0), None, length=4)[0]

    float(op(packed, loc, wts))     # compile
    with jax.profiler.trace(OUT):
        float(op(packed, loc, wts))
    print('trace captured', flush=True)

    # ---- parse: per-op self time from the xplane ----
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    files = glob.glob(os.path.join(OUT, '**', '*.xplane.pb'),
                      recursive=True)
    print(files)
    data, _ = rtd.xspace_to_tool_data(files, 'framework_op_stats', {})
    import gzip, json
    try:
        rows = json.loads(data)
    except Exception:
        print(type(data), str(data)[:500])
        return
    print(rows if isinstance(rows, str) else 'parsed')


if __name__ == '__main__':
    main()
