"""DCN tap-sampling formulations at RN101 stage shapes (v5e).

Measured (f32): stage3 take 26.4 / pallas 19.6 ms; stage4 take 12.1 /
pallas 9.2 ms. The bf16 take path (production) runs stage3 in ~11.4 ms,
which is why the Pallas path is opt-in (VIDAR_TPU_DCN_PALLAS).

Timing: eager per-call with scalar readback (in-jit chaining lets XLA
dead-code-slice conv/gather graphs).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from vidar_tpu.ops import dcn_pallas


def timeit(tag, f, *a, n=5):
    out = f(*a)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    print(f'{tag}: {(time.perf_counter()-t0)/n*1e3:.1f} ms/call', flush=True)


def bench(b, h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    q = h * w
    sx = jnp.asarray(rng.uniform(0, w - 1, (b, q, 9)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0, h - 1, (b, q, 9)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, q, 9)).astype(np.float32))
    tag = f'{h}x{w}x{c}'
    timeit(f'{tag} ref(take) ', jax.jit(dcn_pallas._dcn_sample_ref),
           x, sx, sy, mask)
    def take_bf16(x, sx, sy, mask):
        # the production resnet.py path: bf16 packed table, f32 einsum
        from vidar_tpu.ops.gather import (bilinear_weights, pack_corners_2d,
                                          take_rows)
        b, h, w, c = x.shape
        _, q, s = sx.shape
        packed = pack_corners_2d(x)
        rows = packed.shape[1]
        row, cw = bilinear_weights(sx.reshape(b, -1), sy.reshape(b, -1),
                                   h, w)
        offs = (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
        g = take_rows(packed.reshape(b * rows, 4 * c), row + offs)
        g = g.reshape(b, q * s, 4, c)
        out = jnp.einsum('bncd,bnc->bnd', g.astype(jnp.float32),
                         cw.astype(jnp.float32))
        return out.reshape(b, q, s, c) * mask[..., None]

    xb = x.astype(jnp.bfloat16)
    timeit(f'{tag} take bf16 ', jax.jit(take_bf16), xb, sx, sy, mask)
    timeit(f'{tag} pallas    ', jax.jit(dcn_pallas.dcn_sample),
           x, sx, sy, mask)
    timeit(f'{tag} dcn16     ', jax.jit(dcn_pallas.dcn_sample16),
           xb, sx, sy, mask)


bench(6, 58, 100, 256)   # RN101 stage 3
bench(6, 29, 50, 512)    # RN101 stage 4
