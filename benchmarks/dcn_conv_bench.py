"""dcn16_conv_gather (fused DCN gather+fold+conv) at RN101 stage shapes.

Round-4: the per-8-query conv matmul was MXU weight-tile/fill-latency
bound; taps are now staged in VMEM and convolved 128 queries at a time.
Compares against the unfused dcn_sample16 + XLA matmul.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

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
    print(f'{tag}: {(time.perf_counter()-t0)/n*1e3:.2f} ms/call', flush=True)


def bench(b, h, w, c, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    q = h * w
    s = 9
    sx = jnp.asarray(rng.uniform(0, w - 1, (b, q, s)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0, h - 1, (b, q, s)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, q, s)).astype(np.float32))
    kperm = jnp.asarray(rng.normal(size=(s * c, co)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    tag = f'{h}x{w}x{c}->{co}'

    def unfused(x, sx, sy, mask, kperm):
        taps = dcn_pallas.dcn_sample16(x, sx, sy, mask)  # [b,q,s,c] perm'd
        return jnp.einsum('bqk,ko->bqo',
                          taps.reshape(b, q, s * c).astype(jnp.bfloat16),
                          kperm, preferred_element_type=jnp.float32)

    for qb in (128, 256):
        f = jax.jit(lambda x, sx, sy, mask, kperm, qb=qb:
                    dcn_pallas._dcn_conv16_fwd_impl(x, sx, sy, mask, kperm,
                                                    q_block=qb))
        try:
            timeit(f'{tag} conv16 qb={qb:3d}', f, x, sx, sy, mask, kperm)
        except Exception as e:
            print(f'{tag} conv16 qb={qb}: FAIL',
                  str(e).replace(chr(10), ' ')[:160], flush=True)
    timeit(f'{tag} unfused      ', jax.jit(unfused), x, sx, sy, mask, kperm)


bench(6, 58, 100, 256, 256)   # RN101 stage 3
bench(6, 29, 50, 512, 512)    # RN101 stage 4
