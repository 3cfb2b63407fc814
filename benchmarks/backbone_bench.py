"""Backbone phase split at production scale (30 images, 928x1600, v5e).

Isolates plain-conv cost vs DCN tap-sampling cost: full RN101-DCN with
dcn16 / with the take path / with DCN disabled (plain 3x3 conv stage 3-4).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.models.resnet import ResNet
    from vidar_tpu.models.fpn import FPN

    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (30, 928, 1600, 3), jnp.bfloat16)

    def bench(tag, dcn, env):
        os.environ['VIDAR_TPU_DCN16'] = env
        net = ResNet(depth=101, stage_with_dcn=(False, False, dcn, dcn),
                     dtype=jnp.bfloat16)
        params = net.init(key, imgs[:1])
        f = jax.jit(net.apply)
        out = f(params, imgs)
        float(np.asarray(out[0].reshape(-1)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(params, imgs)
            float(np.asarray(out[0].reshape(-1)[0].astype(jnp.float32)))
        print(f'{tag}: {(time.perf_counter()-t0)/3*1e3:.0f} ms', flush=True)

    bench('RN101 no-DCN (plain convs)', False, '1')
    bench('RN101-DCN dcn16           ', True, '1')
    bench('RN101-DCN take path       ', True, '0')


if __name__ == '__main__':
    main()
