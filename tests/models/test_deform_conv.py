"""DeformConv2d wiring parity: dcn16 Pallas path vs the take path.

The dcn16 kernel emits per-tap channels as (evens || odds) and the module
compensates by permuting the conv kernel — this test proves the module
output is identical either way (bf16 values, so the u32 pack is exact).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.models.resnet import DeformConv2d


def _run(monkeypatch, flag):
    monkeypatch.setenv('VIDAR_TPU_DCN16', flag)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 256)),
                    jnp.bfloat16)
    mod = DeformConv2d(features=64, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    # zero-init offsets make taps land on grid; perturb so offsets are real
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(1), p.shape, p.dtype), params)
    return np.asarray(mod.apply(params, x).astype(jnp.float32))


def test_dcn16_module_matches_take(monkeypatch):
    take = _run(monkeypatch, '0')
    fused = _run(monkeypatch, 'force')   # interpret-mode Pallas on CPU
    np.testing.assert_allclose(fused, take, atol=2e-2, rtol=2e-2)
