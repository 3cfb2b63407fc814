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


def _run_co128(monkeypatch, flag):
    monkeypatch.setenv('VIDAR_TPU_DCN16', flag)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 256)), jnp.bfloat16)
    mod = DeformConv2d(features=128, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(1), p.shape, p.dtype), params)
    out = np.asarray(mod.apply(params, x).astype(jnp.float32))
    g = jax.grad(lambda p: (mod.apply(p, x).astype(jnp.float32) ** 2).sum()
                 )(params)
    return out, g


def test_dcn_conv16_module_matches_take(monkeypatch):
    """co=128 routes through the fully-fused dcn_conv16 — output AND
    parameter gradients must match the take path."""
    from vidar_tpu.ops import dcn_pallas
    assert dcn_pallas.dcn_conv16_available(8, 10, 256, 128)
    take, g_take = _run_co128(monkeypatch, '0')
    fused, g_fused = _run_co128(monkeypatch, 'force')
    np.testing.assert_allclose(fused, take, atol=2e-2, rtol=2e-2)
    # grad parity by cosine similarity: the take path rounds its tap
    # cotangent through bf16 (autodiff of the bf16 matmul) while the fused
    # backward keeps it f32, so elementwise tolerances misfire on the
    # offset-conv grads; direction/scale agreement is the meaningful check
    # (the strict correctness anchor is test_dcn_conv16_grad_multi_chunk).
    fa = jax.tree_util.tree_leaves_with_path(g_fused)
    fb = dict((jax.tree_util.keystr(k), v)
              for k, v in jax.tree_util.tree_leaves_with_path(g_take))
    for k, a in fa:
        b = np.asarray(fb[jax.tree_util.keystr(k)], np.float32).ravel()
        a = np.asarray(a, np.float32).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom == 0:
            continue
        cos = float(a @ b / denom)
        assert cos > 0.999, (jax.tree_util.keystr(k), cos)
        ratio = np.linalg.norm(a) / max(np.linalg.norm(b), 1e-9)
        assert 0.98 < ratio < 1.02, (jax.tree_util.keystr(k), ratio)
