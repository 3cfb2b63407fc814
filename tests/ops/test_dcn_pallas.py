"""Pallas DCN tap-sampling parity vs the XLA reference formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidar_tpu.ops import dcn_pallas


def _data(b=2, h=6, w=9, c=256, q=11, s=9, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    sx = jnp.asarray(rng.uniform(-1.5, w + 0.5, (b, q, s))
                     .astype(np.float32))
    sy = jnp.asarray(rng.uniform(-1.5, h + 0.5, (b, q, s))
                     .astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, q, s)).astype(np.float32))
    return x, sx, sy, mask


def test_dcn_sample_matches_ref():
    x, sx, sy, mask = _data()
    got = np.asarray(dcn_pallas.dcn_sample(x, sx, sy, mask))
    want = np.asarray(dcn_pallas._dcn_sample_ref(x, sx, sy, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dcn_sample_column_split(monkeypatch):
    monkeypatch.setattr(dcn_pallas, 'TABLE_BUDGET_BYTES', 200_000)
    x, sx, sy, mask = _data(h=8, w=12)
    assert len(dcn_pallas._col_chunks(8, 12, 256)) > 1
    got = np.asarray(dcn_pallas.dcn_sample(x, sx, sy, mask))
    want = np.asarray(dcn_pallas._dcn_sample_ref(x, sx, sy, mask))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dcn_sample16_matches_ref():
    x, sx, sy, mask = _data(q=16)
    got = np.asarray(dcn_pallas.dcn_sample16(x, sx, sy, mask))
    want = np.asarray(dcn_pallas._dcn_sample16_ref_perm(x, sx, sy, mask))
    # bit-exact: both paths see bf16-rounded values and fold in f32
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dcn_sample16_wide_channels():
    x, sx, sy, mask = _data(c=512, q=8)
    got = np.asarray(dcn_pallas.dcn_sample16(x, sx, sy, mask))
    want = np.asarray(dcn_pallas._dcn_sample16_ref_perm(x, sx, sy, mask))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dcn_sample16_grad_matches_ref():
    x, sx, sy, mask = _data(q=5)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    gf = jax.grad(loss(dcn_pallas.dcn_sample16), argnums=(0, 1, 2, 3))(
        x, sx, sy, mask)
    gr = jax.grad(loss(dcn_pallas._dcn_sample16_ref_perm),
                  argnums=(0, 1, 2, 3))(x, sx, sy, mask)
    # dx: the autodiff reference rounds the cotangent through bf16 (vjp of
    # x.astype(bf16)); the hand-rolled backward keeps it f32 — compare at
    # bf16 tolerance. Coord/mask grads match at f32 tolerance.
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=1e-4, rtol=1e-2)
    for a, b in zip(gf[1:], gr[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_dcn_sample16_grad_multi_chunk():
    """The chunked backward must agree with autodiff of the reference when
    q spans several chunks with a ragged tail (pad queries contribute 0)."""
    import functools
    x, sx, sy, mask = _data(q=11)

    gf = jax.grad(
        lambda *a: (dcn_pallas.dcn_sample16(*a) ** 2).sum(),
        argnums=(0, 1, 2, 3))(x, sx, sy, mask)
    # force 3 chunks (q=11, qc=4 -> pad to 12)
    orig = dcn_pallas._dcn_sample16_vbwd
    dcn_pallas.dcn_sample16.defvjp(
        dcn_pallas._dcn_sample16_vfwd,
        functools.partial(orig, q_chunk=4))
    try:
        gc = jax.grad(
            lambda *a: (dcn_pallas.dcn_sample16(*a) ** 2).sum(),
            argnums=(0, 1, 2, 3))(x, sx, sy, mask)
    finally:
        dcn_pallas.dcn_sample16.defvjp(dcn_pallas._dcn_sample16_vfwd, orig)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_dcn_channel_perm_roundtrip():
    c = 8
    perm = dcn_pallas.dcn16_channel_perm(c)
    assert sorted(perm) == list(range(c))
    assert perm == [0, 2, 4, 6, 1, 3, 5, 7]


def test_dcn_sample_grad_matches_ref():
    x, sx, sy, mask = _data(q=5)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    gf = jax.grad(loss(dcn_pallas.dcn_sample), argnums=(0, 1, 2, 3))(
        x, sx, sy, mask)
    gr = jax.grad(loss(dcn_pallas._dcn_sample_ref), argnums=(0, 1, 2, 3))(
        x, sx, sy, mask)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _conv_data(b=2, h=6, w=9, c=256, co=128, q=11, s=9, seed=3):
    x, sx, sy, mask = _data(b=b, h=h, w=w, c=c, q=q, s=s, seed=seed)
    rng = np.random.default_rng(seed + 1)
    kperm = jnp.asarray(
        rng.standard_normal((s * c, co)).astype(np.float32) * 0.05)
    return x, sx, sy, mask, kperm


def test_dcn_conv16_matches_unfused_ref():
    x, sx, sy, mask, kperm = _conv_data()
    got = np.asarray(dcn_pallas.dcn_conv16(x, sx, sy, mask, kperm))
    want = np.asarray(dcn_pallas._dcn_conv16_ref(x, sx, sy, mask, kperm))
    # both paths: bf16 taps x bf16 kernel with f32 accumulation
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_dcn_conv16_grad_matches_ref():
    x, sx, sy, mask, kperm = _conv_data(q=5)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    gf = jax.grad(loss(dcn_pallas.dcn_conv16), argnums=(0, 1, 2, 3, 4))(
        x, sx, sy, mask, kperm)
    gr = jax.grad(loss(dcn_pallas._dcn_conv16_ref), argnums=(0, 1, 2, 3, 4))(
        x, sx, sy, mask, kperm)
    # dx at bf16 tolerance (the ref rounds its cotangent through bf16);
    # the rest at a few-bf16-ulp tolerance (bf16 matmul chains)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=5e-3, rtol=2e-2)
    for a, b in zip(gf[1:], gr[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=2e-2)


def test_dcn_conv16_grad_multi_chunk():
    import functools
    x, sx, sy, mask, kperm = _conv_data(q=11)
    gf = jax.grad(
        lambda *a: (dcn_pallas.dcn_conv16(*a) ** 2).sum(),
        argnums=(0, 1, 2, 3, 4))(x, sx, sy, mask, kperm)
    orig = dcn_pallas._dcn_conv16_vbwd
    dcn_pallas.dcn_conv16.defvjp(
        dcn_pallas._dcn_conv16_vfwd, functools.partial(orig, q_chunk=4))
    try:
        gc = jax.grad(
            lambda *a: (dcn_pallas.dcn_conv16(*a) ** 2).sum(),
            argnums=(0, 1, 2, 3, 4))(x, sx, sy, mask, kperm)
    finally:
        dcn_pallas.dcn_conv16.defvjp(dcn_pallas._dcn_conv16_vfwd, orig)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
