"""Attention module tests: SCA capacity path == dense path; TSA smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.models.attention import (SpatialCrossAttention,
                                        TemporalSelfAttention)


def _make_sca_inputs(rng, bs=1, q=64, cams=3, d=2, dim=32):
    shapes = ((8, 8), (4, 4))
    v = sum(h * w for h, w in shapes)
    query = rng.standard_normal((bs, q, dim)).astype(np.float32)
    value = rng.standard_normal((bs, cams, v, dim)).astype(np.float32)
    ref = rng.uniform(0, 1, (cams, bs, q, d, 2)).astype(np.float32)
    # wedge-like visibility: each cam sees a contiguous ~40% of queries
    mask = np.zeros((cams, bs, q, d), bool)
    for c in range(cams):
        lo = (c * q) // cams
        hi = min(q, lo + int(0.4 * q))
        mask[c, :, lo:hi] = True
    return shapes, query, value, ref, mask


def test_sca_capacity_matches_dense():
    rng = np.random.default_rng(0)
    shapes, query, value, ref, mask = _make_sca_inputs(rng)

    kw = dict(embed_dims=32, num_cams=3, deform_num_levels=2,
              deform_num_points=4)
    dense = SpatialCrossAttention(capacity_ratio=0.0, **kw)
    compact = SpatialCrossAttention(capacity_ratio=0.5, **kw)

    key = jax.random.PRNGKey(0)
    args = (jnp.asarray(query), jnp.asarray(value), jnp.asarray(ref),
            jnp.asarray(mask), shapes)
    params = dense.init(key, *args)
    out_dense = dense.apply(params, *args)
    out_compact = compact.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out_dense),
                               np.asarray(out_compact), atol=1e-5)


def test_sca_invisible_queries_keep_residual():
    rng = np.random.default_rng(1)
    shapes, query, value, ref, mask = _make_sca_inputs(rng)
    mask[:] = False
    mask[0, :, :4] = True  # only 4 queries visible in cam 0

    sca = SpatialCrossAttention(embed_dims=32, num_cams=3,
                                deform_num_levels=2, deform_num_points=4,
                                capacity_ratio=0.5)
    key = jax.random.PRNGKey(0)
    args = (jnp.asarray(query), jnp.asarray(value), jnp.asarray(ref),
            jnp.asarray(mask), shapes)
    params = sca.init(key, *args)
    out = np.asarray(sca.apply(params, *args))
    # invisible queries: slots==0 -> output = output_proj bias + residual
    bias = np.asarray(
        params['params']['output_proj']['bias'])
    np.testing.assert_allclose(out[0, 10], query[0, 10] + bias, atol=1e-5)


def test_tsa_queue_fusion():
    """No-prev case must equal a queue of [query, query]."""
    rng = np.random.default_rng(2)
    bs, n, dim = 1, 16, 32
    bev_h = bev_w = 4
    query = jnp.asarray(rng.standard_normal((bs, n, dim)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(0, 1, (bs, n, 1, 2)).astype(np.float32))
    ref_pair = jnp.stack([ref, ref], axis=1).reshape(bs, 2, n, 1, 2)

    tsa = TemporalSelfAttention(embed_dims=dim, num_points=2)
    key = jax.random.PRNGKey(0)
    params = tsa.init(key, query, None, ref_pair, bev_h, bev_w)
    out_none = tsa.apply(params, query, None, ref_pair, bev_h, bev_w)
    pair = jnp.stack([query, query], axis=1)
    out_pair = tsa.apply(params, query, pair, ref_pair, bev_h, bev_w)
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_pair),
                               atol=1e-6)


def test_stable_partition_matches_argsort():
    import numpy as np
    import jax.numpy as jnp
    from vidar_tpu.models.attention import _stable_partition_indices
    rng = np.random.default_rng(7)
    for shape, p in [((2, 6, 400), 0.3), ((1, 3, 64), 0.9), ((4, 33), 0.0)]:
        vis = rng.random(shape) < p
        got = np.asarray(_stable_partition_indices(jnp.asarray(vis)))
        want = np.argsort(~vis, axis=-1, kind='stable')
        np.testing.assert_array_equal(got, want)
