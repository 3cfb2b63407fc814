"""Chamfer distance vs a brute-force numpy oracle."""

import numpy as np
import jax.numpy as jnp

from vidar_tpu.ops import chamfer_distance, chamfer_distance_masked


def test_chamfer_masked_matches_bruteforce():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((130, 3)).astype(np.float32)
    dst = rng.standard_normal((77, 3)).astype(np.float32)
    src_mask = rng.uniform(size=130) > 0.2
    dst_mask = rng.uniform(size=77) > 0.3

    l_src, l_dst, i_src, i_dst = chamfer_distance_masked(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(src_mask), jnp.asarray(dst_mask), tile=32)

    d = ((src[:, None] - dst[None]) ** 2).sum(-1)
    d_masked = np.where(dst_mask[None, :], d, 1e10)
    want_src = d_masked.min(1)[src_mask].mean()
    d_masked_t = np.where(src_mask[:, None], d, 1e10)
    want_dst = d_masked_t.min(0)[dst_mask].mean()

    # rtol 1e-3: fp32 argmin near-ties may select an epsilon-worse neighbour.
    np.testing.assert_allclose(float(l_src), want_src, rtol=1e-3)
    np.testing.assert_allclose(float(l_dst), want_dst, rtol=1e-3)
    # distances at the returned indices must equal the reported minima
    got_idx = np.asarray(i_src)[src_mask]
    np.testing.assert_allclose(
        d[src_mask, got_idx],
        d_masked.min(1)[src_mask], rtol=1e-3)


def test_chamfer_symmetric_zero():
    pts = np.random.default_rng(0).standard_normal((50, 3)).astype(np.float32)
    cd = chamfer_distance(jnp.asarray(pts), jnp.asarray(pts), tile=16)
    assert float(cd) < 1e-5
