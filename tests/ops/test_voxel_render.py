"""Voxel renderer sanity: analytic single-axis rays + differentiability."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.ops.voxel_render import voxel_render


def test_empty_volume_renders_max_depth():
    """Zero sigma => transmittance 1 => pred = last in-grid distance."""
    sigma = jnp.zeros((1, 1, 4, 8, 8))
    origin = jnp.asarray([[[0.5, 4.0, 2.0]]])  # x, y, z
    points = jnp.asarray([[[7.5, 4.0, 2.0]]])  # straight +x ray
    tindex = jnp.zeros((1, 1), jnp.int32)
    pred, gt = voxel_render(sigma, origin, points, tindex, max_steps=32)
    # ray exits at x=8 -> distance 7.5; gt clamped to last boundary
    assert float(gt[0, 0]) > 0
    np.testing.assert_allclose(float(pred[0, 0]), float(gt[0, 0]), atol=0.6)


def test_opaque_wall_stops_ray():
    """A very dense wall at x=4 should pull the expected depth to ~3.5."""
    sigma = np.zeros((1, 1, 4, 8, 8), np.float32)
    sigma[0, 0, :, :, 4] = 100.0
    origin = jnp.asarray([[[0.5, 4.0, 2.0]]])
    points = jnp.asarray([[[7.5, 4.0, 2.0]]])
    tindex = jnp.zeros((1, 1), jnp.int32)
    pred, gt = voxel_render(jnp.asarray(sigma), origin, points, tindex,
                            max_steps=32)
    assert 2.5 <= float(pred[0, 0]) <= 4.6, float(pred[0, 0])


def test_padded_rays_zero():
    sigma = jnp.ones((1, 2, 4, 8, 8))
    origin = jnp.full((1, 2, 3), 4.0)
    points = jnp.asarray([[[7.0, 4.0, 2.0], [6.0, 4.0, 2.0]]])
    tindex = jnp.asarray([[-1, 1]], jnp.int32)
    pred, gt = voxel_render(sigma, origin, points, tindex, max_steps=32)
    assert float(pred[0, 0]) == 0.0 and float(gt[0, 0]) == 0.0
    assert float(pred[0, 1]) > 0.0


def test_grad_wrt_sigma_flows():
    sigma = jnp.full((1, 1, 4, 8, 8), 0.1)
    origin = jnp.asarray([[[0.5, 4.2, 2.0]]])
    points = jnp.asarray([[[7.5, 3.8, 2.2]]])
    tindex = jnp.zeros((1, 1), jnp.int32)

    def loss(s):
        pred, gt = voxel_render(s, origin, points, tindex, max_steps=32)
        return ((pred - gt) ** 2).sum()

    g = jax.grad(loss)(sigma)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
