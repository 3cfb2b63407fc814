"""grid_sample parity vs torch.nn.functional.grid_sample (CPU oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vidar_tpu.ops import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize('h,w,n', [(7, 5, 33), (16, 16, 128)])
def test_grid_sample_2d_matches_torch(h, w, n):
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, h, w, 4)).astype(np.float32)
    # include far out-of-range points to test zero padding
    grid = rng.uniform(-1.6, 1.6, size=(2, n, 2)).astype(np.float32)

    got = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(grid).reshape(2, n, 1, 2)
    want = F.grid_sample(t_feat, t_grid, mode='bilinear',
                         padding_mode='zeros', align_corners=False)
    want = want.squeeze(-1).permute(0, 2, 1).numpy()  # [B, N, C]

    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.default_rng(1)
    d, h, w, n = 6, 9, 5, 77
    feat = rng.standard_normal((2, d, h, w, 3)).astype(np.float32)
    grid = rng.uniform(-1.5, 1.5, size=(2, n, 3)).astype(np.float32)

    got = np.asarray(grid_sample_3d(jnp.asarray(feat), jnp.asarray(grid)))

    t_feat = torch.from_numpy(feat).permute(0, 4, 1, 2, 3)  # NCDHW
    t_grid = torch.from_numpy(grid).reshape(2, n, 1, 1, 3)
    want = F.grid_sample(t_feat, t_grid, mode='bilinear',
                         padding_mode='zeros', align_corners=False)
    want = want.reshape(2, 3, n).permute(0, 2, 1).numpy()

    np.testing.assert_allclose(got, want, atol=1e-5)
