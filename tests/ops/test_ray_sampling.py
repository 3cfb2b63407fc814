"""Frame-indexed sigma sampling vs torch 5D grid_sample oracle."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vidar_tpu.models.ray_loss import sample_sigma_frames


def test_sample_sigma_frames_matches_torch():
    rng = np.random.default_rng(7)
    bs, v, z, h, w = 2, 3, 4, 9, 11
    p, g = 25, 6
    sigma = rng.standard_normal((bs, v, z, h, w)).astype(np.float32)
    grids = rng.uniform(-2.0, [w + 2, h + 2, z + 2],
                        size=(bs, p, g, 3)).astype(np.float32)
    frame_idx = rng.integers(-1, v + 1, size=(bs, p)).astype(np.int32)

    got = np.asarray(sample_sigma_frames(
        jnp.asarray(sigma), jnp.asarray(grids), jnp.asarray(frame_idx)))

    # oracle: per (b, p) pick the volume of its frame, torch grid_sample
    want = np.zeros((bs, p, g), np.float32)
    norm = (grids / np.array([w, h, z]) * 2.0 - 1.0).astype(np.float32)
    for b in range(bs):
        for pi in range(p):
            f = frame_idx[b, pi]
            if f < 0 or f >= v:
                continue
            vol = torch.from_numpy(sigma[b, f][None, None])  # [1,1,Z,H,W]
            gr = torch.from_numpy(norm[b, pi][None, None, None])  # [1,1,1,G,3]
            s = F.grid_sample(vol, gr, mode='bilinear', padding_mode='zeros',
                              align_corners=False)
            want[b, pi] = s.reshape(-1).numpy()

    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sample_sigma_frames_chunked_matches_dense():
    """lax.map ray chunking (incl. the padded tail chunk) is exact."""
    rng = np.random.default_rng(11)
    bs, v, z, h, w = 1, 2, 4, 9, 11
    p, g = 37, 5  # 37 % 8 != 0 -> exercises the pad+slice path
    sigma = rng.standard_normal((bs, v, z, h, w)).astype(np.float32)
    grids = rng.uniform(-2.0, [w + 2, h + 2, z + 2],
                        size=(bs, p, g, 3)).astype(np.float32)
    frame_idx = rng.integers(-1, v + 1, size=(bs, p)).astype(np.int32)

    dense = np.asarray(sample_sigma_frames(
        jnp.asarray(sigma), jnp.asarray(grids), jnp.asarray(frame_idx),
        chunk=None))
    chunked = np.asarray(sample_sigma_frames(
        jnp.asarray(sigma), jnp.asarray(grids), jnp.asarray(frame_idx),
        chunk=8))
    np.testing.assert_array_equal(dense, chunked)
