"""dcnv3_core parity vs a pure-torch oracle of the DCNv3 sampling math.

Oracle mirrors the reference semantics
(ops_dcnv3/functions/dcnv3_func.py dcnv3_core_pytorch): grouped deformable
aggregation, K taps per group, softmax modulation, bilinear zero-padded
sampling.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vidar_tpu.ops import dcnv3_core


def torch_dcnv3_oracle(x, offset, mask, kernel, stride, dilation, groups):
    b, h, w, c = x.shape
    kh, kw = kernel
    k = kh * kw
    sh, sw = stride
    dh, dw = dilation
    ho, wo = offset.shape[1], offset.shape[2]
    gc = c // groups

    off = offset.reshape(b, ho, wo, groups, k, 2)
    m = torch.softmax(mask.reshape(b, ho, wo, groups, k), dim=-1)

    ys = torch.arange(ho, dtype=torch.float32) * sh
    xs = torch.arange(wo, dtype=torch.float32) * sw
    gy, gx = torch.meshgrid(ys, xs, indexing='ij')
    ky, kx = torch.meshgrid(
        torch.arange(kh, dtype=torch.float32) * dh - dh * (kh // 2),
        torch.arange(kw, dtype=torch.float32) * dw - dw * (kw // 2),
        indexing='ij')
    base_y = gy[None, :, :, None, None] + ky.reshape(-1)
    base_x = gx[None, :, :, None, None] + kx.reshape(-1)
    sy = base_y + off[..., 0]  # [b, ho, wo, g, k]
    sx = base_x + off[..., 1]

    # grid_sample with align_corners=False over pixel-center coordinates:
    # normalized = (2*p + 1)/size - 1
    gny = (2 * sy + 1) / h - 1
    gnx = (2 * sx + 1) / w - 1
    grid = torch.stack([gnx, gny], dim=-1).reshape(b, ho * wo, groups * k, 2)

    xg = x.reshape(b, h, w, groups, gc).permute(0, 3, 4, 1, 2)  # b,g,gc,h,w
    out = torch.zeros(b, ho * wo, groups, gc)
    for g in range(groups):
        gview = grid.reshape(b, ho * wo, groups, k, 2)[:, :, g]
        s = F.grid_sample(xg[:, g], gview, mode='bilinear',
                          padding_mode='zeros', align_corners=False)
        # s: [b, gc, ho*wo, k]
        out[:, :, g] = torch.einsum('bcnk,bnk->bnc', s,
                                    m.reshape(b, ho * wo, groups, k)[:, :, g])
    return out.reshape(b, ho, wo, c)


def test_dcnv3_matches_torch():
    rng = np.random.default_rng(7)
    b, h, w, groups, gc = 2, 9, 11, 3, 4
    c = groups * gc
    kernel, stride, dilation = (3, 3), (1, 1), (1, 1)
    k = kernel[0] * kernel[1]
    ho, wo = h, w
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, ho, wo, groups * k * 2)) * 2).astype(
        np.float32)
    mask = rng.standard_normal((b, ho, wo, groups * k)).astype(np.float32)

    got = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), kernel=kernel,
                                stride=stride, dilation=dilation,
                                groups=groups))
    want = torch_dcnv3_oracle(torch.from_numpy(x), torch.from_numpy(offset),
                              torch.from_numpy(mask), kernel, stride,
                              dilation, groups).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dcnv3_stride_dilation():
    rng = np.random.default_rng(11)
    b, h, w, groups, gc = 1, 12, 10, 2, 3
    c = groups * gc
    kernel, stride, dilation = (3, 3), (2, 2), (2, 2)
    k = kernel[0] * kernel[1]
    ho, wo = h // 2, w // 2
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((b, ho, wo, groups * k * 2))).astype(
        np.float32)
    mask = rng.standard_normal((b, ho, wo, groups * k)).astype(np.float32)

    got = np.asarray(dcnv3_core(jnp.asarray(x), jnp.asarray(offset),
                                jnp.asarray(mask), kernel=kernel,
                                stride=stride, dilation=dilation,
                                groups=groups))
    want = torch_dcnv3_oracle(torch.from_numpy(x), torch.from_numpy(offset),
                              torch.from_numpy(mask), kernel, stride,
                              dilation, groups).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
