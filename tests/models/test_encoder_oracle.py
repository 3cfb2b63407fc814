"""Full-stack torch-oracle parity: one BEVFormer layer and the multi-layer
encoder vs a pure-torch re-derivation of the reference semantics
(reference modules/temporal_self_attention.py:176-261,
spatial_cross_attention.py:74-174,349-371, encoder.py:94-156,158-253,
encoder_v2.py:52-209), evaluated with OUR modules' own weights.

The oracles mirror the reference math (softmax granularity, queue fold
order, z-anchor offset split, visibility count normalization, fp32
throughout) so any semantic drift in the JAX modules fails here at 1e-4.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vidar_tpu.models.attention import (SpatialCrossAttention,
                                        TemporalSelfAttention)
from vidar_tpu.models.encoder import (BEVFormerEncoder, BEVFormerLayer,
                                      point_sampling, reference_points_2d,
                                      reference_points_3d)

HEADS = 8


def t(x):
    return torch.from_numpy(np.asarray(x).copy()).float()


def dense(p, x):
    return x @ t(p['kernel']) + t(p['bias'])


def layer_norm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * t(p['scale']) + t(p['bias'])


def torch_msda(value, shapes, loc, weights):
    """Reference multi_scale_deformable_attn_pytorch semantics
    (spatial_cross_attention.py:392-394 fallback): per-level bilinear
    grid_sample at 2*loc-1, weighted sum over (levels, points).

    value [B, V, H, D]; loc [B, Q, H, L, P, 2]; weights [B, Q, H, L, P].
    """
    b, _, h, d = value.shape
    q = loc.shape[1]
    out = torch.zeros(b, q, h, d)
    start = 0
    for lvl, (hh, ww) in enumerate(shapes):
        v = value[:, start:start + hh * ww].permute(0, 2, 3, 1)
        v = v.reshape(b * h, d, hh, ww)
        g = loc[:, :, :, lvl] * 2 - 1                   # [B, Q, H, P, 2]
        g = g.permute(0, 2, 1, 3, 4).reshape(b * h, q, -1, 2)
        s = F.grid_sample(v, g, mode='bilinear', padding_mode='zeros',
                          align_corners=False)          # [B*H, D, Q, P]
        s = s.reshape(b, h, d, q, -1)
        wl = weights[:, :, :, lvl].permute(0, 2, 1, 3)  # [B, H, Q, P]
        out = out + (s * wl[:, :, None]).sum(-1).permute(0, 3, 1, 2)
        start += hh * ww
    return out.reshape(b, q, h * d)


def torch_tsa(p, query, value_pair, ref_pair, bev_h, bev_w, qpos,
              num_points=4):
    """Reference TemporalSelfAttention forward (:176-261) with our
    batch-major queue fold (identical at bs=1, the reference's only
    supported batch)."""
    bs, n, c = query.shape
    identity = query
    q = query + qpos if qpos is not None else query
    qcat = torch.cat([value_pair[:, 0], q], -1)
    pr = p['proj']
    nq, lv, pp = 2, 1, num_points
    off = dense(pr['sampling_offsets'], qcat).reshape(
        bs, n, HEADS, nq, lv, pp, 2)
    w = dense(pr['attention_weights'], qcat).reshape(bs, n, HEADS, nq,
                                                     lv * pp)
    w = torch.softmax(w, -1).reshape(bs, n, HEADS, nq, lv, pp)
    vp = dense(pr['value_proj'], value_pair)
    hd = c // HEADS
    vp = vp.reshape(bs * nq, n, HEADS, hd)
    off = off.permute(0, 3, 1, 2, 4, 5, 6).reshape(bs * nq, n, HEADS, lv,
                                                   pp, 2)
    w = w.permute(0, 3, 1, 2, 4, 5).reshape(bs * nq, n, HEADS, lv, pp)
    ref = ref_pair.reshape(bs * nq, n, 1, lv, 1, 2)
    norm = torch.tensor([bev_w, bev_h], dtype=torch.float32)
    loc = ref + off / norm
    out = torch_msda(vp, [(bev_h, bev_w)], loc, w)
    out = out.reshape(bs, nq, n, c).mean(1)
    return dense(p['output_proj'], out) + identity


def torch_sca(p, query, value, ref_cam, bev_mask, shapes, num_points=8,
              qpos=None):
    """Reference SpatialCrossAttention (:74-174) in the dense-masked form:
    per-camera deform attention, invisible-query contributions zeroed,
    sum over cameras / per-query hit count."""
    bs, n, c = query.shape
    cams, _, _, num_z = bev_mask.shape
    identity = query
    q = query + qpos if qpos is not None else query
    pr = p['deformable_attention']
    lv, pp = len(shapes), num_points
    off = dense(pr['sampling_offsets'], q).reshape(bs, n, HEADS, lv, pp, 2)
    w = torch.softmax(
        dense(pr['attention_weights'], q).reshape(bs, n, HEADS, lv * pp),
        -1).reshape(bs, n, HEADS, lv, pp)
    vp = dense(pr['value_proj'], value)          # [bs, cams, V, C]
    hd = c // HEADS
    vp = vp.reshape(bs, cams, -1, HEADS, hd)
    norm = torch.tensor([[wd, ht] for (ht, wd) in shapes],
                        dtype=torch.float32)
    offn = off / norm[None, None, None, :, None, :]
    ppz = pp // num_z
    visible = bev_mask.any(-1).permute(1, 0, 2).float()  # [bs, cams, n]
    ref = ref_cam.permute(1, 0, 2, 3, 4)                 # [bs,cams,n,D,2]
    slots = torch.zeros(bs, n, c)
    for ci in range(cams):
        o = offn.reshape(bs, n, HEADS, lv, ppz, num_z, 2)
        r = ref[:, ci][:, :, None, None, None, :, :]
        loc = (r + o).reshape(bs, n, HEADS, lv, pp, 2)
        co = torch_msda(vp[:, ci], shapes, loc, w)
        slots = slots + co * visible[:, ci][..., None]
    count = visible.sum(1).clamp(min=1.0)
    slots = slots / count[..., None]
    return dense(p['output_proj'], slots) + identity


def torch_ffn(p, x):
    h = F.relu(dense(p['fc1']['linear'], x))
    return x + dense(p['fc2']['linear'], h)


def torch_layer(p, query, value_pair, ref_pair, cam_value, ref_cam,
                bev_mask, bev_pos, bev_h, bev_w, shapes,
                latent_oracle=None):
    q = torch_tsa(p['attentions_0'], query, value_pair, ref_pair,
                  bev_h, bev_w, bev_pos)
    q = layer_norm(p['norms_0'], q)
    q = torch_sca(p['attentions_1'], q, cam_value, ref_cam, bev_mask,
                  shapes)
    q = layer_norm(p['norms_1'], q)
    if latent_oracle is not None:
        q = latent_oracle(q)
    q = torch_ffn(p['ffns_0'], q)
    return layer_norm(p['norms_2'], q)


def _make_inputs(rng, bs, bev_h, bev_w, cams, shapes, embed):
    n = bev_h * bev_w
    v_len = sum(h * w for h, w in shapes)
    query = rng.standard_normal((bs, n, embed)).astype(np.float32)
    prev = rng.standard_normal((bs, n, embed)).astype(np.float32)
    bev_pos = rng.standard_normal((bs, n, embed)).astype(np.float32)
    cam_value = rng.standard_normal((bs, cams, v_len, embed)) \
        .astype(np.float32)
    num_z = 4
    ref_cam = rng.uniform(0.05, 0.95, (cams, bs, n, num_z, 2)) \
        .astype(np.float32)
    bev_mask = rng.uniform(size=(cams, bs, n, num_z)) > 0.6
    # every query visible in >= 1 camera keeps count-normalization simple
    bev_mask[0, :, :, 0] = True
    ref2 = reference_points_2d(bev_h, bev_w)
    ref_pair = np.stack([np.broadcast_to(ref2[None], (bs, n, 2))] * 2,
                        axis=1)[:, :, :, None, :].astype(np.float32)
    return query, prev, bev_pos, cam_value, ref_cam, bev_mask, ref_pair


def test_bevformer_layer_matches_torch_oracle():
    rng = np.random.default_rng(0)
    bs, bev_h, bev_w, cams, embed = 1, 12, 12, 2, 64
    shapes = ((8, 12), (4, 6))
    query, prev, bev_pos, cam_value, ref_cam, bev_mask, ref_pair = \
        _make_inputs(rng, bs, bev_h, bev_w, cams, shapes, embed)
    value_pair = np.stack([prev, query], axis=1)

    layer = BEVFormerLayer(embed_dims=embed, feedforward_channels=128,
                           num_cams=cams, sca_num_levels=len(shapes),
                           sca_capacity_ratio=0.0, bev_h=bev_h, bev_w=bev_w,
                           spatial_shapes=shapes)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(query),
                        jnp.asarray(value_pair), jnp.asarray(ref_pair),
                        jnp.asarray(cam_value), jnp.asarray(ref_cam),
                        jnp.asarray(bev_mask), jnp.asarray(bev_pos))
    # zero-init offset/weight projections never leave the reference point —
    # randomize every parameter so sampling locations actually spread
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(tree, [
        jax.random.normal(k, l.shape, l.dtype) * 0.1
        for k, l in zip(keys, leaves)])

    got = np.asarray(layer.apply(
        params, jnp.asarray(query), jnp.asarray(value_pair),
        jnp.asarray(ref_pair), jnp.asarray(cam_value),
        jnp.asarray(ref_cam), jnp.asarray(bev_mask), jnp.asarray(bev_pos)))

    p = jax.tree.map(np.asarray, params['params'])
    want = torch_layer(p, t(query), t(value_pair), t(ref_pair),
                       t(cam_value), t(ref_cam),
                       torch.from_numpy(bev_mask.copy()), t(bev_pos),
                       bev_h, bev_w, shapes).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_sca_capacity_path_matches_oracle():
    """The compacted (static-capacity) SCA must agree with the dense
    oracle when no camera overflows the capacity."""
    rng = np.random.default_rng(1)
    bs, bev_h, bev_w, cams, embed = 1, 12, 12, 2, 64
    shapes = ((8, 12), (4, 6))
    query, _, _, cam_value, ref_cam, bev_mask, _ = \
        _make_inputs(rng, bs, bev_h, bev_w, cams, shapes, embed)
    bev_mask = np.asarray(bev_mask)
    bev_mask[:] = False
    bev_mask[0, :, :40, 0] = True
    bev_mask[1, :, 30:80, 1] = True

    sca = SpatialCrossAttention(embed_dims=embed, num_cams=cams,
                                deform_num_levels=len(shapes),
                                capacity_ratio=0.6)
    params = sca.init(jax.random.PRNGKey(0), jnp.asarray(query),
                      jnp.asarray(cam_value), jnp.asarray(ref_cam),
                      jnp.asarray(bev_mask), shapes)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    params = jax.tree.unflatten(tree, [
        jax.random.normal(k, l.shape, l.dtype) * 0.1
        for k, l in zip(keys, leaves)])
    got = np.asarray(sca.apply(params, jnp.asarray(query),
                               jnp.asarray(cam_value), jnp.asarray(ref_cam),
                               jnp.asarray(bev_mask), shapes))
    p = jax.tree.map(np.asarray, params['params'])
    want = torch_sca(p, t(query), t(cam_value), t(ref_cam),
                     torch.from_numpy(bev_mask.copy()), shapes).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_full_encoder_matches_torch_oracle():
    """Multi-layer encoder (latent render stripped: its own oracle lives in
    test_latent_rendering.py) incl. point_sampling, prev-BEV queue
    handling and the ego-shift on slot 0."""
    rng = np.random.default_rng(2)
    bs, bev_h, bev_w, cams, embed = 1, 12, 12, 2, 64
    shapes = ((8, 12), (4, 6))
    n = bev_h * bev_w
    v_len = sum(h * w for h, w in shapes)
    num_layers = 2
    pc_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    img_hw = (64, 96)

    bev_query = rng.standard_normal((bs, n, embed)).astype(np.float32)
    prev_bev = rng.standard_normal((bs, n, embed)).astype(np.float32)
    bev_pos = rng.standard_normal((bs, n, embed)).astype(np.float32)
    cam_value = rng.standard_normal((bs, cams, v_len, embed)) \
        .astype(np.float32)
    lidar2img = np.stack([np.stack([
        np.diag([30.0, 30.0, 1.0, 1.0]) +
        rng.standard_normal((4, 4)) * 0.1 for _ in range(cams)])
        for _ in range(bs)]).astype(np.float32)
    shift = np.asarray([[0.01, -0.02]], np.float32)

    enc = BEVFormerEncoder(num_layers=num_layers, embed_dims=embed,
                           num_cams=cams, pc_range=pc_range,
                           bev_h=bev_h, bev_w=bev_w,
                           feedforward_channels=128,
                           sca_num_levels=len(shapes),
                           sca_capacity_ratio=0.0,
                           latent_render_lids=())
    args = (jnp.asarray(bev_query), jnp.asarray(cam_value), shapes,
            jnp.asarray(bev_pos), jnp.asarray(lidar2img), img_hw,
            jnp.asarray(prev_bev), jnp.ones((bs,), bool),
            jnp.asarray(shift))
    params = enc.init(jax.random.PRNGKey(0), *args)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    params = jax.tree.unflatten(tree, [
        jax.random.normal(k, l.shape, l.dtype) * 0.1
        for k, l in zip(keys, leaves)])
    got = np.asarray(enc.apply(params, *args))

    # ---- torch oracle ----
    ref3 = reference_points_3d(bev_h, bev_w, pc_range[5] - pc_range[2], 4)
    ref_cam_j, bev_mask_j = point_sampling(
        jnp.asarray(ref3), pc_range, jnp.asarray(lidar2img), img_hw)
    # torch mirror of point_sampling for independence
    xyz = np.stack([ref3[..., 0] * (pc_range[3] - pc_range[0]) + pc_range[0],
                    ref3[..., 1] * (pc_range[4] - pc_range[1]) + pc_range[1],
                    ref3[..., 2] * (pc_range[5] - pc_range[2]) + pc_range[2]],
                   -1)
    homo = np.concatenate([xyz, np.ones_like(xyz[..., :1])], -1)
    proj = np.einsum('bcij,dnj->bcdni', lidar2img, homo)
    z = proj[..., 2:3]
    xy = proj[..., :2] / np.maximum(z, 1e-5)
    x = xy[..., 0] / img_hw[1]
    y = xy[..., 1] / img_hw[0]
    mask = (z[..., 0] > 1e-5) & (y > 0) & (y < 1) & (x > 0) & (x < 1)
    ref_cam = np.stack([x, y], -1).transpose(1, 0, 3, 2, 4)
    bev_mask = mask.transpose(1, 0, 3, 2)
    np.testing.assert_allclose(np.asarray(ref_cam_j), ref_cam, atol=1e-5)
    assert (np.asarray(bev_mask_j) == bev_mask).all()

    ref2 = reference_points_2d(bev_h, bev_w)
    ref_prev = ref2[None] + shift[:, None, :]
    ref_pair = np.stack([ref_prev, np.broadcast_to(ref2[None], (bs, n, 2))],
                        axis=1)[:, :, :, None, :].astype(np.float32)
    value_pair = np.stack([prev_bev, bev_query], axis=1)

    p = jax.tree.map(np.asarray, params['params'])
    q = t(bev_query)
    for lid in range(num_layers):
        q = torch_layer(p[f'layers_{lid}'], q, t(value_pair), t(ref_pair),
                        t(cam_value), t(ref_cam),
                        torch.from_numpy(bev_mask.copy()), t(bev_pos),
                        bev_h, bev_w, shapes)
    np.testing.assert_allclose(got, q.numpy(), atol=1e-4, rtol=1e-4)


def test_encoder_no_prev_uses_layer_query_queue():
    """Without a previous BEV the TSA value queue must be the CURRENT
    layer's query in both slots (reference encoder.py:210-219), not the
    frozen initial bev_query."""
    rng = np.random.default_rng(3)
    bs, bev_h, bev_w, cams, embed = 1, 8, 8, 2, 64
    shapes = ((4, 6),)
    n = bev_h * bev_w
    v_len = sum(h * w for h, w in shapes)
    bev_query = rng.standard_normal((bs, n, embed)).astype(np.float32)
    bev_pos = rng.standard_normal((bs, n, embed)).astype(np.float32)
    cam_value = rng.standard_normal((bs, cams, v_len, embed)) \
        .astype(np.float32)
    lidar2img = np.broadcast_to(np.diag([20.0, 20.0, 1.0, 1.0]),
                                (bs, cams, 4, 4)).astype(np.float32)
    shift = np.zeros((bs, 2), np.float32)

    enc = BEVFormerEncoder(num_layers=2, embed_dims=embed, num_cams=cams,
                           bev_h=bev_h, bev_w=bev_w,
                           feedforward_channels=128,
                           sca_num_levels=len(shapes),
                           sca_capacity_ratio=0.0, latent_render_lids=())
    args_no_prev = (jnp.asarray(bev_query), jnp.asarray(cam_value), shapes,
                    jnp.asarray(bev_pos), jnp.asarray(lidar2img), (32, 48),
                    jnp.asarray(rng.standard_normal((bs, n, embed))
                                .astype(np.float32)),
                    jnp.zeros((bs,), bool), jnp.asarray(shift))
    params = enc.init(jax.random.PRNGKey(0), *args_no_prev)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    params = jax.tree.unflatten(tree, [
        jax.random.normal(k, l.shape, l.dtype) * 0.1
        for k, l in zip(keys, leaves)])
    got = np.asarray(enc.apply(params, *args_no_prev))

    ref3 = reference_points_3d(bev_h, bev_w, 8.0, 4)
    ref_cam_j, bev_mask_j = point_sampling(
        jnp.asarray(ref3), enc.pc_range, jnp.asarray(lidar2img), (32, 48))
    ref2 = reference_points_2d(bev_h, bev_w)
    ref_pair = np.stack([np.broadcast_to(ref2[None], (bs, n, 2))] * 2,
                        axis=1)[:, :, :, None, :].astype(np.float32)
    p = jax.tree.map(np.asarray, params['params'])
    q = t(bev_query)
    for lid in range(2):
        vp = torch.stack([q, q], dim=1)   # layer query, NOT initial query
        q = torch_layer(p[f'layers_{lid}'], q, vp, t(ref_pair),
                        t(cam_value), t(np.asarray(ref_cam_j)),
                        torch.from_numpy(np.asarray(bev_mask_j).copy()),
                        t(bev_pos), bev_h, bev_w, shapes)
    np.testing.assert_allclose(got, q.numpy(), atol=1e-4, rtol=1e-4)


def torch_pred_msda(p, query, value, ref_points, shapes, num_points=4,
                    qpos=None):
    """Reference PredictionMSDeformableAttention (vidar_decoder.py:289-516):
    plain deform attention with output_proj/residual inside."""
    bs, n, c = query.shape
    identity = query
    q = query + qpos if qpos is not None else query
    pr = p['proj']
    lv, pp = len(shapes), num_points
    off = dense(pr['sampling_offsets'], q).reshape(bs, n, HEADS, lv, pp, 2)
    w = torch.softmax(
        dense(pr['attention_weights'], q).reshape(bs, n, HEADS, lv * pp),
        -1).reshape(bs, n, HEADS, lv, pp)
    if value is None:
        value = query
    vp = dense(pr['value_proj'], value).reshape(bs, -1, HEADS, c // HEADS)
    norm = torch.tensor([[wd, ht] for (ht, wd) in shapes],
                        dtype=torch.float32)
    loc = (ref_points[:, :, None, :, None, :] +
           off / norm[None, None, None, :, None, :])
    out = torch_msda(vp, shapes, loc, w)
    return dense(p['output_proj'], out) + identity


def test_prediction_decoder_matches_torch_oracle():
    """Future-decoder stack (self-attn at tgt_points, cross-attn over the
    multi-frame memory, FFN) vs the torch re-derivation of reference
    vidar_decoder.py:25-280."""
    from vidar_tpu.models.vidar_decoder import PredictionDecoder

    rng = np.random.default_rng(4)
    bs, bev_h, bev_w, embed, frames, layers = 1, 10, 12, 64, 2, 2
    n = bev_h * bev_w
    query = rng.standard_normal((bs, n, embed)).astype(np.float32)
    prev = rng.standard_normal((bs, frames, n, embed)).astype(np.float32)
    bev_pos = rng.standard_normal((bs, n, embed)).astype(np.float32)
    tgt = rng.uniform(0.05, 0.95, (bs, n, 2)).astype(np.float32)
    ref = rng.uniform(0.05, 0.95, (bs, n, frames, 2)).astype(np.float32)

    dec = PredictionDecoder(num_layers=layers, embed_dims=embed,
                            feedforward_channels=128,
                            num_memory_frames=frames)
    params = dec.init(jax.random.PRNGKey(0), jnp.asarray(query),
                      jnp.asarray(prev), jnp.asarray(tgt), jnp.asarray(ref),
                      jnp.asarray(bev_pos), bev_h, bev_w)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(tree, [
        jax.random.normal(k, l.shape, l.dtype) * 0.1
        for k, l in zip(keys, leaves)])
    got = np.asarray(dec.apply(params, jnp.asarray(query), jnp.asarray(prev),
                               jnp.asarray(tgt), jnp.asarray(ref),
                               jnp.asarray(bev_pos), bev_h, bev_w))

    p = jax.tree.map(np.asarray, params['params'])
    q = t(query)
    mem = t(prev).reshape(bs, frames * n, embed)
    shapes_f = tuple((bev_h, bev_w) for _ in range(frames))
    inter = []
    for lid in range(layers):
        lp = p[f'layers_{lid}']
        q = torch_pred_msda(lp['attentions_0'], q, None,
                            t(tgt)[:, :, None, :], ((bev_h, bev_w),),
                            qpos=t(bev_pos))
        q = layer_norm(lp['norms_0'], q)
        q = torch_pred_msda(lp['attentions_1'], q, mem, t(ref), shapes_f,
                            qpos=t(bev_pos))
        q = layer_norm(lp['norms_1'], q)
        q = torch_ffn(lp['ffns_0'], q)
        q = layer_norm(lp['norms_2'], q)
        inter.append(q)
    want = torch.stack(inter).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
