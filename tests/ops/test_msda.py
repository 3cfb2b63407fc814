"""msdeform_attn parity vs the mmcv pure-torch reference formulation."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vidar_tpu.ops import msdeform_attn


def torch_msda_oracle(value, spatial_shapes, sampling_locations,
                      attention_weights):
    """Pure-torch oracle mirroring mmcv multi_scale_deformable_attn_pytorch."""
    bs, _, num_heads, dim = value.shape
    _, nq, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, dim, h, w)
        g = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode='bilinear', padding_mode='zeros',
                          align_corners=False)
        sampled.append(s)
    aw = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, nq, num_levels * num_points)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
    return out.view(bs, num_heads * dim, nq).transpose(1, 2).contiguous()


def test_msda_matches_torch():
    rng = np.random.default_rng(42)
    spatial_shapes = [(12, 20), (6, 10), (3, 5)]
    b, heads, dim, q, p = 2, 4, 8, 50, 3
    v_len = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((b, v_len, heads, dim)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, 3, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, q, heads, 3 * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, heads, 3, p)

    got = np.asarray(msdeform_attn(
        jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w)))

    want = torch_msda_oracle(
        torch.from_numpy(value), spatial_shapes,
        torch.from_numpy(loc), torch.from_numpy(w)).numpy()

    np.testing.assert_allclose(got, want, atol=1e-5)


def _count_fused_calls(monkeypatch):
    """Instrument the fused kernel entry so tests can assert it ran."""
    from vidar_tpu.ops import msda as msda_mod
    calls = []
    real = msda_mod._msda_fused

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(msda_mod, '_msda_fused', spy)
    return calls


def test_msda_fused_matches_torch(monkeypatch):
    """Pallas fused kernel (interpret mode on CPU) vs the torch oracle."""
    calls = _count_fused_calls(monkeypatch)
    rng = np.random.default_rng(3)
    spatial_shapes = [(12, 20), (6, 10), (3, 5)]
    b, heads, dim, q, p = 2, 4, 32, 50, 2
    v_len = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((b, v_len, heads, dim)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, 3, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, q, heads, 3 * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, heads, 3, p)

    got = np.asarray(msdeform_attn(
        jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w),
        impl='fused'))
    assert calls, 'fused kernel was silently bypassed'
    want = torch_msda_oracle(
        torch.from_numpy(value), spatial_shapes,
        torch.from_numpy(loc), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_msda_fused_production_shape_matches_torch(monkeypatch):
    """L*P >= 16 (the auto-gate regime actually used by SCA) vs oracle."""
    calls = _count_fused_calls(monkeypatch)
    rng = np.random.default_rng(7)
    spatial_shapes = [(12, 20), (6, 10), (3, 5), (2, 3)]
    b, heads, dim, q, p = 1, 2, 32, 40, 4  # L*P = 16: passes the auto gate
    v_len = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((b, v_len, heads, dim)).astype(np.float32)
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, 4, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, q, heads, 4 * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, heads, 4, p)

    got = np.asarray(msdeform_attn(
        jnp.asarray(value), spatial_shapes, jnp.asarray(loc), jnp.asarray(w),
        impl='fused'))
    assert calls, 'fused kernel was silently bypassed'
    want = torch_msda_oracle(
        torch.from_numpy(value), spatial_shapes,
        torch.from_numpy(loc), torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_msda_fused_bf16_packed_table(monkeypatch):
    """bf16 values ride the fused kernel (values upcast to the f32 table)
    and must agree with the packed path at bf16 tolerance."""
    calls = _count_fused_calls(monkeypatch)
    rng = np.random.default_rng(11)
    spatial_shapes = [(12, 20), (6, 10)]
    b, heads, dim, q, p = 1, 2, 32, 30, 3
    v_len = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((b, v_len, heads, dim)).astype(np.float32)
    loc = rng.uniform(0.0, 1.0, size=(b, q, heads, 2, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, q, heads, 2 * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, heads, 2, p)

    v16 = jnp.asarray(value).astype(jnp.bfloat16)
    got = np.asarray(msdeform_attn(
        v16, spatial_shapes, jnp.asarray(loc), jnp.asarray(w), impl='fused'))
    assert calls, 'fused kernel was silently bypassed'
    want = np.asarray(msdeform_attn(
        v16, spatial_shapes, jnp.asarray(loc), jnp.asarray(w), impl='packed'))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_msda_fused_grad_matches_packed(monkeypatch):
    import jax
    calls = _count_fused_calls(monkeypatch)
    rng = np.random.default_rng(5)
    spatial_shapes = [(6, 8), (3, 4)]
    b, heads, dim, q, p = 1, 2, 32, 9, 2
    v_len = sum(h * w for h, w in spatial_shapes)
    value = jnp.asarray(rng.standard_normal(
        (b, v_len, heads, dim)).astype(np.float32))
    # includes out-of-range locations (boundary grad semantics must match)
    loc = jnp.asarray(rng.uniform(-0.15, 1.1, (b, q, heads, 2, p, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(b, q, heads, 2, p))
                    .astype(np.float32))

    def loss(impl):
        return lambda v, l, a: (
            msdeform_attn(v, spatial_shapes, l, a, impl=impl) ** 2).sum()

    g_fused = jax.grad(loss('fused'), argnums=(0, 1, 2))(value, loc, w)
    assert calls, 'fused kernel was silently bypassed'
    g_packed = jax.grad(loss('packed'), argnums=(0, 1, 2))(value, loc, w)
    for gf, gp in zip(g_fused, g_packed):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   atol=1e-4, rtol=1e-4)


def test_msda_fused_column_split(monkeypatch):
    """Oversized levels are split into packed-column chunks; force the
    split with a tiny table budget and check fwd+grad parity."""
    import jax
    from vidar_tpu.ops import msda_pallas
    calls = _count_fused_calls(monkeypatch)
    monkeypatch.setattr(msda_pallas, 'TABLE_BUDGET_BYTES', 80_000)

    rng = np.random.default_rng(9)
    spatial_shapes = [(12, 20), (6, 10)]
    b, heads, dim, q, p = 1, 2, 32, 11, 3
    v_len = sum(h * w for h, w in spatial_shapes)
    value = jnp.asarray(rng.standard_normal(
        (b, v_len, heads, dim)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (b, q, heads, 2, p, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(b, q, heads, 2, p))
                    .astype(np.float32))

    from vidar_tpu.ops.msda import _fused_plan
    plan = _fused_plan(spatial_shapes)
    assert sum(len(g) for g in plan) > len(spatial_shapes)  # split happened

    got = np.asarray(msdeform_attn(value, spatial_shapes, loc, w,
                                   impl='fused'))
    assert calls, 'fused kernel was silently bypassed'
    want = np.asarray(msdeform_attn(value, spatial_shapes, loc, w,
                                    impl='packed'))
    np.testing.assert_allclose(got, want, atol=1e-5)

    def loss(impl):
        return lambda v, l, a: (
            msdeform_attn(v, spatial_shapes, l, a, impl=impl) ** 2).sum()

    g_fused = jax.grad(loss('fused'), argnums=(0, 1, 2))(value, loc, w)
    g_packed = jax.grad(loss('packed'), argnums=(0, 1, 2))(value, loc, w)
    for gf, gp in zip(g_fused, g_packed):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   atol=1e-4, rtol=1e-4)


def test_msda_grad_finite():
    import jax
    spatial_shapes = [(8, 8)]
    value = jnp.ones((1, 64, 2, 4))
    loc = jnp.full((1, 10, 2, 1, 2, 2), 0.5)
    w = jnp.full((1, 10, 2, 1, 2), 0.5)

    def f(v):
        return msdeform_attn(v, spatial_shapes, loc, w).sum()

    g = jax.grad(f)(value)
    assert np.isfinite(np.asarray(g)).all()


def test_msda_fused16_exact_vs_f32_table(monkeypatch):
    """bf16 values select the row-pair-packed uint32 table; since bf16 ->
    f32 widening is exact, the packed16 kernel must agree with the f32
    table kernel bit-for-bit."""
    from vidar_tpu.ops import msda as msda_mod
    from vidar_tpu.ops.msda import _msda_fused_fwd_impl, _split_levels

    rng = np.random.default_rng(13)
    spatial_shapes = ((12, 20), (6, 10))
    b, heads, dim, q, p = 1, 2, 32, 17, 3
    v_len = sum(h * w for h, w in spatial_shapes)
    value = rng.standard_normal((b, v_len, heads, dim)).astype(np.float32)
    v16 = jnp.asarray(value).astype(jnp.bfloat16)
    loc = jnp.asarray(rng.uniform(-0.1, 1.1, (b, q, heads, 2, p, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(b, q, heads, 2, p))
                    .astype(np.float32))

    lv16 = _split_levels(v16, spatial_shapes)
    got = np.asarray(_msda_fused_fwd_impl(lv16, spatial_shapes, loc, w))
    # f32 path on the SAME (bf16-rounded) values
    lv32 = _split_levels(v16.astype(jnp.float32), spatial_shapes)
    want = np.asarray(_msda_fused_fwd_impl(lv32, spatial_shapes, loc, w))
    np.testing.assert_array_equal(got, want)


def test_msda_tables_hoisted_matches_direct():
    """Table-hoisted path (pack raw once + fold value_proj per layer) vs
    projecting first and packing inside msdeform_attn — fwd and grads,
    including grads through the projection kernel/bias."""
    import jax
    from vidar_tpu.ops.msda import (pack_raw_levels, tables_from_packed_raw,
                                    msdeform_attn_tables,
                                    fused_tables_feasible)

    rng = np.random.default_rng(17)
    spatial_shapes = ((12, 20), (6, 10))
    b, heads, dim, q, p, cin = 2, 2, 32, 21, 3, 48
    assert fused_tables_feasible(spatial_shapes, dim)
    v_len = sum(h * w for h, w in spatial_shapes)
    raw = jnp.asarray(rng.standard_normal((b, v_len, cin)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((cin, heads * dim)) * 0.1,
                       jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads * dim,)) * 0.1,
                       jnp.float32)
    # includes out-of-range locations: ring corners must stay exactly zero
    # despite the bias fold
    loc = jnp.asarray(rng.uniform(-0.15, 1.1, (b, q, heads, 2, p, 2)),
                      jnp.float32)
    w = jnp.asarray(rng.uniform(size=(b, q, heads, 2, p)), jnp.float32)

    def hoisted(raw, kern, bias, loc, w):
        packed = pack_raw_levels(raw, spatial_shapes)
        tables, table_rows = tables_from_packed_raw(packed, kern, bias,
                                                    heads)
        return msdeform_attn_tables(tables, table_rows, spatial_shapes,
                                    loc, w)

    def direct(raw, kern, bias, loc, w):
        vp = (raw @ kern + bias).reshape(b, v_len, heads, dim)
        return msdeform_attn(vp, list(spatial_shapes), loc, w,
                             impl='packed')

    got = np.asarray(hoisted(raw, kern, bias, loc, w))
    want = np.asarray(direct(raw, kern, bias, loc, w))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def loss(fn):
        return lambda *a: (fn(*a) ** 2).sum()

    g_h = jax.grad(loss(hoisted), argnums=(0, 1, 2, 3, 4))(
        raw, kern, bias, loc, w)
    g_d = jax.grad(loss(direct), argnums=(0, 1, 2, 3, 4))(
        raw, kern, bias, loc, w)
    for gh, gd in zip(g_h, g_d):
        np.testing.assert_allclose(np.asarray(gh), np.asarray(gd),
                                   atol=2e-3, rtol=2e-3)


def test_sca_packed_raw_matches_unpacked():
    """SpatialCrossAttention with the encoder-hoisted packed_raw must match
    the per-layer value_proj+pack path on the same params."""
    import jax
    from vidar_tpu.models.attention import SpatialCrossAttention
    from vidar_tpu.ops.msda import pack_raw_levels, fused_tables_feasible

    rng = np.random.default_rng(23)
    spatial_shapes = ((12, 20), (6, 10))
    embed, cams, nq, d_anchor = 64, 2, 60, 4
    heads = 2  # head_dim 32 = fused DIM
    assert fused_tables_feasible(spatial_shapes, embed // heads)
    v_len = sum(h * w for h, w in spatial_shapes)
    key = __import__('jax').random.PRNGKey(0)

    sca = SpatialCrossAttention(embed_dims=embed, num_cams=cams,
                                deform_num_heads=heads,
                                deform_num_levels=len(spatial_shapes),
                                deform_num_points=4, capacity_ratio=0.5)
    query = jnp.asarray(rng.standard_normal((1, nq, embed)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((1, cams, v_len, embed)),
                        jnp.float32)
    ref_cam = jnp.asarray(rng.uniform(0, 1, (cams, 1, nq, d_anchor, 2)),
                          jnp.float32)
    bev_mask = jnp.asarray(rng.uniform(size=(cams, 1, nq, d_anchor)) > 0.5)

    params = sca.init(key, query, value, ref_cam, bev_mask, spatial_shapes)
    base = sca.apply(params, query, value, ref_cam, bev_mask,
                     spatial_shapes)
    packed = pack_raw_levels(value.reshape(cams, v_len, embed),
                             spatial_shapes)
    hoisted = sca.apply(params, query, value, ref_cam, bev_mask,
                        spatial_shapes, packed_raw=packed)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                               atol=1e-4, rtol=1e-4)


def test_msda_fused16_plan_halves_groups(monkeypatch):
    """A single-level BEV table that column-splits under f32 fits one
    packed16 group (the TSA/decoder production regime)."""
    from vidar_tpu.ops import msda_pallas
    from vidar_tpu.ops.msda import _fused_plan
    monkeypatch.setattr(msda_pallas, 'TABLE_BUDGET_BYTES', 120_000)
    shapes = ((20, 20),)   # (21*21) * 512B = 225 KB f32, 113 KB packed
    plan32 = _fused_plan(shapes)
    plan16 = _fused_plan(shapes, packed16=True)
    assert sum(len(g) for g in plan32) > 1
    assert sum(len(g) for g in plan16) == 1
