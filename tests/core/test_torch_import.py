"""`.pth` import shim proof (VERDICT round-1 item 5).

Builds a reference-shaped synthetic ``state_dict`` with torch — key names
follow the reference modules exactly (mmdet ResNet/FPN, BEVFormer encoder,
ViDAR future head, fine-tune det head) — runs ``import_torch_checkpoint``,
and asserts:

* every reference tensor is CONSUMED by a mapping rule (``RecordingDict``
  ledger — the test fails if a reference key goes unmapped);
* every mapped tensor LANDS on a param leaf (matched count == leaves
  emitted, zero shape mismatches);
* spot numerical checks on each transform family (conv transpose, DCN
  packing, BN folding, linear transpose, MHA in_proj split).

The generator walks OUR param tree and emits the torch-layout tensor for
each leaf, so any naming drift between the models and the import shim
breaks the test.
"""

import numpy as np
import pytest
import flax

torch = pytest.importorskip('torch')


def _t(arr):
    return torch.from_numpy(np.ascontiguousarray(arr))


def _rand(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


class SDBuilder:
    """Accumulates reference-style keys from our param leaves."""

    def __init__(self, seed=0):
        self.sd = {}
        self.rng = np.random.default_rng(seed)
        # expected post-fold values for BN spot checks
        self.expected = {}

    def conv(self, key, kernel):
        # ours [kh, kw, in, out] -> torch [out, in, kh, kw]
        self.sd[f'{key}.weight'] = _t(
            np.asarray(kernel).transpose(3, 2, 0, 1))

    def conv_bias(self, key, kernel, bias):
        self.conv(key, kernel)
        self.sd[f'{key}.bias'] = _t(np.asarray(bias))

    def dcn(self, key, kernel):
        # ours [(ky kx in), out] -> torch [out, in, ky, kx]
        k = np.asarray(kernel)
        cin = k.shape[0] // 9
        k4 = k.reshape(3, 3, cin, k.shape[1])
        self.sd[f'{key}.weight'] = _t(k4.transpose(3, 2, 0, 1))

    def bn(self, key, scale, bias, eps=1e-5):
        """Generate weight/bias/mean/var whose fold gives (scale, bias)."""
        scale = np.asarray(scale)
        bias = np.asarray(bias)
        var = self.rng.uniform(0.5, 2.0, scale.shape).astype(np.float32)
        mean = _rand(self.rng, scale.shape)
        self.sd[f'{key}.weight'] = _t(scale * np.sqrt(var + eps))
        self.sd[f'{key}.bias'] = _t(bias + mean * scale)
        self.sd[f'{key}.running_mean'] = _t(mean)
        self.sd[f'{key}.running_var'] = _t(var)
        self.sd[f'{key}.num_batches_tracked'] = torch.tensor(100)

    def linear(self, key, kernel, bias):
        self.sd[f'{key}.weight'] = _t(np.asarray(kernel).T)
        self.sd[f'{key}.bias'] = _t(np.asarray(bias))

    def ln(self, key, scale, bias):
        self.sd[f'{key}.weight'] = _t(np.asarray(scale))
        self.sd[f'{key}.bias'] = _t(np.asarray(bias))

    def raw(self, key, arr):
        self.sd[f'{key}'] = _t(np.asarray(arr))

    def mha(self, key, sub):
        """flax MHA subtree -> torch nn.MultiheadAttention keys."""
        c = sub['query']['kernel'].shape[0]
        qkv = []
        qkv_b = []
        for name in ('query', 'key', 'value'):
            k = np.asarray(sub[name]['kernel']).reshape(c, c)   # [in, out]
            qkv.append(k.T)                                     # [out, in]
            qkv_b.append(np.asarray(sub[name]['bias']).reshape(c))
        self.sd[f'{key}.attn.in_proj_weight'] = _t(np.concatenate(qkv, 0))
        self.sd[f'{key}.attn.in_proj_bias'] = _t(np.concatenate(qkv_b, 0))
        ow = np.asarray(sub['out']['kernel']).reshape(c, c)     # [(h d), o]
        self.sd[f'{key}.attn.out_proj.weight'] = _t(ow.T)
        self.sd[f'{key}.attn.out_proj.bias'] = _t(
            np.asarray(sub['out']['bias']))


def _backbone_sd(b, tree, prefix='img_backbone'):
    b.conv(f'{prefix}.conv1', tree['conv1']['kernel'])
    b.bn(f'{prefix}.bn1', tree['bn1']['scale'], tree['bn1']['bias'])
    for name, blk in tree.items():
        if not name.startswith('layer'):
            continue
        stage, idx = name[5:].split('_')
        src = f'{prefix}.layer{stage}.{idx}'
        b.conv(f'{src}.conv1', blk['conv1']['kernel'])
        if 'conv_offset' in blk['conv2']:
            b.dcn(f'{src}.conv2', blk['conv2']['kernel'])
            b.conv_bias(f'{src}.conv2.conv_offset',
                        blk['conv2']['conv_offset']['kernel'],
                        blk['conv2']['conv_offset']['bias'])
        else:
            b.conv(f'{src}.conv2', blk['conv2']['kernel'])
        b.conv(f'{src}.conv3', blk['conv3']['kernel'])
        for bn in ('bn1', 'bn2', 'bn3'):
            b.bn(f'{src}.{bn}', blk[bn]['scale'], blk[bn]['bias'])
        if 'downsample_conv' in blk:
            b.conv(f'{src}.downsample.0',
                   blk['downsample_conv']['kernel'])
            b.bn(f'{src}.downsample.1', blk['downsample_bn']['scale'],
                 blk['downsample_bn']['bias'])


def _fpn_sd(b, tree, prefix='img_neck'):
    for name, conv in tree.items():
        kind, idx = name.rsplit('_', 1)
        b.conv_bias(f'{prefix}.{kind}.{idx}.conv', conv['kernel'],
                    conv['bias'])


def _can_bus_sd(b, tree, src):
    b.linear(f'{src}.0', tree['fc0']['linear']['kernel'],
             tree['fc0']['linear']['bias'])
    b.linear(f'{src}.2', tree['fc1']['linear']['kernel'],
             tree['fc1']['linear']['bias'])
    b.ln(f'{src}.norm', tree['norm']['scale'], tree['norm']['bias'])


def _deform_proj_sd(b, tree, src):
    for part in ('sampling_offsets', 'attention_weights', 'value_proj'):
        b.linear(f'{src}.{part}', tree[part]['kernel'], tree[part]['bias'])


def _ffn_sd(b, tree, src):
    b.linear(f'{src}.layers.0.0', tree['fc1']['linear']['kernel'],
             tree['fc1']['linear']['bias'])
    b.linear(f'{src}.layers.1', tree['fc2']['linear']['kernel'],
             tree['fc2']['linear']['bias'])


def _latent_sd(b, tree, src):
    b.linear(f'{src}.unsup_raymarching_head.0',
             tree['occ_head']['linear']['kernel'],
             tree['occ_head']['linear']['bias'])
    for lo in ('lora_a', 'lora_b'):
        b.linear(f'{src}.{lo}', tree[lo]['linear']['kernel'],
                 tree[lo]['linear']['bias'])


def _enc_layer_sd(b, tree, src):
    _deform_proj_sd(b, tree['attentions_0']['proj'], f'{src}.attentions.0')
    b.linear(f'{src}.attentions.0.output_proj',
             tree['attentions_0']['output_proj']['kernel'],
             tree['attentions_0']['output_proj']['bias'])
    _deform_proj_sd(b, tree['attentions_1']['deformable_attention'],
                    f'{src}.attentions.1.deformable_attention')
    b.linear(f'{src}.attentions.1.output_proj',
             tree['attentions_1']['output_proj']['kernel'],
             tree['attentions_1']['output_proj']['bias'])
    for i in range(3):
        b.ln(f'{src}.norms.{i}', tree[f'norms_{i}']['scale'],
             tree[f'norms_{i}']['bias'])
    _ffn_sd(b, tree['ffns_0'], f'{src}.ffns.0')
    if 'latent_render' in tree:
        _latent_sd(b, tree['latent_render'], f'{src}.latent_render')


def _dec_layer_sd(b, tree, src):
    for ai in (0, 1):
        _deform_proj_sd(b, tree[f'attentions_{ai}']['proj'],
                        f'{src}.attentions.{ai}')
        b.linear(f'{src}.attentions.{ai}.output_proj',
                 tree[f'attentions_{ai}']['output_proj']['kernel'],
                 tree[f'attentions_{ai}']['output_proj']['bias'])
    for i in range(3):
        b.ln(f'{src}.norms.{i}', tree[f'norms_{i}']['scale'],
             tree[f'norms_{i}']['bias'])
    _ffn_sd(b, tree['ffns_0'], f'{src}.ffns.0')
    if 'latent_render' in tree:
        _latent_sd(b, tree['latent_render'], f'{src}.latent_render')


def _vidar_params():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from vidar_tpu.core.config import load_config
    from vidar_tpu.core.builder import build_model
    from vidar_tpu.data import make_synthetic_batch
    cfg = load_config('configs/tiny/vidar_tiny.py')
    model = build_model(cfg['model'])
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=1, queue_length=1, future_length=1,
                                 num_cams=3, img_h=32, img_w=64,
                                 max_points=32)
    k = jax.random.PRNGKey(0)
    params = model.init({'params': k, 'dropout': k, 'aug': k}, batch,
                        train=False)
    return model, params, batch


def _count_leaves(tree):
    import jax
    return len(jax.tree.leaves(tree))


def test_vidar_pth_import_round_trip(tmp_path):
    import jax
    from vidar_tpu.core.checkpoint import (import_torch_checkpoint,
                                           map_vidar_state_dict,
                                           RecordingDict)
    model, params, batch = _vidar_params()
    p = flax.core.unfreeze(params)['params']

    b = SDBuilder()
    _backbone_sd(b, p['img_backbone'])
    _fpn_sd(b, p['img_neck'])

    head = p['pts_bbox_head']
    b.raw('pts_bbox_head.bev_embedding.weight', head['bev_embedding'])
    b.raw('pts_bbox_head.positional_encoding.row_embed.weight',
          head['positional_encoding']['row_embed'])
    b.raw('pts_bbox_head.positional_encoding.col_embed.weight',
          head['positional_encoding']['col_embed'])
    tr = head['transformer']
    b.raw('pts_bbox_head.transformer.level_embeds', tr['level_embeds'])
    b.raw('pts_bbox_head.transformer.cams_embeds', tr['cams_embeds'])
    _can_bus_sd(b, tr['can_bus_mlp'],
                'pts_bbox_head.transformer.can_bus_mlp')
    for lname, ltree in tr['encoder'].items():
        lid = lname.split('_')[1]
        _enc_layer_sd(b, ltree,
                      f'pts_bbox_head.transformer.encoder.layers.{lid}')

    fh = p['future_pred_head']
    b.raw('future_pred_head.bev_embedding.weight', fh['bev_embedding'])
    b.raw('future_pred_head.prev_frame_embedding',
          fh['prev_frame_embedding'])
    b.raw('future_pred_head.positional_encoding.row_embed.weight',
          fh['positional_encoding']['row_embed'])
    b.raw('future_pred_head.positional_encoding.col_embed.weight',
          fh['positional_encoding']['col_embed'])
    _can_bus_sd(b, fh['can_bus_mlp'], 'future_pred_head.can_bus_mlp')
    for lname, ltree in fh['transformer'].items():
        lid = lname.split('_')[1]
        _dec_layer_sd(
            b, ltree,
            f'future_pred_head.transformer.decoder.layers.{lid}')
    for key in fh:
        if key.startswith('bev_pred_head_'):
            lvl = key.split('_')[3]
            b.linear(f'future_pred_head.bev_pred_head.{lvl}.0',
                     fh[key]['linear']['kernel'], fh[key]['linear']['bias'])

    pth = str(tmp_path / 'synthetic_vidar.pth')
    torch.save({'state_dict': b.sd}, pth)

    # 1) completeness: every reference key consumed by a mapping rule
    sd_np = {k: v.numpy() for k, v in b.sd.items()}
    rec = RecordingDict(sd_np)
    mapped = map_vidar_state_dict(
        rec, depth=50, encoder_layers=2, decoder_layers=1)
    assert rec.unconsumed() == [], rec.unconsumed()

    # 2) every mapped tensor lands: graft into a DIFFERENTLY-seeded init
    # and assert each mapped leaf now equals the source params exactly
    # (round-trip through the torch layout is lossless)
    import jax as _jax
    params2 = _jax.tree.map(
        lambda x: x + np.float32(0.123), params)   # perturbed baseline
    new_params = import_torch_checkpoint(pth, params2, depth=50)
    n_mapped = _count_leaves(mapped)
    flat_new = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(new_params)['params'])
    flat_old = flax.traverse_util.flatten_dict(p)
    flat_mapped = flax.traverse_util.flatten_dict(mapped)
    restored = 0
    for path, v in flat_mapped.items():
        # mapped aliases (pts_bbox_head_bev/_det) have no target in ViDAR
        if (path[0] in ('pts_bbox_head_bev', 'pts_bbox_head_det')
                and path not in flat_new):
            continue
        assert path in flat_new, path
        np.testing.assert_allclose(
            np.asarray(flat_new[path]), np.asarray(flat_old[path]),
            rtol=1e-5, atol=1e-5, err_msg='/'.join(path))
        restored += 1
    alias = sum(1 for path in flat_mapped
                if path[0] in ('pts_bbox_head_bev', 'pts_bbox_head_det'))
    assert restored == n_mapped - alias
    # tiny-ViDAR tree: 298 reference-backed leaves land (the remaining
    # params have no reference counterpart by design)
    assert restored >= 290, restored

    # 3) spot numerical checks per transform family
    new_p = flax.core.unfreeze(new_params)['params']
    np.testing.assert_allclose(
        np.asarray(new_p['img_backbone']['conv1']['kernel']),
        b.sd['img_backbone.conv1.weight'].numpy().transpose(2, 3, 1, 0),
        rtol=1e-6)
    # BN fold: scale == weight / sqrt(var + eps)
    w = b.sd['img_backbone.bn1.weight'].numpy()
    var = b.sd['img_backbone.bn1.running_var'].numpy()
    mean = b.sd['img_backbone.bn1.running_mean'].numpy()
    bias_t = b.sd['img_backbone.bn1.bias'].numpy()
    s = w / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(
        np.asarray(new_p['img_backbone']['bn1']['scale']), s, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_p['img_backbone']['bn1']['bias']),
        bias_t - mean * s, rtol=1e-4, atol=1e-5)
    # original params preserved -> roundtrip equality on a linear
    np.testing.assert_allclose(
        np.asarray(new_p['pts_bbox_head']['transformer']['can_bus_mlp']
                   ['fc0']['linear']['kernel']),
        np.asarray(p['pts_bbox_head']['transformer']['can_bus_mlp']
                   ['fc0']['linear']['kernel']), rtol=1e-6)

    # 4) forward pass with imported params is finite
    out = model.apply(new_params, batch, train=False)
    leaves = jax.tree.leaves(out)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves
               if hasattr(x, 'dtype') and np.issubdtype(x.dtype, np.floating))


def test_det_head_pth_import(tmp_path):
    """Fine-tune det head mapping: reference bevformer_head Sequentials +
    DetectionTransformerDecoder -> pts_bbox_head_det."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from vidar_tpu.models.detection import BEVFormerHead
    from vidar_tpu.core.checkpoint import (map_det_head_state_dict,
                                           RecordingDict)

    m = BEVFormerHead(num_classes=4, num_query=8, embed_dims=32,
                      bev_h=8, bev_w=8, num_decoder_layers=2)
    params = m.init({'params': jax.random.PRNGKey(0)},
                    jnp.zeros((1, 64, 32)))
    p = flax.core.unfreeze(params)['params']

    b = SDBuilder(1)
    b.raw('pts_bbox_head.query_embedding.weight', p['query_embedding'])
    b.linear('pts_bbox_head.transformer.reference_points',
             p['reference_points']['kernel'], p['reference_points']['bias'])
    nfc = 2
    for lid in (0, 1):
        src = f'pts_bbox_head.transformer.decoder.layers.{lid}'
        lt = p[f'layers_{lid}']
        b.mha(f'{src}.attentions.0', lt['self_attn'])
        _deform_proj_sd(b, lt['cross_attn']['proj'], f'{src}.attentions.1')
        b.linear(f'{src}.attentions.1.output_proj',
                 lt['cross_attn']['output_proj']['kernel'],
                 lt['cross_attn']['output_proj']['bias'])
        for i in range(3):
            b.ln(f'{src}.norms.{i}', lt[f'norms_{i}']['scale'],
                 lt[f'norms_{i}']['bias'])
        _ffn_sd(b, lt['ffns_0'], f'{src}.ffns.0')
        for i in range(nfc):
            fc = p[f'cls_branches_{lid}_fc{i}']['linear']
            b.linear(f'pts_bbox_head.cls_branches.{lid}.{3 * i}',
                     fc['kernel'], fc['bias'])
            ln = p[f'cls_branches_{lid}_ln{i}']
            b.ln(f'pts_bbox_head.cls_branches.{lid}.{3 * i + 1}',
                 ln['scale'], ln['bias'])
        out_fc = p[f'cls_branches_{lid}_out']['linear']
        b.linear(f'pts_bbox_head.cls_branches.{lid}.{3 * nfc}',
                 out_fc['kernel'], out_fc['bias'])
        for i in range(nfc):
            fc = p[f'reg_branches_{lid}_fc{i}']['linear']
            b.linear(f'pts_bbox_head.reg_branches.{lid}.{2 * i}',
                     fc['kernel'], fc['bias'])
        out_fc = p[f'reg_branches_{lid}_out']['linear']
        b.linear(f'pts_bbox_head.reg_branches.{lid}.{2 * nfc}',
                 out_fc['kernel'], out_fc['bias'])

    sd_np = {k: v.numpy() for k, v in b.sd.items()}
    rec = RecordingDict(sd_np)
    mapped = map_det_head_state_dict(rec, num_decoder_layers=2)
    assert rec.unconsumed() == [], rec.unconsumed()

    # grafting the mapped tree onto the head params must hit every leaf
    def graft_count(dst, src):
        n = 0
        for k, v in src.items():
            if isinstance(v, dict):
                assert k in dst, k
                n += graft_count(dst[k], v)
            else:
                assert k in dst, k
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                n += 1
        return n

    n = graft_count(p, mapped)
    assert n == _count_leaves(mapped)
    # MHA split spot check: query kernel row 0 == in_proj_weight col 0
    q = mapped['layers_0']['self_attn']['query']['kernel']
    w = sd_np['pts_bbox_head.transformer.decoder.layers.0'
              '.attentions.0.attn.in_proj_weight']
    np.testing.assert_allclose(q.reshape(32, 32), w[:32].T, rtol=1e-6)
