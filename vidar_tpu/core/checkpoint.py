"""Checkpointing: Orbax save/restore + torch ``.pth`` import shim.

Replaces the reference's mmcv CheckpointHook / ``load_from`` machinery
(SURVEY §5; reference vidar_1_8_nusc_3future.py:400,408). The torch import
shim maps released reference checkpoints (``r101_dcn_fcos3d_pretrain.pth``
backbone weights and full ViDAR checkpoints) onto this framework's parameter
tree so published weights can be reused for numerical parity.

Key mapping rules (torch state_dict -> flax params):
  * Linear: weight [out,in] -> kernel [in,out] (transposed); bias unchanged.
  * Conv2d: weight [out,in,kh,kw] -> kernel [kh,kw,in,out] (NHWC).
  * Frozen BN (weight,bias,running_mean,running_var) -> folded (scale,bias):
      scale = gamma / sqrt(var + eps); bias = beta - mean * scale.
  * DCNv2: conv_offset.weight like Conv2d; main weight [out,in,3,3] ->
    [9*in, out] matmul kernel in tap-major (ky, kx) order.
  * Module lists `layers.N.*` -> `layers_N/*`, attentions/norms/ffns alike.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- orbax

def save_checkpoint(path: str, state, *, keep: int = 1) -> None:
    """Save a (train) state. In multihost runs this is a COLLECTIVE: every
    process must call it with the same (shared-filesystem) path — orbax
    coordinates internally and the primary process writes replicated
    arrays (the reference's rank-0 mmcv CheckpointHook equivalent)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


def load_params_partial(path: str, params):
    """Initialise from a previous stage's orbax checkpoint whose param tree
    may differ (e.g. ViDAR pretrain -> BEVFormer fine-tune: the encoder /
    backbone subtrees transfer, the future head does not — the reference's
    ``load_from`` + mmcv load_state_dict(strict=False) contract).

    Copies every leaf whose path exists in both trees with matching shape;
    returns (params, num_loaded, num_skipped)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))
    src = raw.get('params', raw) if isinstance(raw, dict) else raw

    stats = {'loaded': 0, 'skipped': 0}

    def merge(dst, s):
        if not isinstance(dst, dict):
            return dst
        out = {}
        for k, v in dst.items():
            if isinstance(s, dict) and k in s:
                if isinstance(v, dict):
                    out[k] = merge(v, s[k])
                elif (hasattr(s[k], 'shape') and
                      tuple(s[k].shape) == tuple(v.shape)):
                    out[k] = jnp.asarray(s[k], v.dtype)
                    stats['loaded'] += 1
                else:
                    out[k] = v
                    stats['skipped'] += 1
            else:
                out[k] = v
                stats['skipped'] += 1
        return out

    import flax
    plain = flax.core.unfreeze(params) if hasattr(params, 'unfreeze') \
        else params
    merged = merge(plain, src)
    return merged, stats['loaded'], stats['skipped']


# ------------------------------------------------------------ torch import

BN_EPS = 1e-5


def _fold_bn(sd: Mapping[str, np.ndarray], prefix: str):
    gamma = np.asarray(sd[f'{prefix}.weight'], np.float32)
    beta = np.asarray(sd[f'{prefix}.bias'], np.float32)
    mean = np.asarray(sd[f'{prefix}.running_mean'], np.float32)
    var = np.asarray(sd[f'{prefix}.running_var'], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    bias = beta - mean * scale
    return scale, bias


def _conv_w(sd, key):
    # [out, in, kh, kw] -> [kh, kw, in, out]
    return np.asarray(sd[key], np.float32).transpose(2, 3, 1, 0)


def _dcn_w(sd, key):
    # [out, in, 3, 3] -> [(ky kx in), out] tap-major to match DeformConv2d
    w = np.asarray(sd[key], np.float32)  # out, in, ky, kx
    w = w.transpose(2, 3, 1, 0)  # ky, kx, in, out
    return w.reshape(-1, w.shape[-1])


def _linear_w(sd, key):
    return np.asarray(sd[key], np.float32).T


def import_torch_backbone(sd: Mapping[str, np.ndarray],
                          depth: int = 101,
                          stage_with_dcn=(False, False, True, True),
                          prefix: str = 'img_backbone.') -> Dict[str, Any]:
    """Map a torch ResNet state_dict onto our ResNet param tree."""
    from ..models.resnet import ARCH_SETTINGS
    blocks = ARCH_SETTINGS[depth]
    p: Dict[str, Any] = {}

    p['conv1'] = {'kernel': _conv_w(sd, f'{prefix}conv1.weight')}
    s, b = _fold_bn(sd, f'{prefix}bn1')
    p['bn1'] = {'scale': s, 'bias': b}

    for stage, num_blocks in enumerate(blocks):
        for i in range(num_blocks):
            src = f'{prefix}layer{stage + 1}.{i}'
            dst = f'layer{stage + 1}_{i}'
            blk: Dict[str, Any] = {}
            blk['conv1'] = {'kernel': _conv_w(sd, f'{src}.conv1.weight')}
            if stage_with_dcn[stage]:
                blk['conv2'] = {
                    'kernel': _dcn_w(sd, f'{src}.conv2.weight'),
                    'conv_offset': {
                        'kernel': _conv_w(sd, f'{src}.conv2.conv_offset.weight'),
                        'bias': np.asarray(
                            sd[f'{src}.conv2.conv_offset.bias'], np.float32),
                    },
                }
            else:
                blk['conv2'] = {'kernel': _conv_w(sd, f'{src}.conv2.weight')}
            blk['conv3'] = {'kernel': _conv_w(sd, f'{src}.conv3.weight')}
            for bn in ('bn1', 'bn2', 'bn3'):
                s, b = _fold_bn(sd, f'{src}.{bn}')
                blk[bn] = {'scale': s, 'bias': b}
            if f'{src}.downsample.0.weight' in sd:
                blk['downsample_conv'] = {
                    'kernel': _conv_w(sd, f'{src}.downsample.0.weight')}
                s, b = _fold_bn(sd, f'{src}.downsample.1')
                blk['downsample_bn'] = {'scale': s, 'bias': b}
            p[dst] = blk
    return p


def _map_linear(sd, src, dst: Dict[str, Any], key: str = 'linear'):
    if f'{src}.weight' not in sd:
        return
    dst[key] = {'kernel': _linear_w(sd, f'{src}.weight'),
                'bias': np.asarray(sd[f'{src}.bias'], np.float32)}


def _map_dense(sd, src, dst: Dict[str, Any], name: str):
    if f'{src}.weight' in sd:
        dst[name] = {'kernel': _linear_w(sd, f'{src}.weight'),
                     'bias': np.asarray(sd[f'{src}.bias'], np.float32)}


def _map_ln(sd, src, dst: Dict[str, Any], name: str):
    if f'{src}.weight' in sd:
        dst[name] = {'scale': np.asarray(sd[f'{src}.weight'], np.float32),
                     'bias': np.asarray(sd[f'{src}.bias'], np.float32)}


def _map_can_bus_mlp(sd, src) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _map_linear(sd, f'{src}.0', out.setdefault('fc0', {}))
    _map_linear(sd, f'{src}.2', out.setdefault('fc1', {}))
    _map_ln(sd, f'{src}.norm', out, 'norm')
    return out


def _map_ffn(sd, src) -> Dict[str, Any]:
    # mmcv FFN: layers.0.0 = fc1, layers.1 = fc2
    out: Dict[str, Any] = {}
    _map_linear(sd, f'{src}.layers.0.0', out.setdefault('fc1', {}))
    _map_linear(sd, f'{src}.layers.1', out.setdefault('fc2', {}))
    return out


def _map_deform_proj(sd, src) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    _map_dense(sd, f'{src}.sampling_offsets', out, 'sampling_offsets')
    _map_dense(sd, f'{src}.attention_weights', out, 'attention_weights')
    _map_dense(sd, f'{src}.value_proj', out, 'value_proj')
    return out


def _map_latent_render(sd, src) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    # num_pred_fcs=0 -> unsup_raymarching_head.0 is the occ Linear
    _map_linear(sd, f'{src}.unsup_raymarching_head.0',
                out.setdefault('occ_head', {}))
    _map_linear(sd, f'{src}.lora_a', out.setdefault('lora_a', {}))
    _map_linear(sd, f'{src}.lora_b', out.setdefault('lora_b', {}))
    return out


def _map_encoder_layer(sd, src, with_latent: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    tsa = {'proj': _map_deform_proj(sd, f'{src}.attentions.0')}
    _map_dense(sd, f'{src}.attentions.0.output_proj', tsa, 'output_proj')
    out['attentions_0'] = tsa
    sca = {'deformable_attention': _map_deform_proj(
        sd, f'{src}.attentions.1.deformable_attention')}
    _map_dense(sd, f'{src}.attentions.1.output_proj', sca, 'output_proj')
    out['attentions_1'] = sca
    for i in range(3):
        _map_ln(sd, f'{src}.norms.{i}', out, f'norms_{i}')
    out['ffns_0'] = _map_ffn(sd, f'{src}.ffns.0')
    if with_latent and f'{src}.latent_render.lora_a.weight' in sd:
        out['latent_render'] = _map_latent_render(sd, f'{src}.latent_render')
    return out


def _map_decoder_layer(sd, src, with_latent: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for ai in (0, 1):
        attn = {'proj': _map_deform_proj(sd, f'{src}.attentions.{ai}')}
        _map_dense(sd, f'{src}.attentions.{ai}.output_proj', attn,
                   'output_proj')
        out[f'attentions_{ai}'] = attn
    for i in range(3):
        _map_ln(sd, f'{src}.norms.{i}', out, f'norms_{i}')
    out['ffns_0'] = _map_ffn(sd, f'{src}.ffns.0')
    if with_latent and f'{src}.latent_render.lora_a.weight' in sd:
        out['latent_render'] = _map_latent_render(sd, f'{src}.latent_render')
    return out


def _map_pos_encoding(sd, src) -> Dict[str, Any]:
    if f'{src}.row_embed.weight' not in sd:
        return {}
    return {'row_embed': np.asarray(sd[f'{src}.row_embed.weight'],
                                    np.float32),
            'col_embed': np.asarray(sd[f'{src}.col_embed.weight'],
                                    np.float32)}


def _map_fpn(sd, prefix='img_neck.') -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    i = 0
    while f'{prefix}lateral_convs.{i}.conv.weight' in sd:
        out[f'lateral_convs_{i}'] = {
            'kernel': _conv_w(sd, f'{prefix}lateral_convs.{i}.conv.weight'),
            'bias': np.asarray(sd[f'{prefix}lateral_convs.{i}.conv.bias'],
                               np.float32)}
        i += 1
    i = 0
    while f'{prefix}fpn_convs.{i}.conv.weight' in sd:
        out[f'fpn_convs_{i}'] = {
            'kernel': _conv_w(sd, f'{prefix}fpn_convs.{i}.conv.weight'),
            'bias': np.asarray(sd[f'{prefix}fpn_convs.{i}.conv.bias'],
                               np.float32)}
        i += 1
    return out


def _map_mha(sd, src, num_heads: int = 8) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

    in_proj_weight [3C, C] splits into q/k/v [C, C]; flax stores
    kernel [C, heads, head_dim] (input-major) and out kernel
    [heads, head_dim, C]."""
    if f'{src}.attn.in_proj_weight' not in sd:
        return {}
    w = np.asarray(sd[f'{src}.attn.in_proj_weight'], np.float32)
    b = np.asarray(sd[f'{src}.attn.in_proj_bias'], np.float32)
    c = w.shape[1]
    hd = c // num_heads
    out: Dict[str, Any] = {}
    for i, name in enumerate(('query', 'key', 'value')):
        out[name] = {
            'kernel': w[i * c:(i + 1) * c].T.reshape(c, num_heads, hd),
            'bias': b[i * c:(i + 1) * c].reshape(num_heads, hd)}
    ow = np.asarray(sd[f'{src}.attn.out_proj.weight'], np.float32)
    ob = np.asarray(sd[f'{src}.attn.out_proj.bias'], np.float32)
    out['out'] = {'kernel': ow.T.reshape(num_heads, hd, c), 'bias': ob}
    return out


def _map_det_decoder_layer(sd, src) -> Dict[str, Any]:
    """DetectionTransformerDecoder layer (reference modules/decoder.py:
    52-345): MHA self-attn + CustomMSDeformableAttention cross-attn."""
    out: Dict[str, Any] = {}
    mha = _map_mha(sd, f'{src}.attentions.0')
    if mha:
        out['self_attn'] = mha
    cross: Dict[str, Any] = {'proj': _map_deform_proj(
        sd, f'{src}.attentions.1')}
    _map_dense(sd, f'{src}.attentions.1.output_proj', cross, 'output_proj')
    out['cross_attn'] = cross
    for i in range(3):
        _map_ln(sd, f'{src}.norms.{i}', out, f'norms_{i}')
    out['ffns_0'] = _map_ffn(sd, f'{src}.ffns.0')
    return out


def map_det_head_state_dict(sd: Mapping[str, np.ndarray], *,
                            num_decoder_layers: int = 6,
                            num_reg_fcs: int = 2,
                            prefix: str = 'pts_bbox_head.'
                            ) -> Dict[str, Any]:
    """Reference fine-tune ``BEVFormerHead`` (DETR det head) -> our
    ``pts_bbox_head_det`` subtree (reference bevformer_head.py:63-110:
    cls branch = [Linear, LN, ReLU] x num_reg_fcs + Linear; reg branch =
    [Linear, ReLU] x num_reg_fcs + Linear)."""
    out: Dict[str, Any] = {}
    if f'{prefix}query_embedding.weight' not in sd:
        return out
    out['query_embedding'] = np.asarray(
        sd[f'{prefix}query_embedding.weight'], np.float32)
    _map_dense(sd, f'{prefix}transformer.reference_points', out,
               'reference_points')
    for lid in range(num_decoder_layers):
        layer = _map_det_decoder_layer(
            sd, f'{prefix}transformer.decoder.layers.{lid}')
        if layer:
            out[f'layers_{lid}'] = layer
        # cls Sequential indices: Linear at 3k, LN at 3k+1; final at 3n
        for i in range(num_reg_fcs):
            _map_linear(sd, f'{prefix}cls_branches.{lid}.{3 * i}',
                        out.setdefault(f'cls_branches_{lid}_fc{i}', {}))
            _map_ln(sd, f'{prefix}cls_branches.{lid}.{3 * i + 1}', out,
                    f'cls_branches_{lid}_ln{i}')
        _map_linear(sd, f'{prefix}cls_branches.{lid}.{3 * num_reg_fcs}',
                    out.setdefault(f'cls_branches_{lid}_out', {}))
        # reg Sequential indices: Linear at 2k; final at 2n
        for i in range(num_reg_fcs):
            _map_linear(sd, f'{prefix}reg_branches.{lid}.{2 * i}',
                        out.setdefault(f'reg_branches_{lid}_fc{i}', {}))
        _map_linear(sd, f'{prefix}reg_branches.{lid}.{2 * num_reg_fcs}',
                    out.setdefault(f'reg_branches_{lid}_out', {}))
    return {k: v for k, v in out.items()
            if not (isinstance(v, dict) and not v)}


class RecordingDict(dict):
    """Wraps a state_dict and records which keys were read — the import
    shim's completeness ledger (``unconsumed()`` lists reference tensors no
    mapping rule touched)."""

    def __init__(self, data):
        super().__init__(data)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def unconsumed(self, ignore_suffixes=('num_batches_tracked',)):
        return sorted(k for k in self if k not in self.read and
                      not any(k.endswith(s) for s in ignore_suffixes))


def map_vidar_state_dict(sd: Mapping[str, np.ndarray], *,
                         depth: int = 101,
                         stage_with_dcn=(False, False, True, True),
                         encoder_layers: int = 6,
                         decoder_layers: int = 3) -> Dict[str, Any]:
    """Full reference-ViDAR state_dict -> our param tree (nested dicts)."""
    out: Dict[str, Any] = {}
    if any(k.startswith('img_backbone.') for k in sd):
        out['img_backbone'] = import_torch_backbone(
            sd, depth=depth, stage_with_dcn=stage_with_dcn)
    if any(k.startswith('img_neck.') for k in sd):
        out['img_neck'] = _map_fpn(sd)

    # --- BEV head / perception transformer ---
    if 'pts_bbox_head.bev_embedding.weight' in sd:
        head: Dict[str, Any] = {
            'bev_embedding': np.asarray(
                sd['pts_bbox_head.bev_embedding.weight'], np.float32),
            'positional_encoding': _map_pos_encoding(
                sd, 'pts_bbox_head.positional_encoding'),
        }
        tr: Dict[str, Any] = {}
        if 'pts_bbox_head.transformer.level_embeds' in sd:
            tr['level_embeds'] = np.asarray(
                sd['pts_bbox_head.transformer.level_embeds'], np.float32)
            tr['cams_embeds'] = np.asarray(
                sd['pts_bbox_head.transformer.cams_embeds'], np.float32)
        tr['can_bus_mlp'] = _map_can_bus_mlp(
            sd, 'pts_bbox_head.transformer.can_bus_mlp')
        enc: Dict[str, Any] = {}
        for lid in range(encoder_layers):
            enc[f'layers_{lid}'] = _map_encoder_layer(
                sd, f'pts_bbox_head.transformer.encoder.layers.{lid}',
                with_latent=True)
        tr['encoder'] = enc
        head['transformer'] = tr
        out['pts_bbox_head'] = head

    # --- future prediction head ---
    if 'future_pred_head.bev_embedding.weight' in sd:
        fh: Dict[str, Any] = {
            'bev_embedding': np.asarray(
                sd['future_pred_head.bev_embedding.weight'], np.float32),
            'prev_frame_embedding': np.asarray(
                sd['future_pred_head.prev_frame_embedding'], np.float32),
            'positional_encoding': _map_pos_encoding(
                sd, 'future_pred_head.positional_encoding'),
            'can_bus_mlp': _map_can_bus_mlp(
                sd, 'future_pred_head.can_bus_mlp'),
        }
        dec: Dict[str, Any] = {}
        for lid in range(decoder_layers):
            dec[f'layers_{lid}'] = _map_decoder_layer(
                sd, f'future_pred_head.transformer.decoder.layers.{lid}',
                with_latent=True)
        fh['transformer'] = dec
        for lvl in range(decoder_layers):
            _map_linear(sd, f'future_pred_head.bev_pred_head.{lvl}.0',
                        fh.setdefault(f'bev_pred_head_{lvl}_out', {}))
        out['future_pred_head'] = fh

    # --- fine-tune detection head (reference bevformer_head.py) ---
    det = map_det_head_state_dict(sd)
    if det:
        out['pts_bbox_head_det'] = det
    if 'pts_bbox_head' in out:
        # the BEVFormer fine-tune model names its encoder head
        # pts_bbox_head_bev (the reference shares one pts_bbox_head module;
        # grafting skips whichever alias the target tree lacks)
        out['pts_bbox_head_bev'] = out['pts_bbox_head']
    return out


def import_torch_checkpoint(pth_path: str, params, *,
                            depth: int = 101,
                            stage_with_dcn=(False, False, True, True),
                            strict_report: bool = True):
    """Load a reference ``.pth`` and graft matching weights into ``params``.

    Handles both the FCOS3D backbone init (``r101_dcn_fcos3d_pretrain.pth``)
    and full released ViDAR checkpoints (backbone + encoder + future head).
    Unmatched target leaves keep their fresh init; a summary is printed when
    ``strict_report``.
    """
    import torch
    import flax
    ckpt = torch.load(pth_path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}
    if not any(k.startswith('img_backbone.') for k in sd) and any(
            k.startswith('backbone.') for k in sd):
        sd = {('img_backbone.' + k[len('backbone.'):]
               if k.startswith('backbone.') else k): v for k, v in sd.items()}

    sd = RecordingDict(sd)
    mapped = map_vidar_state_dict(sd, depth=depth,
                                  stage_with_dcn=stage_with_dcn)

    flat_params = flax.core.unfreeze(jax.tree.map(lambda x: x, params))
    stats = {'matched': 0, 'shape_mismatch': 0}

    def graft(dst, src, path=''):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst and isinstance(dst[k], dict):
                    graft(dst[k], v, f'{path}/{k}')
            else:
                if k in dst:
                    if dst[k].shape == v.shape:
                        dst[k] = jnp.asarray(v)
                        stats['matched'] += 1
                    else:
                        stats['shape_mismatch'] += 1
                        if strict_report:
                            print(f'shape mismatch at {path}/{k}: '
                                  f'{dst[k].shape} vs {v.shape}')

    graft(flat_params['params'], mapped)
    if strict_report:
        left = sd.unconsumed()
        print(f"torch import: {stats['matched']} tensors grafted, "
              f"{stats['shape_mismatch']} shape mismatches, "
              f"{len(left)} reference tensors unmapped")
        for k in left[:20]:
            print(f'  unmapped: {k}')
    return flat_params
