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
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), abstract_state)


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


def import_torch_checkpoint(pth_path: str, params, *,
                            depth: int = 101,
                            stage_with_dcn=(False, False, True, True)):
    """Load a reference ``.pth`` and graft matching weights into ``params``.

    Round-1 scope: the image backbone (the FCOS3D-pretrained init the released
    configs start from). Full-model key mapping (encoder/head) lands with the
    real-data training path.
    """
    import torch
    ckpt = torch.load(pth_path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    sd = {k: v.numpy() if hasattr(v, 'numpy') else v for k, v in sd.items()}

    prefix = ('img_backbone.' if any(k.startswith('img_backbone.')
                                     for k in sd) else 'backbone.')
    backbone = import_torch_backbone(sd, depth=depth,
                                     stage_with_dcn=stage_with_dcn,
                                     prefix=prefix)

    params = jax.tree.map(lambda x: x, params)  # shallow copy
    tgt = params['params']['img_backbone']

    def graft(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    graft(dst[k], v)
            else:
                if k in dst:
                    assert dst[k].shape == v.shape, (
                        f'{k}: {dst[k].shape} vs {v.shape}')
                    dst[k] = jnp.asarray(v)

    import flax
    flat_params = flax.core.unfreeze(params)
    graft(flat_params['params']['img_backbone'], backbone)
    return flat_params
