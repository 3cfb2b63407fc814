"""Optimizer & LR schedule matching the reference training recipe.

Reference recipe (projects/configs/vidar_pretrain/nusc_1_8_subset/
vidar_1_8_nusc_3future.py:379-396): AdamW lr 2e-4, weight decay 0.01,
``img_backbone`` lr_mult 0.1, grad-clip L2 max-norm 35, cosine annealing to
lr*1e-3 with 500-iter linear warmup from lr/3.

Frozen parameters (the folded BatchNorms — the reference marks them
requires_grad=False via ``norm_cfg requires_grad=False``/``norm_eval``) are
masked out of the update entirely.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def cosine_annealing_schedule(base_lr: float, total_steps: int,
                              warmup_iters: int = 500,
                              warmup_ratio: float = 1.0 / 3,
                              min_lr_ratio: float = 1e-3) -> Callable:
    """mmcv CosineAnnealingLrUpdaterHook w/ linear warmup semantics."""
    min_lr = base_lr * min_lr_ratio

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1 - warmup_ratio) * warm_frac)
        prog = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        cos_lr = min_lr + (base_lr - min_lr) * 0.5 * (
            1 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_iters, jnp.minimum(warm_lr, cos_lr),
                         cos_lr)

    return schedule


def _path_str(path) -> str:
    return '/'.join(str(getattr(k, 'key', k)) for k in path)


def make_optimizer(params, *, base_lr: float = 2e-4,
                   weight_decay: float = 0.01,
                   backbone_lr_mult: float = 0.1,
                   grad_clip_norm: float = 35.0,
                   total_steps: int = 100_000,
                   warmup_iters: int = 500,
                   schedule: Callable | None = None):
    """AdamW with per-path lr multipliers and frozen-BN masking."""
    sched = schedule or cosine_annealing_schedule(
        base_lr, total_steps, warmup_iters)

    def label_fn(tree):
        def label(path, _):
            p = _path_str(path)
            if '/bn' in p or 'downsample_bn' in p or 'FrozenBN' in p or \
                    p.endswith('bn1/scale') or p.endswith('bn1/bias'):
                return 'frozen'
            if 'img_backbone' in p:
                return 'backbone'
            return 'main'
        return jax.tree_util.tree_map_with_path(label, tree)

    def adamw(lr_mult):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(
                lambda s: sched(s) * lr_mult),
        )

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.multi_transform(
            {'main': adamw(1.0),
             'backbone': adamw(backbone_lr_mult),
             'frozen': optax.set_to_zero()},
            label_fn),
    )
    return tx, sched


def layer_decay_lr_mult(path: str, *, depths, decay_rate: float) -> float:
    """InternImage/Swin layer-wise lr decay (reference
    backbones/custom_layer_decay_optimizer_constructor.py:18-105):
    stem/embeddings get layer 0; block j of stage i gets
    1 + sum(depths[:i]) + j; everything else (head) gets the last layer;
    multiplier = decay_rate ** (num_layers - layer_id - 1)."""
    num_layers = sum(depths) + 2
    layer_id = num_layers - 1
    if 'patch_embed' in path or 'stem' in path:
        layer_id = 0
    elif 'levels_' in path or '/levels/' in path:
        import re
        m = re.search(r'levels[_/](\d+).*?blocks[_/](\d+)', path)
        if m:
            stage, blk = int(m.group(1)), int(m.group(2))
            layer_id = 1 + sum(depths[:stage]) + blk
        else:
            m = re.search(r'levels[_/](\d+)', path)
            if m:
                stage = int(m.group(1))
                layer_id = 1 + sum(depths[:stage + 1]) - 1
    return decay_rate ** (num_layers - layer_id - 1)


def make_layer_decay_optimizer(params, *, base_lr: float = 2e-4,
                               weight_decay: float = 0.05,
                               depths=(4, 4, 18, 4),
                               decay_rate: float = 0.94,
                               grad_clip_norm: float = 35.0,
                               total_steps: int = 100_000,
                               warmup_iters: int = 500):
    """AdamW with per-depth lr decay for InternImage-style backbones."""
    sched = cosine_annealing_schedule(base_lr, total_steps, warmup_iters)

    mults = sorted({round(layer_decay_lr_mult(
        f'levels_{s}/blocks_{b}', depths=depths, decay_rate=decay_rate), 12)
        for s in range(len(depths)) for b in range(max(depths))}
        | {round(decay_rate ** (sum(depths) + 1), 12), 1.0})

    def label_fn(tree):
        def label(path, _):
            p = _path_str(path)
            if 'img_backbone' not in p:
                return 'm_1.0'
            m = round(layer_decay_lr_mult(p, depths=depths,
                                          decay_rate=decay_rate), 12)
            return f'm_{m}'
        return jax.tree_util.tree_map_with_path(label, tree)

    def adamw(lr_mult):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(lambda s: sched(s) * lr_mult),
        )

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.multi_transform({f'm_{m}': adamw(m) for m in mults}, label_fn),
    )
    return tx, sched
