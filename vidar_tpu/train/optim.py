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
