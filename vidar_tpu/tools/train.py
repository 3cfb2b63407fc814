"""Training CLI (the reference's tools/train.py + dist_train.sh equivalent).

Single entry point: JAX's runtime handles multi-host SPMD (no
torch.distributed.launch equivalent needed — run one process per host under
your launcher and the ``data`` mesh axis spans all chips).

Usage:
  python -m vidar_tpu.tools.train CONFIG [--work-dir DIR] [--resume-from CKPT]
      [--cfg-options k.ey=value ...] [--seed N] [--deterministic]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train a ViDAR model (TPU)')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume-from', default=None)
    p.add_argument('--load-from', default=None,
                   help='torch .pth or orbax checkpoint to initialise from')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--deterministic', action='store_true')
    p.add_argument('--cfg-options', nargs='+', default=None)
    p.add_argument('--max-steps', type=int, default=None,
                   help='override total steps (debug)')
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..core import enable_compilation_cache
    enable_compilation_cache()
    from ..core.config import load_config, apply_overrides, dump_config
    from ..core.builder import build_model, build_dataset
    from ..parallel import make_mesh, shard_batch, replicated_sharding
    from ..train import (create_train_state, make_optimizer, make_train_step,
                         make_det_train_step)
    from ..core.checkpoint import (save_checkpoint, load_checkpoint,
                                   import_torch_checkpoint)

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    work_dir = args.work_dir or cfg.get('work_dir') or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, 'config_dump.txt'), 'w') as f:
        f.write(dump_config(cfg))

    model_type = cfg['model'].get('type', 'ViDAR')
    if model_type == 'ViDAR':
        # training needs per-layer rematerialization: the fused msda custom
        # vjp otherwise stores per-layer (value, loc, weights) residuals
        # (~0.5 GB/layer at flagship shapes)
        cfg['model'].setdefault('remat', True)
    model = build_model(cfg['model'])
    dataset = build_dataset(cfg['data']['train'])

    total_epochs = cfg.get('total_epochs', 24)
    steps_per_epoch = len(dataset)
    total_steps = args.max_steps or total_epochs * steps_per_epoch

    key = jax.random.PRNGKey(args.seed)
    batch0 = dataset[0]
    if model_type in ('UniAD',):
        frames0, _, command0 = batch0
        prev0 = jax.numpy.zeros(
            (command0.shape[0], cfg['model']['bev_h'] * cfg['model']['bev_w'],
             cfg['model']['embed_dims']), jax.numpy.float32)
        pe0 = jax.numpy.zeros((command0.shape[0],), bool)
        params = model.init({'params': key, 'dropout': key, 'aug': key},
                            frames0, None, prev0, pe0, command0,
                            with_masks=True)
    else:
        init_in = batch0.frames if hasattr(batch0, 'frames') else batch0
        params = model.init({'params': key, 'dropout': key, 'aug': key},
                            init_in, train=False)
    load_from = args.load_from or cfg.get('load_from')
    if load_from:
        if load_from.endswith('.pth') and os.path.exists(load_from):
            params = import_torch_checkpoint(load_from, params)
        elif os.path.isdir(load_from):
            # orbax checkpoint from a previous stage (pretrain -> finetune):
            # partial, shape-checked restore (mmcv strict=False contract)
            from ..core.checkpoint import load_params_partial
            params, n_ok, n_skip = load_params_partial(load_from, params)
            print(f'load_from {load_from}: {n_ok} tensors loaded, '
                  f'{n_skip} kept from init')
        elif args.load_from:
            raise FileNotFoundError(load_from)
        else:
            print(f'load_from {load_from!r} not found; training from init')

    opt_cfg = cfg.get('optimizer', {})
    tx, sched = make_optimizer(
        params,
        base_lr=opt_cfg.get('lr', 2e-4),
        weight_decay=opt_cfg.get('weight_decay', 0.01),
        backbone_lr_mult=opt_cfg.get('backbone_lr_mult', 0.1),
        grad_clip_norm=cfg.get('grad_clip_norm', 35.0),
        total_steps=total_steps)
    state = create_train_state(params, tx)

    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    if model_type in ('BEVFormer',):
        step_fn = make_det_train_step(model, mesh=mesh)
    elif model_type in ('UniAD',):
        from ..train import make_uniad_train_step
        step_fn = make_uniad_train_step(
            model, mesh=mesh,
            task_loss_weight=cfg['model'].get('task_loss_weight'))
    else:
        step_fn = make_train_step(
            model, mesh=mesh,
            supervise_all_future=cfg['model'].get('supervise_all_future',
                                                  True))

    if args.resume_from:
        state = load_checkpoint(args.resume_from, jax.eval_shape(
            lambda: state))

    log_interval = cfg.get('log_interval', 50)
    ckpt_interval = cfg.get('checkpoint_interval_steps', steps_per_epoch)

    # evaluation hook (reference CustomDistEvalHook: dynamic intervals +
    # save_best; cfg key mirrors the reference's `evaluation = dict(...)`)
    eval_cfg = dict(cfg.get('evaluation') or {})
    eval_hook = None
    if eval_cfg:
        from ..train.eval_hook import EvalHook
        eval_hook = EvalHook(
            interval=eval_cfg.get('interval', total_epochs),
            dynamic_intervals=eval_cfg.get('dynamic_intervals'),
            start=eval_cfg.get('start'),
            save_best=eval_cfg.get('save_best'),
            rule=eval_cfg.get('rule', 'greater'))

    def maybe_evaluate(epoch, state):
        if eval_hook is None or not eval_hook.should_evaluate(epoch):
            return
        from .test import run_val_evaluation
        metrics = run_val_evaluation(
            cfg, model, state.params,
            max_samples=eval_cfg.get('max_samples'))
        if metrics is None:
            return
        print(f'[eval @ epoch {epoch}] ' + json.dumps(
            {k: round(float(v), 5) for k, v in metrics.items()}))
        if eval_hook.record(epoch, metrics.get('key_score')):
            save_checkpoint(os.path.join(work_dir, 'best'), state)
            print(f'[eval] new best '
                  f'{eval_hook.save_best}={eval_hook.best_score:.5f}')

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    start = int(state.step)
    for it in range(start, total_steps):
        batch = dataset[it % steps_per_epoch]
        batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(
            rng.integers(2 ** 31)))
        if (it + 1) % log_interval == 0:
            m = {k: float(v) for k, v in metrics.items()}
            m['lr'] = float(sched(it))
            m['it/s'] = log_interval / (time.time() - t0)
            t0 = time.time()
            print(f'[{it + 1}/{total_steps}] ' + json.dumps(m))
        if (it + 1) % ckpt_interval == 0:
            save_checkpoint(os.path.join(work_dir, f'step_{it + 1}'), state)
        if (it + 1) % steps_per_epoch == 0:
            maybe_evaluate((it + 1) // steps_per_epoch, state)
    save_checkpoint(os.path.join(work_dir, 'latest'), state)


if __name__ == '__main__':
    main()
