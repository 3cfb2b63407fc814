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

from ..data.structures import collate_samples


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
    from ..parallel.multihost import add_distributed_args
    add_distributed_args(p)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from ..parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
    from ..core import enable_compilation_cache
    enable_compilation_cache()
    from ..core.config import load_config, apply_overrides, dump_config
    from ..core.builder import build_model, build_dataset
    from ..parallel import (make_mesh, replicated_sharding,
                            global_batch_from_local, put_replicated)
    from ..train import (create_train_state, make_optimizer, make_train_step,
                         make_det_train_step)
    from ..core.checkpoint import (save_checkpoint, load_checkpoint,
                                   import_torch_checkpoint)
    from ..data.samplers import GroupShuffleSampler
    from ..data.prefetch import PrefetchLoader

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

    mesh = make_mesh()
    num_data_shards = mesh.shape['data']
    samples_per_device = int(cfg.get('data', {}).get('samples_per_gpu', 1))
    global_batch = samples_per_device * num_data_shards
    # each process loads + collates only its local slice of the global batch
    # (the sampler below is rank-sharded); global arrays are assembled by
    # global_batch_from_local
    local_batch = global_batch // jax.process_count()
    is_main = jax.process_index() == 0

    # training sampler: per-epoch shuffled (reference
    # DistributedGroupSampler, samplers/group_sampler.py:15; our multi-host
    # sharding rides jax.process_index — on a single host all devices are
    # fed from one global batch). Datasets expose ``group_ids`` for
    # aspect-grouping; default is one group = plain shuffle.
    group_ids = getattr(dataset, 'group_ids', None)
    if group_ids is None:
        group_ids = np.zeros(len(dataset), np.int64)
    sampler = GroupShuffleSampler(group_ids, rank=jax.process_index(),
                                  world_size=jax.process_count(),
                                  seed=args.seed)

    total_epochs = cfg.get('total_epochs', 24)
    epoch_len = len(sampler.epoch_indices(0))  # per-rank length
    steps_per_epoch = max(1, epoch_len // local_batch)
    total_steps = args.max_steps or total_epochs * steps_per_epoch

    num_workers = int(cfg.get('data', {}).get('workers_per_gpu', 4))
    if args.deterministic:
        # single-threaded loading: the dataset's numpy RNG is shared across
        # prefetch threads, so thread scheduling perturbs the aug stream —
        # one worker makes the sample stream bit-reproducible
        num_workers = 1

    def epoch_batches(epoch: int, skip_steps: int = 0):
        idx = sampler.epoch_indices(epoch)
        # pad to a whole number of local batches (wrap-around, matching
        # the reference sampler's padding-to-equal-length contract)
        n_steps = max(1, len(idx) // local_batch)
        need = n_steps * local_batch
        if len(idx) < need:
            idx = (idx * ((need + len(idx) - 1) // len(idx)))[:need]
        idx = idx[:need]
        idx = idx[skip_steps * local_batch:]
        loader = PrefetchLoader(dataset.__getitem__, idx,
                                num_threads=num_workers,
                                depth=max(2 * local_batch, 4))
        it = iter(loader)
        while True:
            items = []
            try:
                for _ in range(local_batch):
                    items.append(next(it))
            except StopIteration:
                return
            yield collate_samples(items)

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
    state = put_replicated(state, mesh)
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

    # EMA hook (reference core/hooks/ema.py; enable with cfg `ema = dict(
    # mode='exp'|'linear', momentum=..., gamma=...)`)
    ema_cfg = dict(cfg.get('ema') or {})
    ema_state = None
    ema_update = None
    if ema_cfg:
        from ..train.ema import init_ema, update_ema
        ema_state = put_replicated(init_ema(state.params), mesh)
        ema_update = jax.jit(
            lambda es, p: update_ema(
                es, p, momentum=ema_cfg.get('momentum', 0.0002),
                gamma=ema_cfg.get('gamma', 2000.0),
                mode=ema_cfg.get('mode', 'exp')),
            donate_argnums=(0,))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    start = int(state.step)
    it = start
    start_epoch = start // steps_per_epoch
    skip = start % steps_per_epoch
    # --max-steps may exceed total_epochs * steps_per_epoch (debug runs on
    # tiny datasets); keep cycling epochs until the step budget is spent
    run_epochs = max(total_epochs, -(-total_steps // steps_per_epoch))
    for epoch in range(start_epoch, run_epochs):
        for batch in epoch_batches(epoch, skip_steps=skip):
            if it >= total_steps:
                break
            batch = global_batch_from_local(batch, mesh)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(
                rng.integers(2 ** 31)))
            if ema_update is not None:
                ema_state = ema_update(ema_state, state.params)
            it += 1
            if it % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m['lr'] = float(sched(it - 1))
                m['it/s'] = log_interval / (time.time() - t0)
                t0 = time.time()
                if is_main:
                    print(f'[{it}/{total_steps}] ' + json.dumps(m))
                if m.get('sca_overflow', 0) > 0:
                    # visible queries were dropped by the SCA static
                    # capacity — a silent parity loss vs the reference's
                    # dynamic rebatching. Raise (or warn loudly) per cfg.
                    msg = (f'SCA capacity overflow: {int(m["sca_overflow"])}'
                           f' visible queries dropped (step {it}). Raise '
                           f'model.sca_capacity_ratio — scan the dataset '
                           f'with: python -m vidar_tpu.tools.analysis '
                           f'visibility <config>')
                    if cfg.get('sca_overflow_action', 'warn') == 'raise':
                        raise RuntimeError(msg)
                    import sys
                    print(f'WARNING: {msg}', file=sys.stderr)
            if it % ckpt_interval == 0:
                # called from every process (multihost contract of
                # save_checkpoint: replicated leaves pulled to host, rank-0
                # writes)
                save_checkpoint(os.path.join(work_dir, f'step_{it}'), state)
        skip = 0
        if is_main:
            maybe_evaluate(epoch + 1, state)
        if it >= total_steps:
            break
    save_checkpoint(os.path.join(work_dir, 'latest'), state)
    if ema_state is not None:
        save_checkpoint(os.path.join(work_dir, 'ema_latest'), ema_state)


if __name__ == '__main__':
    main()
