"""Evaluation CLI (the reference's tools/test.py + dist_test.sh equivalent).

Runs the forecast eval loop: history encode + 6-future rollout + depth decode
on device, chamfer / ray-error metrics per frame, aggregated like the
reference (SURVEY §3.3). Also handles challenge submission dumps
(--submission, reference vidar.py:504-519) and point cloud visualisation
(--viz-pcd).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a ViDAR model (TPU)')
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--cfg-options', nargs='+', default=None)
    p.add_argument('--out', default=None, help='json file for metrics')
    p.add_argument('--max-samples', type=int, default=None)
    p.add_argument('--submission', action='store_true')
    p.add_argument('--submission-path', default='submission/model')
    p.add_argument('--viz-pcd', action='store_true')
    p.add_argument('--viz-path', default='dbg/pred_pcd')
    return p.parse_args()


def save_submission(pred_dist, frame_idx, sample_idx, out_dir):
    """Per-frame depth txt files (reference vidar.py:504-519 contract)."""
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(set(frame_idx.tolist())):
        if f <= 0:
            continue
        d = pred_dist[frame_idx == f]
        path = os.path.join(out_dir, f'{sample_idx}_{f}.txt')
        with open(path, 'w') as fh:
            for v in d:
                fh.write(f'{v:f}\n')


def det_eval(args, cfg, model, dataset):
    """Detection eval: streaming forward + NMS-free decode + NDS/mAP
    (reference §3.3 applied to the fine-tune model; nuScenes protocol via
    evals/detection.py)."""
    import jax
    from ..core.checkpoint import load_checkpoint, import_torch_checkpoint
    from ..evals.detection import evaluate_detection

    key = jax.random.PRNGKey(0)
    batch0 = dataset[0]
    params = model.init({'params': key, 'dropout': key, 'aug': key},
                        batch0.frames, train=False)
    if args.checkpoint:
        if args.checkpoint.endswith('.pth'):
            params = import_torch_checkpoint(args.checkpoint, params)
        else:
            # training checkpoints are full TrainStates; restore the param
            # subtree tolerantly (shape-checked, strict=False contract)
            from ..core.checkpoint import load_params_partial
            params, n_ok, n_skip = load_params_partial(args.checkpoint,
                                                       params)
            print(f'checkpoint {args.checkpoint}: {n_ok} tensors loaded, '
                  f'{n_skip} kept from init')

    @jax.jit
    def eval_fn(params, frames):
        preds = model.apply(params, frames, train=False)
        return model.apply(params, preds, method=model.get_bboxes)

    n = min(len(dataset), args.max_samples or len(dataset))
    predictions, ground_truth = {}, {}
    class_names = tuple(cfg['data']['test'].get(
        'classes', ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
                    'barrier', 'motorcycle', 'bicycle', 'pedestrian',
                    'traffic_cone')))
    for i in range(n):
        batch = dataset[i]
        det = eval_fn(params, batch.frames)
        valid = np.asarray(det['valid'])[0]
        predictions[f's{i}'] = dict(
            boxes=np.asarray(det['bboxes'])[0][valid],
            scores=np.asarray(det['scores'])[0][valid],
            labels=np.asarray(det['labels'])[0][valid])
        g = int(batch.num_valid_gt[0])
        ground_truth[f's{i}'] = dict(
            boxes=np.asarray(batch.gt_bboxes)[0][:g],
            labels=np.asarray(batch.gt_labels)[0][:g])
        if (i + 1) % 10 == 0:
            print(f'[{i + 1}/{n}]')

    metrics = evaluate_detection(predictions, ground_truth, class_names)
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, indent=2)
    return metrics


def run_val_evaluation(cfg, model, params, max_samples=None):
    """In-training validation pass (CustomDistEvalHook._do_evaluate
    equivalent, reference eval_hooks.py:53-90): runs the val split through
    the matching eval protocol and returns a metrics dict (with a
    ``key_score`` entry usable for save_best), or None when no val split is
    configured.
    """
    import jax
    val_cfg = cfg.get('data', {}).get('val') or cfg.get('data', {}).get(
        'test')
    if not val_cfg:
        return None
    from ..core.builder import build_dataset
    from ..evals import forecast_metrics, aggregate_frame_metrics
    from ..evals.forecast_runner import ForecastRunner
    try:
        dataset = build_dataset(val_cfg)
    except (FileNotFoundError, OSError) as e:
        print(f'eval skipped: val data unavailable ({e})')
        return None
    n = min(len(dataset), max_samples or len(dataset))
    if n == 0:
        return None

    if cfg['model'].get('type', 'ViDAR') == 'BEVFormer':
        from ..evals.detection import evaluate_detection

        @jax.jit
        def eval_fn(params, frames):
            preds = model.apply(params, frames, train=False)
            return model.apply(params, preds, method=model.get_bboxes)

        predictions, ground_truth = {}, {}
        for i in range(n):
            batch = dataset[i]
            det = eval_fn(params, batch.frames)
            valid = np.asarray(det['valid'])[0]
            predictions[f's{i}'] = dict(
                boxes=np.asarray(det['bboxes'])[0][valid],
                scores=np.asarray(det['scores'])[0][valid],
                labels=np.asarray(det['labels'])[0][valid])
            g = int(batch.num_valid_gt[0])
            ground_truth[f's{i}'] = dict(
                boxes=np.asarray(batch.gt_bboxes)[0][:g],
                labels=np.asarray(batch.gt_labels)[0][:g])
        default_classes = ('car', 'truck', 'construction_vehicle', 'bus',
                           'trailer', 'barrier', 'motorcycle', 'bicycle',
                           'pedestrian', 'traffic_cone')
        metrics = evaluate_detection(
            predictions, ground_truth,
            tuple(val_cfg.get('classes', default_classes)))
        metrics['key_score'] = metrics.get('nds', 0.0)
        return metrics

    batch0 = dataset[0]
    num_future = cfg['model'].get('test_future_frame_num', 6)
    runner = ForecastRunner(model, params, batch0.images.shape[3:5],
                            num_future=num_future)
    results = []
    for i in range(n):
        decode = runner(dataset[i])
        results.append(forecast_metrics(decode, cfg['model']['pc_range'],
                                        num_future + 1))
    agg = aggregate_frame_metrics(results)
    flat = {f'{fk}.{k}': v for fk, fv in agg.items() for k, v in fv.items()}
    cds = [v for k, v in flat.items() if k.endswith('chamfer_distance')]
    flat['key_score'] = -float(np.mean(cds)) if cds else 0.0
    return flat


def main():
    args = parse_args()
    import jax
    from ..core import enable_compilation_cache
    enable_compilation_cache()
    from ..core.config import load_config, apply_overrides
    from ..core.builder import build_model, build_dataset
    from ..evals import forecast_metrics, aggregate_frame_metrics
    from ..evals.forecast_runner import ForecastRunner
    from ..core.checkpoint import load_checkpoint, import_torch_checkpoint

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    model = build_model(cfg['model'])
    dataset = build_dataset(cfg['data']['test'])
    if cfg['model'].get('type', 'ViDAR') == 'BEVFormer':
        return det_eval(args, cfg, model, dataset)
    if cfg['model'].get('_submission'):
        args.submission = True
        args.submission_path = cfg['model'].get('_submission_path',
                                                args.submission_path)

    key = jax.random.PRNGKey(0)
    batch0 = dataset[0]
    params = model.init({'params': key, 'dropout': key}, batch0, train=False)
    if args.checkpoint:
        if args.checkpoint.endswith('.pth'):
            params = import_torch_checkpoint(args.checkpoint, params)
        else:
            # training checkpoints are full TrainStates; restore the param
            # subtree tolerantly (shape-checked, strict=False contract)
            from ..core.checkpoint import load_params_partial
            params, n_ok, n_skip = load_params_partial(args.checkpoint,
                                                       params)
            print(f'checkpoint {args.checkpoint}: {n_ok} tensors loaded, '
                  f'{n_skip} kept from init')

    num_future = cfg['model'].get('test_future_frame_num', 6)
    eval_fn = ForecastRunner(model, params, batch0.images.shape[3:5],
                             num_future=num_future)
    n = min(len(dataset), args.max_samples or len(dataset))
    num_frames = num_future + 1
    results = []
    for i in range(n):
        batch = dataset[i]
        decode = eval_fn(batch)
        metrics = forecast_metrics(decode, cfg['model']['pc_range'],
                                   num_frames)
        results.append(metrics)
        if args.submission:
            save_submission(np.asarray(decode['pred_dist'])[0],
                            np.asarray(decode['frame_idx'])[0],
                            f'sample{i}', args.submission_path)
        if (i + 1) % 10 == 0:
            print(f'[{i + 1}/{n}]')

    agg = aggregate_frame_metrics(results)
    for fk, fv in agg.items():
        print(f'==== {fk} results: ====')
        for k, v in fv.items():
            print(f'{k}: {v}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(agg, f, indent=2)


if __name__ == '__main__':
    main()
