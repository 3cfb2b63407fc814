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
    p.add_argument('--dump-viz', default=None, metavar='PKL',
                   help='detection eval: dump per-sample images/lidar2img/'
                        'pred/gt for tools.visualize detections')
    p.add_argument('--streaming', action='store_true',
                   help='video streaming eval: single-frame forward with a '
                        'cached prev BEV + ego-motion rebasing (reference '
                        'video_test_mode, bevformer.py:291-324)')
    from ..parallel.multihost import add_distributed_args
    add_distributed_args(p)
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

    streaming = getattr(args, 'streaming', False)
    if streaming:
        import jax.numpy as jnp
        from ..evals.streaming import StreamingRebase
        from ..models.bevformer import StreamState
        rebase = StreamingRebase(
            bev_size=(cfg['model'].get('bev_h', 200),
                      cfg['model'].get('bev_w', 200)),
            pc_range=cfg['model'].get('pc_range',
                                      (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)))
        bs = 1
        stream_state = StreamState(
            prev_bev=jnp.zeros(
                (bs, cfg['model'].get('bev_h', 200) *
                 cfg['model'].get('bev_w', 200),
                 cfg['model'].get('embed_dims', 256)), jnp.float32),
            has_prev=jnp.zeros((bs,), bool))

        @jax.jit
        def stream_fn(params, frames, state):
            preds, new_state = model.apply(params, frames, state,
                                           method=model.streaming_test)
            return model.apply(params, preds,
                               method=model.get_bboxes), new_state

    n = min(len(dataset), args.max_samples or len(dataset))
    predictions, ground_truth, viz_dump = {}, {}, {}
    class_names = tuple(cfg['data']['test'].get(
        'classes', ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
                    'barrier', 'motorcycle', 'bicycle', 'pedestrian',
                    'traffic_cone')))
    for i in range(n):
        batch = dataset[i]
        if streaming:
            import jax.numpy as jnp
            rb = rebase.step(dataset.streaming_meta(i))
            frames = batch.frames
            t = frames.num_image_frames - 1
            frames = frames.replace(
                can_bus=frames.can_bus.at[:, t].set(
                    jnp.asarray(rb['can_bus'])),
                shift=frames.shift.at[:, t].set(jnp.asarray(rb['shift'])),
                rotate_angle=frames.rotate_angle.at[:, t].set(
                    rb['rotate_angle']))
            stream_state = stream_state.replace(
                has_prev=jnp.full((1,), bool(rb['has_prev'])))
            det, stream_state = stream_fn(params, frames, stream_state)
        else:
            det = eval_fn(params, batch.frames)
        valid = np.asarray(det['valid'])[0]
        pred_boxes = np.asarray(det['bboxes'])[0][valid]
        pred_labels = np.asarray(det['labels'])[0][valid]
        from ..evals.detection import infer_attributes
        predictions[f's{i}'] = dict(
            boxes=pred_boxes,
            scores=np.asarray(det['scores'])[0][valid],
            labels=pred_labels,
            attrs=infer_attributes(pred_boxes, pred_labels, class_names))
        g = int(batch.num_valid_gt[0])
        gt_entry = dict(
            boxes=np.asarray(batch.gt_bboxes)[0][:g],
            labels=np.asarray(batch.gt_labels)[0][:g])
        if hasattr(dataset, 'det_gt_attrs'):
            gt_entry['attrs'] = np.asarray(dataset.det_gt_attrs(i))[:g]
        ground_truth[f's{i}'] = gt_entry
        if getattr(args, 'dump_viz', None):
            # current-frame cameras, min-max rescaled for display (the
            # pipeline images are mean/std normalised)
            imgs = np.asarray(batch.frames.images)[0, -1]
            lo, hi = imgs.min(), imgs.max()
            viz_dump[f's{i}'] = dict(
                images=(imgs - lo) / max(hi - lo, 1e-6),
                lidar2img=np.asarray(batch.frames.lidar2img)[0, -1],
                pred={k: predictions[f's{i}'][k]
                      for k in ('boxes', 'scores', 'labels')},
                gt={k: gt_entry[k] for k in ('boxes', 'labels')})
        if (i + 1) % 10 == 0:
            print(f'[{i + 1}/{n}]')

    if getattr(args, 'dump_viz', None):
        import pickle
        os.makedirs(os.path.dirname(args.dump_viz) or '.', exist_ok=True)
        with open(args.dump_viz, 'wb') as f:
            pickle.dump(viz_dump, f)
        print(f'viz dump: {args.dump_viz} ({len(viz_dump)} samples)')

    metrics = evaluate_detection(predictions, ground_truth, class_names)
    for k, v in metrics.items():
        print(f'{k}: {v:.4f}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(metrics, f, indent=2)
    return metrics


def uniad_eval(args, cfg, model, dataset):
    """UniAD end-to-end eval: streaming tracker inference over scenes +
    AMOTA/AMOTP (reference nuscenes_e2e_dataset.py:1161-1181 TrackingEval),
    NDS/mAP on the tracked boxes, motion minADE/minFDE/MR/EPA and planning
    L2/collision (reference eval_mod track/motion/planning)."""
    import jax
    import jax.numpy as jnp
    from ..core.checkpoint import import_torch_checkpoint, load_params_partial
    from ..core.bbox import denormalize_bbox
    from ..evals.tracking import evaluate_tracking
    from ..evals.detection import evaluate_detection
    from ..uniad.metrics import MotionMetric, PlanningMetric
    from ..uniad.loss import _track_assign
    from ..core.bbox import normalize_bbox

    frames0, targets0, command0 = dataset[0]
    bs = command0.shape[0]
    bev_hw = cfg['model'].get('bev_h', 200) * cfg['model'].get('bev_w', 200)
    dims = cfg['model'].get('embed_dims', 256)
    prev0 = jnp.zeros((bs, bev_hw, dims), jnp.float32)
    pe0 = jnp.zeros((bs,), bool)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'dropout': key, 'aug': key},
                        frames0, None, prev0, pe0, command0)
    if args.checkpoint:
        if args.checkpoint.endswith('.pth'):
            params = import_torch_checkpoint(args.checkpoint, params)
        else:
            params, n_ok, n_skip = load_params_partial(args.checkpoint,
                                                       params)
            print(f'checkpoint {args.checkpoint}: {n_ok} tensors loaded, '
                  f'{n_skip} kept from init')

    @jax.jit
    def stream_fn(params, frames, tracks, prev_bev, prev_exists, command):
        out = model.apply(params, frames, tracks, prev_bev, prev_exists,
                          command, deterministic=True)
        return out

    n = min(len(dataset), args.max_samples or len(dataset))
    classes = tuple(cfg['data']['test'].get('classes', (
        'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
        'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone')))
    predictions, ground_truth = {}, {}
    det_preds, det_gt = {}, {}
    motion_m = MotionMetric()
    tp = cfg['model'].get('planning_steps', 6)
    plan_m = PlanningMetric(n_future=tp)

    tracks = None
    prev_bev = prev0
    cur_scene = None
    filter_thresh = cfg['model'].get('filter_score_thresh', 0.35)
    for i in range(n):
        frames, targets, command = dataset[i]
        scene = dataset.data_infos[dataset.usable_index[i]]['scene_token']
        if scene != cur_scene:
            tracks, prev_bev, cur_scene = None, prev0, scene
            prev_exists = jnp.zeros((bs,), bool)
        else:
            prev_exists = jnp.ones((bs,), bool)
        out = stream_fn(params, frames, tracks, prev_bev, prev_exists,
                        command)
        tracks = out['tracks']
        prev_bev = out['bev']

        tr = jax.tree.map(np.asarray, tracks)
        sel = (tr.obj_idxes[0] >= 0) & (tr.scores[0] >= filter_thresh)
        boxes9 = np.asarray(denormalize_bbox(
            jnp.asarray(tr.pred_boxes[0])))
        tok = f's{i}'
        predictions[tok] = dict(
            boxes=boxes9[sel], scores=tr.scores[0][sel],
            labels=tr.pred_logits[0].argmax(-1)[sel],
            track_ids=tr.obj_idxes[0][sel])
        g = int(targets.num_valid_gt[0])
        gt_ids = (np.asarray(targets.track_ids[0, -1])[:g]
                  if targets.track_ids is not None else np.arange(g))
        ground_truth[tok] = dict(
            boxes=np.asarray(targets.gt_boxes[0])[:g],
            labels=np.asarray(targets.gt_labels[0])[:g],
            track_ids=gt_ids, scene=scene)
        det_preds[tok] = {k: predictions[tok][k]
                          for k in ('boxes', 'scores', 'labels')}
        det_gt[tok] = {k: ground_truth[tok][k] for k in ('boxes', 'labels')}

        # ---- motion metric: align agents to gt via Hungarian ----
        gt_norm = normalize_bbox(targets.gt_boxes)
        assigned = np.asarray(_track_assign(
            tracks.pred_logits, tracks.pred_boxes, gt_norm,
            targets.gt_labels, targets.num_valid_gt))[0]
        trajs = np.asarray(out['motion']['all_traj_preds'][-1])[0, :-1,
                                                               ..., :2]
        scores_m = np.asarray(out['motion']['all_traj_scores'][-1])[0, :-1]
        pos = assigned >= 0
        safe = np.clip(assigned, 0, targets.gt_traj.shape[1] - 1)
        motion_m.update(trajs, scores_m,
                        np.asarray(targets.gt_traj[0])[safe],
                        np.asarray(targets.gt_traj_valid[0])[safe],
                        agent_mask=pos.astype(np.float32))

        # ---- planning metric: collision vs gt occupancy ----
        seg = np.asarray(targets.gt_occ[0]).max(axis=0)       # [To, H, W]
        t_occ, hh, ww = seg.shape
        seg_t = np.zeros((tp, 200, 200), np.float32)
        yi = (np.arange(200) * hh) // 200
        xi = (np.arange(200) * ww) // 200
        for t in range(min(tp, t_occ)):
            seg_t[t] = seg[t][yi][:, xi]
        plan_m.update(np.asarray(out['plan']['sdc_traj'])[:, :tp],
                      np.asarray(targets.sdc_traj[:, :tp, :2]),
                      np.asarray(targets.sdc_mask[:, :tp]), seg_t[None])

    metrics = {}
    metrics.update(evaluate_tracking(predictions, ground_truth, classes))
    det = evaluate_detection(det_preds, det_gt, classes)
    metrics['NDS'] = det.get('NDS', 0.0)
    metrics['mAP'] = det.get('mAP', 0.0)
    metrics.update(motion_m.compute())
    plan = plan_m.compute()
    metrics['planning.L2'] = float(np.mean(plan['L2']))
    metrics['planning.obj_box_col'] = float(np.mean(plan['obj_box_col']))
    for k, v in metrics.items():
        print(f'{k}: {float(v):.4f}')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f,
                      indent=2)
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
        metrics['key_score'] = metrics.get('NDS', 0.0)
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
    from ..parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
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
    if cfg['model'].get('type', 'ViDAR') == 'UniAD':
        return uniad_eval(args, cfg, model, dataset)
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

    # Sharded eval (reference apis/test.py:45-161 multi-GPU test + gather):
    # every local device evaluates one sample per step — samples are
    # collated into a bs=n_dev batch sharded over a per-HOST data mesh.
    # Multi-host runs split the sample range contiguously across processes
    # (the reference's DistributedSampler contiguous-block contract,
    # samplers/distributed_sampler.py:22-41 — keeps each rank's stream
    # temporally continuous) and gather per-frame metric dicts at the end.
    import jax
    from ..parallel import shard_batch, replicated_sharding
    from ..parallel.mesh import make_local_mesh
    from ..data.samplers import contiguous_shard
    from ..data.structures import collate_samples
    from ..data.prefetch import PrefetchLoader
    n_dev = jax.local_device_count()
    mesh = make_local_mesh()
    eval_fn.params = jax.device_put(params, replicated_sharding(mesh))
    my_samples = contiguous_shard(n, jax.process_index(), jax.process_count())
    lo = my_samples[0] if my_samples else 0
    n_local = len(my_samples)
    chunks = [(lo + c0, min(n_dev, n_local - c0))
              for c0 in range(0, n_local, n_dev)]
    flat_idx = []
    for c0, real in chunks:
        flat_idx.extend(range(c0, c0 + real))
        flat_idx.extend([c0 + real - 1] * (n_dev - real))  # pad the tail
    loader = iter(PrefetchLoader(lambda i: dataset[i], flat_idx,
                                 num_threads=4, depth=2 * n_dev))
    results = []
    for ci, (c0, real) in enumerate(chunks):
        batch = collate_samples([next(loader) for _ in range(n_dev)])
        batch = shard_batch(batch, mesh)
        decode = eval_fn(batch)
        if real < n_dev:  # drop tail padding before metrics
            decode = jax.tree.map(lambda x: x[:real], decode)
        metrics = forecast_metrics(decode, cfg['model']['pc_range'],
                                   num_frames)
        results.append(metrics)
        if args.submission:
            for b in range(real):
                save_submission(np.asarray(decode['pred_dist'])[b],
                                np.asarray(decode['frame_idx'])[b],
                                f'sample{c0 + b}', args.submission_path)
        done = c0 + real
        if done % 10 < real or done == n:
            print(f'[{done}/{n}]')

    if jax.process_count() > 1:
        # rank-0 concat of every process's per-frame metric dicts
        # (reference apis/test.py:117-161 pickle/tmpdir gather)
        from ..parallel import process_gather_objects
        gathered = process_gather_objects(results)
        results = [m for part in gathered for m in part]
        if jax.process_index() != 0:
            return
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
