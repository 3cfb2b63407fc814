"""Analysis tools: FPS benchmark, param counter, train-log analyzer, profiler.

Capability matches:
  * benchmark    <- tools/analysis_tools/benchmark.py:70-95 (inference FPS)
  * get_params   <- tools/analysis_tools/get_params.py (parameter count)
  * analyze_logs <- tools/analysis_tools/analyze_logs.py (loss curves)
  * profile      -> jax.profiler trace (strict superset of the reference's
                    commented-out profiler hook, SURVEY §5)
"""

from __future__ import annotations

import argparse
import json
import re
import time


def benchmark(config: str, samples: int = 20, warmup: int = 3,
              cfg_options=None):
    import jax
    import numpy as np
    from ..core.config import load_config, apply_overrides
    from ..models import ViDAR
    from ..data import make_synthetic_batch

    cfg = apply_overrides(load_config(config), cfg_options)
    m = cfg['model']
    model = ViDAR(**m, dtype=jax.numpy.bfloat16)
    batch = make_synthetic_batch(
        np.random.default_rng(0), bs=1,
        queue_length=m['history_queue_length'],
        future_length=m['test_future_frame_num'],
        num_cams=m['num_cams'], img_h=928, img_w=1600, max_points=32768)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'dropout': key}, batch, train=False)
    fn = jax.jit(lambda p, b: model.apply(p, b, train=False))
    out = fn(params, batch)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(params, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(samples):
        out = fn(params, batch)
    jax.block_until_ready(out)
    fps = samples / (time.perf_counter() - t0)
    print(f'Overall fps: {fps:.3f} samples/s')
    return fps


def count_params(config: str, cfg_options=None):
    import jax
    import numpy as np
    from ..core.config import load_config, apply_overrides
    from ..models import ViDAR
    from ..data import make_synthetic_batch

    cfg = apply_overrides(load_config(config), cfg_options)
    m = cfg['model']
    model = ViDAR(**m)
    batch = make_synthetic_batch(
        np.random.default_rng(0), bs=1,
        queue_length=m['history_queue_length'], future_length=1,
        num_cams=m['num_cams'], img_h=64, img_w=64, max_points=64)
    shapes = jax.eval_shape(
        lambda: model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(0)},
                           batch, train=False))
    total = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))
    by_top = {}
    for top, sub in shapes['params'].items():
        by_top[top] = sum(int(np.prod(x.shape))
                          for x in jax.tree.leaves(sub))
    print(f'total params: {total / 1e6:.2f} M')
    for k, v in sorted(by_top.items(), key=lambda kv: -kv[1]):
        print(f'  {k}: {v / 1e6:.2f} M')
    return total


def analyze_logs(log_file: str, keys=('loss',)):
    """Parse the train CLI's json log lines and print loss statistics."""
    hist = {k: [] for k in keys}
    pat = re.compile(r'\[(\d+)/(\d+)\] (\{.*\})')
    with open(log_file) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            rec = json.loads(m.group(3))
            for k in keys:
                if k in rec:
                    hist[k].append((int(m.group(1)), rec[k]))
    for k, vals in hist.items():
        if not vals:
            continue
        v = [x[1] for x in vals]
        print(f'{k}: n={len(v)} first={v[0]:.4f} last={v[-1]:.4f} '
              f'min={min(v):.4f}')
    return hist


def profile_trace(config: str, out_dir: str = '/tmp/jax_trace',
                  cfg_options=None):
    """Capture a jax.profiler trace of one eval step."""
    import jax
    import numpy as np
    from ..core.config import load_config, apply_overrides
    from ..models import ViDAR
    from ..data import make_synthetic_batch

    cfg = apply_overrides(load_config(config), cfg_options)
    m = cfg['model']
    model = ViDAR(**m, dtype=jax.numpy.bfloat16)
    batch = make_synthetic_batch(
        np.random.default_rng(0), bs=1,
        queue_length=m['history_queue_length'],
        future_length=m['test_future_frame_num'],
        num_cams=m['num_cams'], img_h=928, img_w=1600, max_points=32768)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'dropout': key}, batch, train=False)
    fn = jax.jit(lambda p, b: model.apply(p, b, train=False))
    jax.block_until_ready(fn(params, batch))  # compile outside the trace
    with jax.profiler.trace(out_dir):
        jax.block_until_ready(fn(params, batch))
    print(f'trace written to {out_dir}')


def visibility_scan(config: str, max_samples: int = None, cfg_options=None):
    """Per-camera visible-query statistics from REAL dataset calibration.

    Grounds ``model.sca_capacity_ratio``: the SCA compaction keeps a static
    ``cap = ratio * bev_h * bev_w`` queries per camera; any sample whose
    per-camera visibility exceeds the cap silently loses parity (reference
    spatial_cross_attention.py:135-166 never drops a visible query). This
    scans every (sample, frame, camera) of the configured dataset's infos,
    reports the visibility distribution, and prints the minimum safe
    capacity_ratio (peak + suggested 5% margin).

    Host numpy end to end — no jit, runs on any box.
    """
    import numpy as np
    from ..core.config import load_config, apply_overrides
    from ..core.builder import build_dataset
    from ..models.encoder import reference_points_3d

    cfg = apply_overrides(load_config(config), cfg_options)
    m = cfg['model']
    bev_h, bev_w = m.get('bev_h', 200), m.get('bev_w', 200)
    pc = m.get('pc_range', (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0))
    n = bev_h * bev_w
    ref = reference_points_3d(bev_h, bev_w, pc[5] - pc[2], 4)  # [D, N, 3]
    xyz = np.stack([ref[..., 0] * (pc[3] - pc[0]) + pc[0],
                    ref[..., 1] * (pc[4] - pc[1]) + pc[1],
                    ref[..., 2] * (pc[5] - pc[2]) + pc[2]], -1)
    homo = np.concatenate([xyz, np.ones_like(xyz[..., :1])], -1)  # [D,N,4]

    dataset = build_dataset(cfg['data']['train'])
    n_samples = min(len(dataset), max_samples or len(dataset))
    peak, fracs = 0, []
    for i in range(n_samples):
        sample = dataset[i]
        batch = sample.frames if hasattr(sample, 'frames') else sample
        l2i = np.asarray(batch.lidar2img, np.float32)
        img_h, img_w = batch.images.shape[3:5]
        l2i = l2i.reshape(-1, 4, 4)
        proj = np.einsum('cij,dnj->cdni', l2i, homo)
        z = proj[..., 2]
        with np.errstate(invalid='ignore', divide='ignore'):
            x = proj[..., 0] / np.maximum(z, 1e-5) / img_w
            y = proj[..., 1] / np.maximum(z, 1e-5) / img_h
        vis = ((z > 1e-5) & (x > 0) & (x < 1) & (y > 0) & (y < 1))
        count = vis.any(axis=1).sum(axis=-1)  # [frames*cams]
        peak = max(peak, int(count.max()))
        fracs.append(count / n)
        if (i + 1) % 50 == 0:
            print(f'[{i + 1}/{n_samples}] running peak '
                  f'{peak / n:.4f}')
    fracs = np.concatenate(fracs)
    report = {
        'samples_scanned': n_samples,
        'per_camera_frames': int(fracs.size),
        'visible_frac_mean': round(float(fracs.mean()), 4),
        'visible_frac_p99': round(float(np.percentile(fracs, 99)), 4),
        'visible_frac_peak': round(peak / n, 4),
        'min_safe_capacity_ratio': round(peak / n, 4),
        'suggested_capacity_ratio': round(min(1.0, peak / n * 1.05), 4),
    }
    print(json.dumps(report, indent=2))
    return report


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    v = sub.add_parser('visibility')
    v.add_argument('config')
    v.add_argument('--max-samples', type=int, default=None)
    v.add_argument('--cfg-options', nargs='+', default=None)
    for name in ('benchmark', 'get-params', 'profile'):
        s = sub.add_parser(name)
        s.add_argument('config')
        s.add_argument('--cfg-options', nargs='+', default=None)
        if name == 'benchmark':
            s.add_argument('--samples', type=int, default=20)
        if name == 'profile':
            s.add_argument('--out-dir', default='/tmp/jax_trace')
    a = sub.add_parser('analyze-logs')
    a.add_argument('log_file')
    a.add_argument('--keys', nargs='+', default=['loss'])
    args = p.parse_args()
    if args.cmd == 'benchmark':
        benchmark(args.config, samples=args.samples,
                  cfg_options=args.cfg_options)
    elif args.cmd == 'get-params':
        count_params(args.config, cfg_options=args.cfg_options)
    elif args.cmd == 'profile':
        profile_trace(args.config, args.out_dir,
                      cfg_options=args.cfg_options)
    elif args.cmd == 'analyze-logs':
        analyze_logs(args.log_file, args.keys)
    elif args.cmd == 'visibility':
        visibility_scan(args.config, max_samples=args.max_samples,
                        cfg_options=args.cfg_options)


if __name__ == '__main__':
    main()
