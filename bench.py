"""Benchmark: visual point cloud forecast frames/sec on one TPU chip.

Measures the full ViDAR forecast step (the reference's ``forward_test``
equivalent: 5-frame history encode + 6-frame autoregressive future decode +
depth decode) at the flagship configuration, synthetic inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the A100 reference throughput for the same
workload. The reference publishes NO latency/throughput numbers anywhere
(SURVEY §6), so the constant below is grounded by an analytic roofline of
the reference's forward_test on A100-SXM4-80G — FLOPs/bytes inventory per
phase with measured-typical kernel efficiencies (benchmarks/a100_roofline.py;
derivation + assumptions in BASELINE.md): 0.37 samples/s with fp32 convs
(the training configuration: the reference force-disables TF32,
tools/train.py:141-144) to 0.75 samples/s granting cuDNN TF32 tensor-core
convs. 0.5 is the central estimate of that range.
"""

import json
import sys
import time

import numpy as np

A100_FORECAST_FPS_ESTIMATE = 0.5  # see module docstring + BASELINE.md
# same roofline at the OpenScene eval shape (8 cams, 736x1280):
# benchmarks/a100_roofline.py --openscene -> [0.376 fp32, 0.663 tf32]
A100_OPENSCENE_FPS_ESTIMATE = 0.52

# Reduced-cost flags for CI smoke (full run on TPU by default).
import argparse
import os
SMOKE = os.environ.get('BENCH_SMOKE', '0') == '1'
# 'nuscenes' (default, the driver metric) or 'openscene' (the second
# released workload family: 8 cams, RandomScale 2/3 nuPlan images —
# vidar_OpenScene_*_3future configs). Select with --variant openscene.
_ap = argparse.ArgumentParser(add_help=False)
_ap.add_argument('--variant', choices=('nuscenes', 'openscene'),
                 default=os.environ.get('BENCH_VARIANT', 'nuscenes'))
VARIANT = _ap.parse_known_args()[0].variant


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.core.platform import select_backend
    select_backend()
    from vidar_tpu.models import ViDAR
    from vidar_tpu.configs import vidar_base, vidar_tiny
    from vidar_tpu.data import make_synthetic_batch

    if SMOKE:
        cfg = vidar_tiny()
        bs, q, f, cams, ih, iw, pts = 1, 2, 2, 3, 64, 64, 128
    elif VARIANT == 'openscene':
        cfg = vidar_base()
        # OpenScene/nuPlan eval shapes: 8 cams, 1080x1920 scaled 2/3 then
        # padded /32 -> 736x1280 (configs/vidar_pretrain/OpenScene/*:
        # RandomScaleImageMultiViewImage 2/3, num_cams 8)
        bs, q, f, cams, ih, iw, pts = 1, 4, 6, 8, 736, 1280, 32768
        cfg['num_cams'] = 8
        cfg['test_future_frame_num'] = 6
    else:
        cfg = vidar_base()
        # nuScenes eval shapes: 6 cams, padded 928x1600, queue 4+1, 6 futures
        bs, q, f, cams, ih, iw, pts = 1, 4, 6, 6, 928, 1600, 32768
        cfg['test_future_frame_num'] = 6

    from vidar_tpu.evals.forecast_runner import ForecastRunner

    model = ViDAR(**cfg, dtype=jax.numpy.bfloat16)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=bs, queue_length=q, future_length=f,
                                 num_cams=cams, img_h=ih, img_w=iw,
                                 max_points=pts)
    key = jax.random.PRNGKey(0)
    # Benchmark params: shapes from eval_shape (zero compile), values random —
    # throughput does not depend on the init distribution.
    init_batch = make_synthetic_batch(
        rng, bs=bs, queue_length=q, future_length=f, num_cams=cams,
        img_h=96, img_w=160, max_points=256)
    shapes = jax.eval_shape(
        lambda: model.init({'params': key, 'dropout': key}, init_batch,
                           train=False))
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, s.dtype) * 0.02
        for k, s in zip(keys, leaves)])

    runner = ForecastRunner(model, params, (ih, iw),
                            num_future=cfg['test_future_frame_num'])

    # compile + warmup
    out = runner(batch)
    jax.block_until_ready(out)

    iters = 3 if SMOKE else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = runner(batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    fps = bs / dt
    denom = (A100_OPENSCENE_FPS_ESTIMATE if VARIANT == 'openscene'
             else A100_FORECAST_FPS_ESTIMATE)
    print(json.dumps({
        'metric': 'forecast_frames_per_sec',
        'value': round(fps, 4),
        'unit': 'samples/s (5-frame history + 6-future forecast)',
        'vs_baseline': round(fps / denom, 3),
    }))


if __name__ == '__main__':
    main()
