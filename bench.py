"""Benchmark: visual point cloud forecast frames/sec on one TPU chip.

Measures the full ViDAR forecast step (the reference's ``forward_test``
equivalent: 5-frame history encode + 6-frame autoregressive future decode +
depth decode) at the flagship configuration, synthetic inputs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against an estimated A100 reference throughput for
the same workload (see BASELINE.md: the reference publishes no FPS; 0.5
forecast-frames/sec is our measured-order estimate for the torch model's
forward_test on A100 — to be refined with a real measurement).
"""

import json
import time

import numpy as np

A100_FORECAST_FPS_ESTIMATE = 0.5

# Reduced-cost flags for CI smoke (full run on TPU by default).
import os
SMOKE = os.environ.get('BENCH_SMOKE', '0') == '1'


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
    print(json.dumps({
        'metric': 'forecast_frames_per_sec',
        'value': round(fps, 4),
        'unit': 'samples/s (5-frame history + 6-future forecast)',
        'vs_baseline': round(fps / A100_FORECAST_FPS_ESTIMATE, 3),
    }))


if __name__ == '__main__':
    main()
