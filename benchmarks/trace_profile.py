"""Device-trace profiler for the production forecast pipeline (VERDICT r3 #1).

Captures a ``jax.profiler`` trace of the PRODUCTION phase functions (the
exact jitted callables ``ForecastRunner`` drives — not per-kernel loop
timings) and aggregates per-op device time from the xplane proto, so every
millisecond of one encode call / rollout step / backbone launch is
accounted against the kernel-bench numbers.

Usage:  python benchmarks/trace_profile.py [encode|rollout|backbone|sample|all]

Outputs a table: op name (fused-computation granularity), total device
time, occurrences. Requires the ``xprof`` pip package for xplane parsing
(present in this image).
"""
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture(fn, name, warmup=1, iters=1):
    """Run fn under jax.profiler.trace; return parsed device events."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    tmpdir = tempfile.mkdtemp(prefix=f'xtrace_{name}_')
    with jax.profiler.trace(tmpdir):
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
    paths = glob.glob(os.path.join(tmpdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane under {tmpdir}'
    return parse_xplane(paths[0]), tmpdir


def parse_xplane(path):
    """xplane -> list of (plane_name, event_name, dur_us) via xprof."""
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [path], 'trace_viewer', {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode('utf-8', 'replace')
    tv = json.loads(data)
    events = tv['traceEvents'] if isinstance(tv, dict) else tv
    pid_name = {}
    tid_name = {}
    out = []
    for e in events:
        if e.get('ph') == 'M':
            if e.get('name') == 'process_name':
                pid_name[e['pid']] = e['args'].get('name', '')
            if e.get('name') == 'thread_name':
                tid_name[(e['pid'], e.get('tid'))] = e['args'].get('name', '')
    for e in events:
        if e.get('ph') != 'X':
            continue
        plane = pid_name.get(e.get('pid'), '')
        thread = tid_name.get((e.get('pid'), e.get('tid')), '')
        out.append((plane, thread, e.get('name', ''), e.get('dur', 0)))
    return out


def device_table(events, top=40, iters=1):
    """Aggregate per-op device time on TPU op planes (XLA Ops thread)."""
    # TPU device planes are named like '/device:TPU:0'; XLA op events live
    # on threads named 'XLA Ops' / 'Steps' etc. Take the op-level thread.
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for plane, thread, name, dur in events:
        if 'TPU' not in plane and 'device' not in plane.lower():
            continue
        tl = thread.lower()
        if 'xla op' not in tl and 'tensorflow op' not in tl \
                and 'xla modules' not in tl:
            continue
        if 'xla modules' in tl:
            continue
        agg[name] += dur
        cnt[name] += 1
        total += dur
    rows = agg.most_common(top)
    print(f'{"us/iter":>12} {"%":>6} {"calls":>6}  op')
    for name, dur in rows:
        print(f'{dur / iters:12.0f} {100 * dur / max(total, 1):6.2f} '
              f'{cnt[name] // iters:6d}  {name[:110]}')
    print(f'{total / iters:12.0f} {100.0:6.2f} {"":6}  TOTAL device-op time')
    return total / iters


def module_table(events, iters=1):
    agg = collections.Counter()
    cnt = collections.Counter()
    for plane, thread, name, dur in events:
        if 'TPU' not in plane and 'device' not in plane.lower():
            continue
        if 'xla modules' not in thread.lower():
            continue
        agg[name] += dur
        cnt[name] += 1
    print('\nmodules:')
    for name, dur in agg.most_common(20):
        print(f'{dur / iters:12.0f} us  x{cnt[name] // max(iters,1):4d}  '
              f'{name[:100]}')


def build():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from vidar_tpu.models import ViDAR
    from vidar_tpu.configs import vidar_base
    from vidar_tpu.data import make_synthetic_batch
    from vidar_tpu.evals.forecast_runner import ForecastRunner

    cfg = vidar_base()
    cfg['test_future_frame_num'] = 6
    bs, q, f, cams, ih, iw, pts = 1, 4, 6, 6, 928, 1600, 32768
    model = ViDAR(**cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=bs, queue_length=q, future_length=f,
                                 num_cams=cams, img_h=ih, img_w=iw,
                                 max_points=pts)
    key = jax.random.PRNGKey(0)
    init_batch = make_synthetic_batch(rng, bs=bs, queue_length=q,
                                      future_length=f, num_cams=cams,
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
    return runner, batch, model


def main():
    import jax
    import jax.numpy as jnp
    what = sys.argv[1] if len(sys.argv) > 1 else 'all'
    runner, batch, model = build()
    print('built', flush=True)
    p = runner.params
    bs, t, cams, h, w, _ = batch.images.shape

    # materialize the production phase inputs once
    imgs = batch.images.reshape(bs * t * cams, h, w, 3)
    feats_all = runner._backbone(p, imgs)
    print('backbone ready', flush=True)
    feats_all = [x.reshape((bs, t, cams) + x.shape[1:]) for x in feats_all]
    prev_bev = jnp.zeros(
        (bs, model.bev_h * model.bev_w, model.embed_dims), jnp.float32)
    feats0 = [x[:, 0] for x in feats_all]
    enc_args = (feats0, batch.can_bus[:, 0], batch.shift[:, 0],
                batch.rotate_angle[:, 0], batch.lidar2img[:, 0], prev_bev,
                batch.prev_bev_exists[:, 0])
    bev = runner._encode(p, *enc_args)
    print('encode ready', flush=True)
    hq = model.history_queue_length
    prev_feats = bev[:, None]
    ref2hist = batch.ref2cur[:, hq][:, None]
    can_dims = runner.can_bus_dims
    roll_args = (prev_feats, ref2hist, batch.future2ref[:, 1],
                 batch.ref2future[:, 1],
                 batch.future_can_bus[:, 1][:, can_dims])

    phases = {
        'backbone': lambda: runner._backbone(p, imgs),
        'encode': lambda: runner._encode(p, *enc_args),
        'rollout': lambda: runner._rollout(p, *roll_args),
        'sample': lambda: runner(batch),
    }
    names = list(phases) if what == 'all' else [what]
    for name in names:
        iters = 1 if name == 'sample' else 3
        print(f'\n===== {name} (x{iters}) =====')
        events, tmpdir = capture(phases[name], name, iters=iters)
        us = device_table(events, iters=iters)
        module_table(events, iters=iters)
        print(f'{name}: {us / 1e3:.1f} ms device-op time/iter '
              f'(trace: {tmpdir})')


if __name__ == '__main__':
    main()
