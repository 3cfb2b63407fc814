"""Flagship-scale ViDAR train step on the real TPU (VERDICT r2 #4).

Reference trains this exact shape on A100-80G: 928x1600, 6 cams, queue 4
(+1 current), 3 future frames (configs/vidar_pretrain/nusc_1_8_subset/
vidar_1_8_nusc_3future.py:8-32, 379-399). Measures s/it, the
backward/forward ratio (expected ~2.5-3x under per-layer remat), and peak
HBM. bs=1 like the reference (one sample per GPU).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_cc')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import optax
from vidar_tpu.models import ViDAR
from vidar_tpu.configs import vidar_base
from vidar_tpu.data import make_synthetic_batch
from vidar_tpu.train.step import create_train_state, make_train_step


def hbm_gb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return st.get('peak_bytes_in_use', 0) / 1e9
    except Exception:
        return float('nan')


HBM_CAPACITY_GB = 15.75   # v5e per-chip (VERDICT r3: OOM threshold seen)


def aot_mem(jitted, *args, label=''):
    """Per-executable HBM accounting via the AOT path —
    ``memory_stats()`` returns nan through the axon plugin (VERDICT r4
    weak #3). Caveat (measured round 5): the axon CHIPLESS AOT compiler
    can schedule with a different memory budget than the runtime compile
    — the flagship train step AOT-reports temp=18.45 GB yet runs on the
    15.75 GB chip — so read these as an upper bound on the executing
    binary, with "it runs" as the ground-truth fit check."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
        temp = ma.temp_size_in_bytes / 1e9
        arg = ma.argument_size_in_bytes / 1e9
        out = ma.output_size_in_bytes / 1e9
        alias = ma.alias_size_in_bytes / 1e9
        peak = temp + arg + out - alias
        print(f'AOT mem[{label}]: temp={temp:.2f} args={arg:.2f} '
              f'out={out:.2f} alias={alias:.2f} -> peak={peak:.2f} GB '
              f'(headroom {HBM_CAPACITY_GB - peak:+.2f} GB '
              f'of {HBM_CAPACITY_GB})', flush=True)
        return peak
    except Exception as e:
        print(f'AOT mem[{label}]: unavailable ({str(e)[:120]})', flush=True)
        return float('nan')


def main():
    cfg = vidar_base()
    cfg['remat'] = True
    supervise_all = True
    if '--mem-efficient' in sys.argv:
        # mem_efficient_vidar_1_8_nusc_3future: supervise ONE random future
        # frame, no auxiliary history/future channels, grid_step 1.0
        # (reference README.md:158-166, configs diff)
        cfg.update(pred_history_frame_num=0, pred_future_frame_num=0,
                   per_frame_loss_weight=(1.0,),
                   supervise_all_future=False, ray_grid_step=1.0,
                   loss_weight=((1.0,),))
        supervise_all = False
        print('variant: mem_efficient', flush=True)
    bs, q, f, cams, ih, iw, pts = 1, 4, 3, 6, 928, 1600, 32768
    if '--openscene' in sys.argv:
        # vidar_OpenScene_mini_1_8_3future train shape: 8 cams, 1080x1920
        # scaled 2/3 -> 736x1280 after /32 padding (reference
        # configs/vidar_pretrain/OpenScene/*_3future.py:14-55)
        cams, ih, iw = 8, 736, 1280
        cfg['num_cams'] = 8
        print('variant: openscene (8 cams, 736x1280)', flush=True)
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
                           train=True))
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree.unflatten(
        treedef, [jax.random.normal(k, s.shape, s.dtype) * 0.02
                  for k, s in zip(keys, leaves)])
    state = create_train_state(params, optax.adamw(1e-4))
    step = make_train_step(model, supervise_all_future=supervise_all)

    # forward-only (loss) for the backward/forward ratio
    fwd = jax.jit(lambda p, b, k: model.apply(
        p, b, train=True, rngs={'dropout': k, 'aug': k},
        gumbel_rng=k)[0])

    t0 = time.perf_counter()
    loss = float(jax.tree.leaves(fwd(params, batch, key))[0])
    print(f'fwd compile+run: {time.perf_counter()-t0:.1f}s loss0={loss:.4f}',
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.tree.leaves(fwd(params, batch, key))[0])
        ts.append(time.perf_counter() - t0)
    fwd_s = min(ts)
    print(f'forward: {fwd_s:.2f}s  peak_hbm={hbm_gb():.1f} GB', flush=True)
    aot_mem(fwd, params, batch, key, label='forward_train')

    t0 = time.perf_counter()
    state, metrics = step(state, batch, key)
    loss = float(metrics['loss'])
    print(f'step compile+run: {time.perf_counter()-t0:.1f}s loss={loss:.4f}',
          flush=True)
    assert np.isfinite(loss)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        float(metrics['loss'])
        ts.append(time.perf_counter() - t0)
    step_s = min(ts)
    print(f'train step: {step_s:.2f}s/it  bwd+opt/fwd='
          f'{(step_s - fwd_s) / fwd_s:.2f}x  peak_hbm={hbm_gb():.1f} GB',
          flush=True)
    aot_mem(step, state, batch, key, label='train_step')
    if '--trace' in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from trace_profile import capture, device_table
        ev, tmpdir = capture(lambda: step(state, batch, key)[1]['loss'],
                             'train_step', warmup=0, iters=1)
        device_table(ev, top=40, iters=1)
        print(f'trace: {tmpdir}', flush=True)
    print('FLAGSHIP TRAIN OK', flush=True)


if __name__ == '__main__':
    main()
