"""UniAD stage-1 CLI smoke: config-driven clip training + streaming eval
with AMOTA through the real train/test entry points (VERDICT round-1 items
3-4: config<->dataset mismatch fixed, UniAD eval branch + tracking eval)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(mod_args, cwd, extra_env=None):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu')
    env.update(extra_env or {})
    return subprocess.run([sys.executable, '-m'] + mod_args,
                          capture_output=True, text=True, cwd=cwd, env=env,
                          timeout=1500)


def test_uniad_train_and_eval_cli(tmp_path):
    from tests.data.fake_nuscenes import make_fake_nuscenes
    pkl = make_fake_nuscenes(str(tmp_path / 'data'), num_samples=8,
                             num_cams=3, img_hw=(32, 64), num_scenes=2)
    cfg = os.path.join(REPO, 'configs', 'tiny', 'uniad_tiny.py')
    work = str(tmp_path / 'work')

    r = _run(['vidar_tpu.tools.train', cfg, '--work-dir', work,
              '--max-steps', '2', '--seed', '0',
              '--cfg-options', f'data.train.ann_file={pkl}',
              f'data.test.ann_file={pkl}', 'log_interval=1'],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    steps = [l for l in r.stdout.splitlines()
             if l.startswith('[') and '"loss"' in l]
    assert len(steps) >= 2, r.stdout[-2000:]
    for line in steps:
        m = json.loads(line.split('] ', 1)[1])
        assert m['loss'] == m['loss'], line          # not NaN
        assert 'track.loss' in m
    assert os.path.isdir(os.path.join(work, 'latest'))

    r = _run(['vidar_tpu.tools.test', cfg, os.path.join(work, 'latest'),
              '--max-samples', '4',
              '--out', str(tmp_path / 'metrics.json'),
              '--cfg-options', f'data.test.ann_file={pkl}'],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    with open(tmp_path / 'metrics.json') as f:
        metrics = json.load(f)
    for k in ('amota', 'amotp', 'NDS', 'minADE', 'planning.L2',
              'planning.obj_box_col'):
        assert k in metrics, (k, metrics)
        assert metrics[k] == metrics[k], k           # not NaN
