"""The released config matrix (SURVEY §2.7): every config loads, carries the
reference's leaf names, and its model dict instantiates through the builder."""

import glob
import os

import pytest

from vidar_tpu.core.builder import build_model
from vidar_tpu.core.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
ALL_CONFIGS = sorted(glob.glob(os.path.join(REPO, 'configs', '**', '*.py'),
                               recursive=True))
MODEL_CONFIGS = [p for p in ALL_CONFIGS if '_base_' not in p]

EXPECTED = [
    'vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_3future.py',
    'vidar_pretrain/nusc_1_8_subset/vidar_1_8_nusc_1future.py',
    'vidar_pretrain/nusc_1_8_subset/mem_efficient_vidar_1_8_nusc_3future.py',
    'vidar_pretrain/nusc_fullset/vidar_full_nusc_1future.py',
    'vidar_pretrain/OpenScene/vidar_OpenScene_mini_1_8_3future.py',
    'vidar_pretrain/OpenScene/vidar_OpenScene_mini_full_3future.py',
    'vidar_pretrain/OpenScene/vidar_OpenScene_train_1_8_3future.py',
    'vidar_pretrain/OpenScene/vidar_OpenScene_train_full_3future.py',
    'vidar_pretrain/OpenScene/submit_vidar_OpenScene_mini_full_3future.py',
    'vidar_finetune/nusc_1_4_subset/vidar_1_8_nusc_3future.py',
    'vidar_finetune/nusc_1_4_subset/vidar_1_8_nusc_1future.py',
    'vidar_finetune/nusc_1_4_subset/bevformer_1_4_baseline.py',
    'vidar_finetune/nusc_fullset/vidar_full_nusc_1future.py',
    'bevformer/bevformer_base.py',
    'bevformer/bevformer_small.py',
    'bevformer/bevformer_tiny.py',
    'uniad/stage1_track_map/base_track_map.py',
    'uniad/stage1_track_map/vidar_track_map.py',
    'uniad/stage2_e2e/base_e2e.py',
    'uniad/stage2_e2e/vidar_e2e.py',
]


def test_released_matrix_present():
    have = {os.path.relpath(p, os.path.join(REPO, 'configs'))
            for p in ALL_CONFIGS}
    missing = [e for e in EXPECTED if e not in have]
    assert not missing, f'missing configs: {missing}'


@pytest.mark.parametrize('path', MODEL_CONFIGS,
                         ids=[os.path.relpath(p, os.path.join(REPO,
                                                              'configs'))
                              for p in MODEL_CONFIGS])
def test_config_builds(path):
    cfg = load_config(path)
    assert 'model' in cfg and 'data' in cfg
    model = build_model(cfg['model'])
    assert model is not None
    # data sections carry the required leaves
    for split in ('train', 'test'):
        assert 'ann_file' in cfg['data'][split]


def test_finetune_deltas():
    base = load_config(os.path.join(
        REPO, 'configs/vidar_finetune/nusc_1_4_subset/'
        'vidar_1_8_nusc_3future.py'))
    assert base['model']['backwarded_prev_frame_num'] == 1
    assert base['model']['latent_render_lids'] == (2,)
    assert base['data']['train']['use_pretrain_data'] is True

    one = load_config(os.path.join(
        REPO, 'configs/vidar_finetune/nusc_1_4_subset/'
        'vidar_1_8_nusc_1future.py'))
    assert one['model']['latent_render_cfg']['grid_step'] == 1.0
    # _base_ merge preserved the other latent-render leaves
    assert one['model']['latent_render_cfg']['grid_num'] == 256

    baseline = load_config(os.path.join(
        REPO, 'configs/vidar_finetune/nusc_1_4_subset/'
        'bevformer_1_4_baseline.py'))
    assert baseline['model']['latent_render_lids'] == ()
    assert baseline['load_from'].endswith('r101_dcn_fcos3d_pretrain.pth')


def test_submission_config_flags():
    cfg = load_config(os.path.join(
        REPO, 'configs/vidar_pretrain/OpenScene/'
        'submit_vidar_OpenScene_mini_full_3future.py'))
    assert cfg['model']['_submission'] is True
    assert cfg['model']['history_queue_length'] == 5
    assert cfg['data']['test']['ego_mask'] == (-0.0, -0.0, 0.0, 0.0)
    # underscore leaves must not leak into the constructor
    m = build_model(cfg['model'])
    assert not hasattr(m, '_submission')
