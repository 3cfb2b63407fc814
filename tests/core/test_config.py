"""Config system: _base_ inheritance, deep merge, dotted overrides."""

import os

from vidar_tpu.core.config import load_config, apply_overrides

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_released_config_loads():
    cfg = load_config(os.path.join(
        REPO, 'configs/vidar_pretrain/nusc_1_8_subset/'
        'vidar_1_8_nusc_3future.py'))
    assert cfg['model']['bev_h'] == 200
    assert cfg['model']['future_pred_frame_num'] == 3
    assert cfg['log_interval'] == 50  # inherited from _base_
    assert cfg['data']['train']['load_frame_interval'] == 8


def test_base_override_chain():
    cfg = load_config(os.path.join(
        REPO, 'configs/vidar_pretrain/nusc_fullset/'
        'vidar_full_nusc_1future.py'))
    # two-level inheritance: 1future <- 3future, fullset <- 1future
    assert cfg['model']['future_pred_frame_num'] == 0
    assert cfg['model']['decoder_num_layers'] == 1
    assert cfg['total_epochs'] == 50
    assert cfg['data']['train']['load_frame_interval'] == 1
    # deep merge must preserve sibling leaves
    assert cfg['data']['train']['ego_mask'] == (-0.8, -1.5, 0.8, 2.5)
    assert cfg['data']['test']['future_length'] == 6


def test_cfg_options_override():
    cfg = load_config(os.path.join(
        REPO, 'configs/vidar_pretrain/nusc_1_8_subset/'
        'vidar_1_8_nusc_3future.py'))
    cfg = apply_overrides(cfg, ['model.bev_h=100', 'total_epochs=2',
                                'data.train.load_frame_interval=4'])
    assert cfg['model']['bev_h'] == 100
    assert cfg['total_epochs'] == 2
    assert cfg['data']['train']['load_frame_interval'] == 4
    assert cfg['model']['bev_w'] == 200  # untouched
