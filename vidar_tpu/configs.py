"""Model/config presets mirroring the reference's released configs.

Leaf names intentionally mirror the reference config keys
(projects/configs/vidar_pretrain/... — SURVEY §2.7) so users of the reference
can map their configs 1:1. Python dicts in, ViDAR kwargs out.
"""

from __future__ import annotations

from typing import Any, Dict

# the shared base of every released ViDAR config
# (vidar_1_8_nusc_3future.py:10,65-71)
POINT_CLOUD_RANGE = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

LATENT_RENDER_CFG = dict(embed_dims=256, pred_height=16, num_pred_fcs=0,
                         grid_step=0.5, grid_num=256, reduction=16,
                         act='sigmoid')


def vidar_base(**overrides) -> Dict[str, Any]:
    """vidar_1_8_nusc_3future (reference :14-39,73-216)."""
    cfg = dict(
        embed_dims=256,
        bev_h=200,
        bev_w=200,
        pc_range=POINT_CLOUD_RANGE,
        num_cams=6,
        backbone_depth=101,
        backbone_dcn=(False, False, True, True),
        frozen_stages=1,
        future_pred_frame_num=3,
        test_future_frame_num=6,
        history_queue_length=4,
        supervise_all_future=True,
        pred_history_frame_num=3,
        pred_future_frame_num=1,
        per_frame_loss_weight=(0.2, 0.4, 0.6, 1.0, 1.2),
        loss_weight=((1,), (1,), (1,), (1,), (0,)),
        num_pred_height=16,
        ray_grid_num=512,
        ray_grid_step=1.0,
        use_ce_loss=True,
        use_dist_loss=False,
        use_dense_loss=True,
        decoder_num_layers=3,
        encoder_num_layers=6,
        latent_render_lids=(2,),
        latent_render_cfg=dict(LATENT_RENDER_CFG),
        # SCA visible-query capacity: per-camera visibility measured
        # through the production projection code on geometrically
        # realistic rigs peaks at 0.247 (nuScenes 6-cam, the ~90deg back
        # cam) and 0.191 (OpenScene 8-cam) of num_query
        # (tests/models/test_sca_capacity_geometry.py). 0.30 keeps ~21%
        # margin for real-rig pose variation while cutting the SCA
        # gather/prep ~19% vs the old 0.37. The sowed
        # sca_capacity_overflow intermediate + the train-CLI guard catch
        # any rig that exceeds it; scan real infos with
        # `tools/analysis.py visibility-scan` before lowering further.
        sca_capacity_ratio=0.30,
    )
    cfg.update(overrides)
    return cfg


def vidar_1_8_nusc_3future() -> Dict[str, Any]:
    return vidar_base()


def vidar_1_8_nusc_1future() -> Dict[str, Any]:
    """future_pred_frame_num=0 -> only_train_cur_frame
    (reference vidar_1_8_nusc_1future.py:14-29)."""
    return vidar_base(future_pred_frame_num=0, decoder_num_layers=1)


def mem_efficient_vidar_1_8_nusc_3future() -> Dict[str, Any]:
    """(reference mem_efficient_* diff: supervise one future, no aux frames)."""
    return vidar_base(
        supervise_all_future=False,
        pred_history_frame_num=0,
        pred_future_frame_num=0,
        per_frame_loss_weight=(1.0,),
        ray_grid_step=1.0,
    )


def vidar_openscene_3future() -> Dict[str, Any]:
    """OpenScene/nuPlan 8-cam variant
    (reference vidar_OpenScene_mini_1_8_3future.py:14-55)."""
    return vidar_base(
        num_cams=8,
        pred_history_frame_num=0,
        pred_future_frame_num=0,
        per_frame_loss_weight=(1.0,),
    )


def vidar_dryrun(**overrides) -> Dict[str, Any]:
    """Minimum graph that still exercises every training subsystem
    (backbone+FPN, TSA/SCA encoder with latent render, history scan,
    rollout scan, multi-frame head, ray losses, optimizer): the driver's
    multi-chip dryrun compiles this on single-core XLA:CPU where compile
    time is the budget, so layer counts are 1."""
    return vidar_tiny(
        encoder_num_layers=1,
        decoder_num_layers=1,
        latent_render_lids=(0,),
        **overrides)


def vidar_tiny(**overrides) -> Dict[str, Any]:
    """Small config for tests / multi-chip dryruns."""
    cfg = vidar_base(
        embed_dims=32,
        bev_h=16,
        bev_w=16,
        num_cams=3,
        backbone_depth=50,
        future_pred_frame_num=1,
        test_future_frame_num=2,
        history_queue_length=2,
        pred_history_frame_num=1,
        pred_future_frame_num=1,
        per_frame_loss_weight=(0.5, 1.0, 1.2),
        loss_weight=((1,), (1,), (0,)),
        num_pred_height=4,
        ray_grid_num=16,
        decoder_num_layers=2,
        encoder_num_layers=2,
        latent_render_lids=(1,),
        latent_render_cfg=dict(embed_dims=32, pred_height=4, grid_num=8,
                               grid_step=0.5, reduction=8, act='sigmoid',
                               num_pred_fcs=0),
    )
    cfg.update(overrides)
    return cfg
