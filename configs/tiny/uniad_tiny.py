# Tiny UniAD stage-1-style config for CLI smoke runs and CI.
# Mirrors configs/uniad/stage1_track_map/base_track_map.py with ~100x
# smaller shapes; drives the clip train step (UniADDataset emits per-frame
# track gt) and the UniAD eval branch of tools/test.py.
_base_ = ['../_base_/default_runtime.py']

point_cloud_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

model = dict(
    type='UniAD',
    embed_dims=32,
    bev_h=8,
    bev_w=8,
    pc_range=point_cloud_range,
    num_cams=3,
    num_query=16,
    num_seg_query=12,
    backbone_depth=50,
    predict_steps=4,
    predict_modes=2,
    occ_n_future=1,
    planning_steps=6,
    memory_len=2,
    latent_render_lids=(1,),
    latent_render_cfg=dict(embed_dims=32, pred_height=4, num_pred_fcs=0,
                           grid_step=0.5, grid_num=8, reduction=8,
                           act='sigmoid'),
    task_loss_weight=dict(track=1.0, map=1.0, motion=1.0, occ=1.0,
                          planning=1.0),
)

data = dict(
    train=dict(
        type='UniADDataset',
        ann_file='data/fake_nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='',
        queue_length=1,
        bev_size=(8, 8),
        pc_range=point_cloud_range,
        predict_steps=4,
        planning_steps=6,
        occ_n_future=1,
        occ_size=(8, 8),
        max_gt=8,
    ),
    test=dict(
        type='UniADDataset',
        ann_file='data/fake_nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='',
        queue_length=1,
        test_mode=True,
        bev_size=(8, 8),
        pc_range=point_cloud_range,
        predict_steps=4,
        planning_steps=6,
        occ_n_future=1,
        occ_size=(8, 8),
        max_gt=8,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01, backbone_lr_mult=0.1)
total_epochs = 1
log_interval = 1
