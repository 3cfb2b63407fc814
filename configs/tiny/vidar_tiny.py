# Tiny ViDAR config for CLI smoke runs and CI (shapes shrunk ~100x).
# Point data.train.ann_file / data.test.ann_file at a real or fake infos
# pkl (tests/data/fake_nuscenes.py generates a compatible one).
_base_ = ['../_base_/default_runtime.py']

point_cloud_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)

model = dict(
    type='ViDAR',
    embed_dims=32,
    bev_h=12,
    bev_w=12,
    pc_range=point_cloud_range,
    num_cams=3,
    backbone_depth=50,
    backbone_dcn=(False, False, True, True),
    frozen_stages=1,
    future_pred_frame_num=1,
    test_future_frame_num=1,
    history_queue_length=1,
    supervise_all_future=True,
    pred_history_frame_num=0,
    pred_future_frame_num=0,
    per_frame_loss_weight=(1.0,),
    loss_weight=((1,), (1,), (0,)),
    num_pred_height=4,
    ray_grid_num=32,
    ray_grid_step=1.0,
    use_ce_loss=True,
    use_dist_loss=False,
    use_dense_loss=True,
    decoder_num_layers=1,
    encoder_num_layers=2,
    latent_render_lids=(1,),
    latent_render_cfg=dict(embed_dims=32, pred_height=4, num_pred_fcs=0,
                           grid_step=0.5, grid_num=8, reduction=8,
                           act='sigmoid'),
)

data = dict(
    train=dict(
        type='NuScenesViDARDatasetV1',
        ann_file='data/fake_nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='',
        queue_length=1,
        future_length=1,
        rand_frame_interval=(1,),
        ego_mask=(-0.8, -1.5, 0.8, 2.5),
        max_points=256,
        load_frame_interval=1,
        bev_size=(12, 12),
    ),
    test=dict(
        type='NuScenesViDARDatasetV1',
        ann_file='data/fake_nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='',
        queue_length=1,
        future_length=1,
        test_mode=True,
        ego_mask=(-0.8, -1.5, 0.8, 2.5),
        max_points=256,
        bev_size=(12, 12),
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01, backbone_lr_mult=0.1)
total_epochs = 1
log_interval = 1
