# ViDAR pretrain, nuScenes 1/8 subset, 3-future supervision.
# Mirrors the reference config of the same name (leaf-name compatible).
_base_ = ['../../_base_/default_runtime.py']

point_cloud_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
bev_h_ = 200
bev_w_ = 200
queue_length = 4
future_queue_length_train = 3
future_queue_length_test = 6

ida_aug_conf = {
    'reisze': [720, 765, 810, 855, 900, 945, 990, 1035, 1080],
    'crop': (0, 0, 1600, 900),
    'H': 900,
    'W': 1600,
    'rand_flip': True,
}

model = dict(
    type='ViDAR',
    embed_dims=256,
    bev_h=bev_h_,
    bev_w=bev_w_,
    pc_range=point_cloud_range,
    num_cams=6,
    backbone_depth=101,
    backbone_dcn=(False, False, True, True),
    frozen_stages=1,
    future_pred_frame_num=3,
    test_future_frame_num=6,
    history_queue_length=queue_length,
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
    # nuScenes per-camera visibility peaks ~0.35*num_query; 0.37 keeps
    # a small margin and cuts the SCA gather ~26% (sca_capacity_overflow
    # telemetry must stay zero on real data)
    sca_capacity_ratio=0.37,
    latent_render_lids=(2,),
    latent_render_cfg=dict(embed_dims=256, pred_height=16, num_pred_fcs=0,
                           grid_step=0.5, grid_num=256, reduction=16,
                           act='sigmoid'),
)

data = dict(
    train=dict(
        type='NuScenesViDARDatasetV1',
        ann_file='data/nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        future_length=future_queue_length_train,
        rand_frame_interval=(-1, 1, 2),
        ego_mask=(-0.8, -1.5, 0.8, 2.5),
        load_frame_interval=8,
        test_mode=False,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
        ida_aug_conf=ida_aug_conf,
    ),
    test=dict(
        type='NuScenesViDARDatasetV1',
        ann_file='data/nuscenes/nuscenes_infos_temporal_val.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        future_length=future_queue_length_test,
        ego_mask=(-0.8, -1.5, 0.8, 2.5),
        test_mode=True,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01, backbone_lr_mult=0.1)
grad_clip_norm = 35.0
total_epochs = 24
