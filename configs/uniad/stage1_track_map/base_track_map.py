# UniAD stage 1 (track + map), stock BEVFormer encoder
# (reference UniAD/projects/configs/stage1_track_map/base_track_map.py).
_base_ = ['../../_base_/default_runtime.py']

point_cloud_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
bev_h_ = 200
bev_w_ = 200
queue_length = 5

class_names = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone')

model = dict(
    type='UniAD',
    embed_dims=256,
    bev_h=bev_h_,
    bev_w=bev_w_,
    num_cams=6,
    num_query=900,
    backbone_depth=101,
    latent_render_lids=(),
    latent_render_cfg=None,
    task_loss_weight=dict(track=1.0, map=1.0, motion=1.0, occ=1.0,
                          planning=1.0),
)

data = dict(
    train=dict(
        type='CustomNuScenesDataset',
        ann_file='data/nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        classes=class_names,
        test_mode=False,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
    ),
    test=dict(
        type='CustomNuScenesDataset',
        ann_file='data/nuscenes/nuscenes_infos_temporal_val.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        classes=class_names,
        test_mode=True,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01, backbone_lr_mult=0.1)
grad_clip_norm = 35.0
total_epochs = 6

load_from = 'ckpts/bevformer_r101_dcn_24ep.pth'
