# Stock BEVFormer-base (reference projects/configs/bevformer/bevformer_base.py:
# RN101-DCN, bev 200x200, 6 encoder / 6 decoder layers, queue 4, no latent
# rendering).
_base_ = ['../_base_/default_runtime.py']

point_cloud_range = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
bev_h_ = 200
bev_w_ = 200
queue_length = 4

class_names = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone')

model = dict(
    type='BEVFormer',
    embed_dims=256,
    bev_h=bev_h_,
    bev_w=bev_w_,
    pc_range=point_cloud_range,
    num_cams=6,
    num_classes=10,
    num_query=900,
    backbone_depth=101,
    backbone_dcn=(False, False, True, True),
    frozen_stages=1,
    use_grid_mask=True,
    backwarded_prev_frame_num=0,
    encoder_num_layers=6,
    latent_render_lids=(),
    latent_render_cfg=None,
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
total_epochs = 24

load_from = 'ckpts/r101_dcn_fcos3d_pretrain.pth'
