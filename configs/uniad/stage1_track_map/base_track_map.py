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
    # stage 1 trains track + map only (reference base_track_map.py:
    # motion/occ/planning heads are absent until stage 2)
    task_loss_weight=dict(track=1.0, map=1.0, motion=0.0, occ=0.0,
                          planning=0.0),
)

# UniADDataset emits the (frames, UniADTargets, command) tuple the UniAD
# train step consumes (multi-task gt derived on the fly; occupancy gt
# rasterized on the encoder BEV grid to match OccHead's logits).
data = dict(
    train=dict(
        type='UniADDataset',
        ann_file='data/nuscenes/nuscenes_infos_temporal_train.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        classes=class_names,
        test_mode=False,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
        predict_steps=12,
        planning_steps=6,
        occ_n_future=4,
        map_ann_file=None,  # tools/map_converter.py output enables map gt
    ),
    test=dict(
        type='UniADDataset',
        ann_file='data/nuscenes/nuscenes_infos_temporal_val.pkl',
        data_root='data/nuscenes/',
        queue_length=queue_length,
        classes=class_names,
        test_mode=True,
        bev_size=(bev_h_, bev_w_),
        pc_range=point_cloud_range,
        predict_steps=12,
        planning_steps=6,
        occ_n_future=4,
        map_ann_file=None,
    ),
)

optimizer = dict(lr=2e-4, weight_decay=0.01, backbone_lr_mult=0.1)
grad_clip_norm = 35.0
total_epochs = 6

load_from = 'ckpts/bevformer_r101_dcn_24ep.pth'
