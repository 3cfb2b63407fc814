# Fullset pretrain: train+test merged pkl, every frame, 50 epochs
# (reference vidar_full_nusc_1future.py:331-402).
_base_ = ['../nusc_1_8_subset/vidar_1_8_nusc_1future.py']

data = dict(
    train=dict(
        type='NuScenesViDARDatasetV1',
        ann_file='data/nuscenes/nuscenes_infos_temporal_traintest.pkl',
        load_frame_interval=1,
    ),
)

total_epochs = 50
