# UniAD stage 2 with the ViDAR encoder, from the ViDAR stage-1 checkpoint.
_base_ = ['../stage1_track_map/vidar_track_map.py']

total_epochs = 20

# stage 2 turns on the full task stack
model = dict(
    task_loss_weight=dict(track=1.0, map=1.0, motion=1.0, occ=1.0,
                          planning=1.0),
)

load_from = 'ckpts/UniAD-s1-ViDAR-RN101-nus-full-1future.pth'
