# UniAD stage 2 with the ViDAR encoder, from the ViDAR stage-1 checkpoint.
_base_ = ['../stage1_track_map/vidar_track_map.py']

total_epochs = 20

load_from = 'ckpts/UniAD-s1-ViDAR-RN101-nus-full-1future.pth'
