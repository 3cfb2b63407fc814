# OpenScene mini split, 100% of frames (reference diff: load_frame_interval 1).
_base_ = ['./vidar_OpenScene_mini_1_8_3future.py']

load_frame_interval = 1
data = dict(train=dict(load_frame_interval=load_frame_interval))
