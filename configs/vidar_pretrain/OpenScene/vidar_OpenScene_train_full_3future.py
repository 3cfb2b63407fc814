# OpenScene trainval split, 100% of frames.
_base_ = ['./vidar_OpenScene_train_1_8_3future.py']

load_frame_interval = 1
data = dict(train=dict(load_frame_interval=load_frame_interval))
