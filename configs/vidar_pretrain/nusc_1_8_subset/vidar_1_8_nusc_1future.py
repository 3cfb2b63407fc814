# ViDAR pretrain, nuScenes 1/8, current-frame-only training
# (future_pred_frame_num=0 -> only_train_cur_frame; reference
# vidar_1_8_nusc_1future.py:14-29).
_base_ = ['./vidar_1_8_nusc_3future.py']

model = dict(
    type='ViDAR',
    future_pred_frame_num=0,
    decoder_num_layers=1,
)

data = dict(
    train=dict(future_length=1, rand_frame_interval=(1,)),
)
