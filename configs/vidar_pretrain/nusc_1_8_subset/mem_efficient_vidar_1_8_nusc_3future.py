# Memory-efficient variant: supervise one random future frame, no aux
# history/future channels (reference mem_efficient_vidar_1_8_nusc_3future.py).
_base_ = ['./vidar_1_8_nusc_3future.py']

model = dict(
    type='ViDAR',
    supervise_all_future=False,
    pred_history_frame_num=0,
    pred_future_frame_num=0,
    per_frame_loss_weight=(1.0,),
)
