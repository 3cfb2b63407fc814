# 100%-data fine-tune from the fullset 1-future pretrain
# (reference nusc_fullset/vidar_full_nusc_1future.py: no use_pretrain_data,
# grid_step 0.5).
_base_ = ['../nusc_1_4_subset/vidar_1_8_nusc_3future.py']

data = dict(
    train=dict(use_pretrain_data=False),
)

load_from = 'work_dirs/vidar_full_nusc_1future/latest'
work_dir = 'work_dirs/fine-tune/vidar_full_nusc_1future'
