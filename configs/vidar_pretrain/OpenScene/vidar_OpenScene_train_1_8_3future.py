# OpenScene trainval split, 1/8 subset (reference diff: data_split 'trainval').
_base_ = ['./vidar_OpenScene_mini_1_8_3future.py']

data_split = 'trainval'
data = dict(
    train=dict(
        ann_file=f'data/openscene-v1.1/openscene_{data_split}_train.pkl'),
    test=dict(
        ann_file=f'data/openscene-v1.1/openscene_{data_split}_val.pkl'),
)
