# Challenge submission config (reference submit_vidar_OpenScene_mini_full_
# 3future.py diff): history 5 + current, private-test meta pkl, ego mask off,
# submission writer enabled.
_base_ = ['./vidar_OpenScene_mini_full_3future.py']

queue_length = 5

model = dict(
    history_queue_length=queue_length,
    _submission=True,
    _submission_path='test_submit',
)

data = dict(
    train=dict(queue_length=queue_length),
    test=dict(
        queue_length=queue_length,
        ann_file=('data/openscene-v1.1/meta_datas/private_test_wm/'
                  'private_test_wm.pkl'),
        ego_mask=(-0.0, -0.0, 0.0, 0.0),
    ),
)
