# BEVFormer-small. NOTE: the reference ships this file EMPTY (0 bytes,
# projects/configs/bevformer/bevformer_small.py); this fills it per the
# upstream BEVFormer-small recipe (RN101-DCN, bev 150x150, 3 encoder layers,
# queue 3).
_base_ = ['./bevformer_base.py']

bev_h_ = 150
bev_w_ = 150
queue_length = 3

model = dict(
    bev_h=bev_h_,
    bev_w=bev_w_,
    encoder_num_layers=3,
)

data = dict(
    train=dict(queue_length=queue_length, bev_size=(bev_h_, bev_w_)),
    test=dict(queue_length=queue_length, bev_size=(bev_h_, bev_w_)),
)
