# BEVFormer-tiny (reference bevformer_tiny.py: RN50, bev 50x50, 3 encoder
# layers, queue 3, single feature level, images scaled 0.5).
_base_ = ['./bevformer_base.py']

bev_h_ = 50
bev_w_ = 50
queue_length = 3

model = dict(
    bev_h=bev_h_,
    bev_w=bev_w_,
    backbone_depth=50,
    backbone_dcn=(False, False, False, False),
    encoder_num_layers=3,
)

data = dict(
    train=dict(queue_length=queue_length, bev_size=(bev_h_, bev_w_)),
    test=dict(queue_length=queue_length, bev_size=(bev_h_, bev_w_)),
)

load_from = 'ckpts/resnet50-19c8e357.pth'
