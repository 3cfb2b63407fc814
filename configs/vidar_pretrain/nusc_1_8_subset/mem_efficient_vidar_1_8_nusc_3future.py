# Memory-efficient variant: supervise one random future frame, no aux
# history/future channels (reference mem_efficient_vidar_1_8_nusc_3future.py).
_base_ = ['./vidar_1_8_nusc_3future.py']

model = dict(
    type='ViDAR',
    supervise_all_future=False,
    pred_history_frame_num=0,
    pred_future_frame_num=0,
    per_frame_loss_weight=(1.0,),
    # reference: latent_render_grid_step = 1.0 (TODO 0.5) in the
    # mem-efficient variant (cfg :39)
    latent_render_cfg=dict(grid_step=1.0),
)

# the reference swaps CropResizeFlipImage for RandomCropResizeFlipImage
# (random bottom-crop + flip, augmentation.py:204; cfg :311)
ida_aug_conf = {
    'reisze': [720, 765, 810, 855, 900, 945, 990, 1035, 1080],
    'crop': (0, 0, 1600, 900),
    'H': 900,
    'W': 1600,
    'rand_flip': True,
}

data = dict(
    train=dict(
        ida_aug_conf=None,
        random_aug_conf=ida_aug_conf,
        rand_frame_interval=(-1, 1),  # reference cfg :16
    ),
)
