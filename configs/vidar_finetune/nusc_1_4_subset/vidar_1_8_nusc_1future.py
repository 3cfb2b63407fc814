# Fine-tune from the 1-future pretrain; grid_step 1.0 (reference diff :42).
_base_ = ['./vidar_1_8_nusc_3future.py']

latent_render_grid_step = 1.0

model = dict(
    latent_render_cfg=dict(grid_step=latent_render_grid_step),
)

load_from = 'work_dirs/vidar_1_8_nusc_1future/latest'
work_dir = 'work_dirs/fine-tune/vidar_1_8_nusc_1future'
