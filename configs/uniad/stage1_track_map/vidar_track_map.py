# UniAD stage 1 with the ViDAR latent-rendering encoder + ViDAR-finetuned
# init (reference vidar_track_map.py:169-206: CustomBEVFormerEncoder with
# latent_render at layer 2).
_base_ = ['./base_track_map.py']

latent_render_layer_idx = (2,)
latent_render_grid_step = 0.5

model = dict(
    latent_render_lids=latent_render_layer_idx,
    latent_render_cfg=dict(embed_dims=256, pred_height=16, num_pred_fcs=0,
                           grid_step=latent_render_grid_step, grid_num=256,
                           reduction=16, act='sigmoid'),
)

load_from = 'ckpts/finetune-ViDAR-RN101-nus-full-1future.pth'
