# Baseline: plain BEVFormer (no latent rendering), FCOS3D init
# (reference bevformer_1_4_baseline.py: BEVFormerEncoder/BEVFormerLayer,
# load_from ckpts/r101_dcn_fcos3d_pretrain.pth).
_base_ = ['./vidar_1_8_nusc_3future.py']

model = dict(
    latent_render_lids=(),
    latent_render_cfg=None,
    backwarded_prev_frame_num=0,
)

load_from = 'ckpts/r101_dcn_fcos3d_pretrain.pth'
work_dir = 'work_dirs/fine-tune/bevformer_1_4_baseline'
