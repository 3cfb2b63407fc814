# UniAD stage 2 (end-to-end: track/map/motion/occ/planning)
# (reference UniAD/projects/configs/stage2_e2e/base_e2e.py; 20 epochs).
_base_ = ['../stage1_track_map/base_track_map.py']

total_epochs = 20

load_from = 'ckpts/uniad_base_track_map.pth'
