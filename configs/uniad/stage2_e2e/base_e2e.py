# UniAD stage 2 (end-to-end: track/map/motion/occ/planning)
# (reference UniAD/projects/configs/stage2_e2e/base_e2e.py; 20 epochs).
_base_ = ['../stage1_track_map/base_track_map.py']

total_epochs = 20

# stage 2 turns on the full task stack (reference base_e2e.py)
model = dict(
    task_loss_weight=dict(track=1.0, map=1.0, motion=1.0, occ=1.0,
                          planning=1.0),
)

load_from = 'ckpts/uniad_base_track_map.pth'
