"""UniAD task heads — aggregation module.

The round-1 compact heads were replaced by layer-for-layer counterparts of
the reference head zoo (SURVEY §2.5); this module re-exports them under the
historic import path:

* ``MotionHead``            <- motion_head.py (MotionFormer: intention /
  track / map / BEV interaction decoder + TrajLoss).
* ``OccHead``               <- occ_head.py (OccFormer: masked-attention
  future blocks + CVT decoder).
* ``PansegformerHead``      <- panseg_head.py (deformable encoder/decoder +
  thing/stuff mask heads).
* ``PlanningHeadSingleMode``<- planning_head.py (command-conditioned ego
  planner + device-native collision optimization).
"""

from .motion_head import (MotionHead, MotionDeformableAttention,
                          MotionTransformerAttentionLayer, default_anchors,
                          traj_loss, min_ade, min_fde, miss_rate, traj_nll)
from .occ_head import (OccHead, SimpleConv2d, Bottleneck, UpsamplingAdd,
                       CVTDecoder, bev_feature_slicer,
                       fiery_binary_seg_loss, dice_loss_with_masks)
from .panseg_head import (PansegformerHead, SegMaskHead, MaskAttention,
                          AttentionTail, panseg_loss_single, giou)
from .planning_head import (PlanningHeadSingleMode, collision_optimize,
                            planning_loss, collision_loss)

# Back-compat aliases for the round-1 compact names
PansegHead = PansegformerHead
PlanningHead = PlanningHeadSingleMode

__all__ = [
    'MotionHead', 'MotionDeformableAttention',
    'MotionTransformerAttentionLayer', 'default_anchors', 'traj_loss',
    'min_ade', 'min_fde', 'miss_rate', 'traj_nll',
    'OccHead', 'SimpleConv2d', 'Bottleneck', 'UpsamplingAdd', 'CVTDecoder',
    'bev_feature_slicer', 'fiery_binary_seg_loss', 'dice_loss_with_masks',
    'PansegformerHead', 'SegMaskHead', 'MaskAttention', 'AttentionTail',
    'panseg_loss_single', 'giou',
    'PlanningHeadSingleMode', 'collision_optimize', 'planning_loss',
    'collision_loss', 'PansegHead', 'PlanningHead',
]
