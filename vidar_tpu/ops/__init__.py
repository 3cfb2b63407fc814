from .grid_sample import grid_sample_2d, grid_sample_3d
from .msda import msdeform_attn
from .chamfer import (ChamferDistance, chamfer_distance,
                      chamfer_distance_masked, nearest_neighbor_sq)
from .rotate import rotate_bev
from .voxel_render import (voxel_render, voxel_render_v2, voxel_render_loss,
                           voxel_render_forward)
from .dcnv3 import dcnv3_core
