from .grid_sample import grid_sample_2d, grid_sample_3d
from .msda import msdeform_attn
from .chamfer import chamfer_distance, chamfer_distance_masked
from .rotate import rotate_bev
