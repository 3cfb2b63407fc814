# Tiny OpenScene/nuPlan ViDAR config: 8 cameras, PCD lidar, image scaling
# (the shape-shrunk counterpart of vidar_OpenScene_mini_1_8_3future.py for
# CLI smoke runs). Point ann_file at a fake pkl with lidar_format='pcd'.
_base_ = ['./vidar_tiny.py']

model = dict(
    type='ViDAR',
    num_cams=8,
)

data = dict(
    train=dict(
        type='NuPlanViDARDatasetV1',
        image_scale=0.5,
        ego_mask=None,
        rand_frame_interval=(1,),
    ),
    test=dict(
        type='NuPlanViDARDatasetV1',
        image_scale=0.5,
        ego_mask=None,
    ),
)
