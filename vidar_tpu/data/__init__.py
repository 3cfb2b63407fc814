from .structures import ViDARBatch
from .synthetic import make_synthetic_batch
from .nuscenes_mono import NuScenesMonoDataset
