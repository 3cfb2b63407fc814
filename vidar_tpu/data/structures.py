"""Batch structures: every meta the reference reads from ``img_metas`` numpy
dicts inside forward (can_bus, lidar2img, 4x4 chains — SURVEY §3.2 "host
boundary") is precomputed host-side into fixed-shape arrays here.

Frame-window convention (reference datasets/nuscenes_vidar_dataset_v1.py:57 and
_template.py:96-142): the sample window is
``[t-Hq, ..., t-1]  +  [t, t+1, ..., t+F]`` with Hq = history_queue_length.
Window tindex: history frames 0..Hq-1, current frame Hq, futures Hq+1.. .
Camera frames cover [t-Hq+ ... t] (T = Hq + 1 image frames).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

Array = jnp.ndarray


@flax.struct.dataclass
class ViDARBatch:
    # --- camera stream (T = history_queue_length + 1 frames) ---
    images: Array          # [bs, T, cams, H, W, 3] normalised
    lidar2img: Array       # [bs, T, cams, 4, 4] fp32
    can_bus: Array         # [bs, T, 18] rebased deltas (dataset_v1.py:109-137)
    shift: Array           # [bs, T, 2] ego shift in BEV grid fractions
    rotate_angle: Array    # [bs, T] yaw delta (deg) = can_bus[-1]
    prev_bev_exists: Array  # [bs, T] bool

    # --- future chain (F_total + 1 entries, index 0 = current frame) ---
    future_can_bus: Array  # [bs, F+1, 18] (dataset_v1.py:143-181)
    future2ref: Array      # [bs, F+1, 4, 4]
    ref2future: Array      # [bs, F+1, 4, 4]

    # --- full window chains (TQ = Hq + 1 + F frames) ---
    cur2ref: Array         # [bs, TQ, 4, 4]
    ref2cur: Array         # [bs, TQ, 4, 4]

    # --- lidar supervision ---
    gt_points: Array       # [bs, P, 3] metric xyz in their own frame
    gt_tindex: Array       # [bs, P] int32 window tindex; -1 = padding

    @property
    def num_image_frames(self) -> int:
        return self.images.shape[1]


@flax.struct.dataclass
class DetBatch:
    """Fine-tune detection sample: the camera-stream ViDAR batch plus
    statically padded 3D gt boxes (reference CustomNuScenesDataset output,
    datasets/nuscenes_dataset.py:134-227)."""
    frames: ViDARBatch
    gt_bboxes: Array    # [bs, G, 9] (cx cy cz w l h rot vx vy), zero-padded
    gt_labels: Array    # [bs, G] int32 class ids; padding entries arbitrary
    num_valid_gt: Array  # [bs] int32


def collate_samples(items):
    """Stack bs=1 sample pytrees into one global batch (axis-0 concat).

    The TPU equivalent of the reference's DataLoader collate: the ``data``
    mesh axis is fed one sample per device (reference trains bs=1/GPU,
    datasets/builder.py:19-94). Used by both the train CLI's global-batch
    assembly and the sharded eval loop (reference apis/test.py:45-161)."""
    import jax
    import jax.numpy as jnp
    if len(items) == 1:
        return items[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *items)
