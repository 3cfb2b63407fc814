"""Streaming (video) evaluation: host-side ego-motion rebasing.

The reference's streaming ``forward_test`` (projects/mmdet3d_plugin/
bevformer/detectors/bevformer.py:291-324) caches the previous frame's BEV
plus its raw ego pos/angle in ``prev_frame_info``; each new frame's
can_bus is rebased to the delta against that cache, resets on scene
change, and the (pos, angle) cache is updated from the RAW values.

Here the same state machine runs on the host as :class:`StreamingRebase`
(all scalar math — keeping it out of the jitted graph), producing the
precomputed ``(can_bus, shift, rotate_angle, has_prev)`` arrays the
device-side ``BEVFormer.streaming_test`` consumes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..data.nuscenes import compute_bev_shift


class StreamingRebase:
    """Per-stream cache mirroring the reference's ``prev_frame_info``."""

    def __init__(self, bev_size=(200, 200),
                 pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)):
        self.bev_size = bev_size
        self.pc_range = pc_range
        self.scene_token: Optional[str] = None
        self.prev_pos: Optional[np.ndarray] = None
        self.prev_angle: Optional[float] = None

    def reset(self):
        self.scene_token = None
        self.prev_pos = None
        self.prev_angle = None

    def step(self, meta: Dict) -> Dict:
        """Rebase one streamed frame.

        Args:
          meta: dict with raw ``can_bus`` (pos in [:3], patch angle in
            [-1]), ``scene_token`` and ``l2g_rot`` — the
            ``Dataset.streaming_meta(i)`` contract.

        Returns dict(can_bus [18], shift [2], rotate_angle scalar,
        has_prev bool). ``has_prev`` is False on the first frame of a
        scene — the caller must also drop its cached prev_bev then
        (reference bevformer.py:298-301).
        """
        cb = np.asarray(meta['can_bus'], np.float64).copy()
        raw_pos = cb[:3].copy()
        raw_angle = float(cb[-1])
        has_prev = (self.scene_token == meta['scene_token']
                    and self.prev_pos is not None)
        if has_prev:
            cb[:3] = raw_pos - self.prev_pos
            cb[-1] = raw_angle - self.prev_angle
        else:
            cb[:3] = 0.0
            cb[-1] = 0.0
        self.scene_token = meta['scene_token']
        self.prev_pos = raw_pos
        self.prev_angle = raw_angle
        shift = compute_bev_shift(cb, meta['l2g_rot'], self.bev_size,
                                  self.pc_range)
        return dict(can_bus=cb.astype(np.float32), shift=shift,
                    rotate_angle=np.float32(cb[-1]), has_prev=has_prev)
