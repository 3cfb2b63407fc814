"""Phase-wise forecast runner: the production/serving eval path.

Instead of one monolithic jit of history-scan + rollout + decode (a huge
XLA graph), this drives four small jitted functions from the host:
  backbone (per camera-frame batch) -> encode step (per frame) ->
  rollout step (per future frame) -> head + depth decode.
Each compiles once, caches persistently, and the per-frame loop lives on the
host exactly like a streaming deployment.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


class ForecastRunner:

    def __init__(self, model, params, img_hw, *, num_future: int,
                 can_bus_dims=(0, 1, 2, 17)):
        self.model = model
        self.params = params
        self.img_hw = tuple(img_hw)
        self.num_future = num_future
        self.can_bus_dims = list(can_bus_dims)

        self._backbone = jax.jit(partial(
            model.apply, method=model.backbone_forward))
        self._encode = jax.jit(partial(
            model.apply, method=model.encode_single,
            img_hw=self.img_hw))
        self._rollout = jax.jit(partial(
            model.apply, method=model.rollout_single))
        self._decode = jax.jit(partial(
            model.apply, method=model.decode_from_features,
            num_future=num_future))

    def __call__(self, batch) -> Dict:
        p = self.params
        bs, t, cams, h, w, _ = batch.images.shape

        prev_bev = jnp.zeros(
            (bs, self.model.bev_h * self.model.bev_w, self.model.embed_dims),
            jnp.float32)
        # one backbone launch for the whole history window: frames are
        # independent through the conv stack, and the 5x-larger conv batch
        # keeps the MXU fed (the sequential BEV recurrence below is the only
        # true frame dependency)
        imgs = batch.images.reshape(bs * t * cams, h, w, 3)
        feats_all = self._backbone(p, imgs)
        feats_all = [x.reshape((bs, t, cams) + x.shape[1:])
                     for x in feats_all]
        for f in range(t):
            feats = [x[:, f] for x in feats_all]
            prev_bev = self._encode(
                p, feats, batch.can_bus[:, f], batch.shift[:, f],
                batch.rotate_angle[:, f], batch.lidar2img[:, f], prev_bev,
                batch.prev_bev_exists[:, f])

        layers = self.model.decoder_num_layers
        ref_stack = jnp.broadcast_to(prev_bev[None],
                                     (layers,) + prev_bev.shape)
        next_feats = [ref_stack]
        hq = self.model.history_queue_length
        prev_feats = prev_bev[:, None]
        ref2hist = batch.ref2cur[:, hq][:, None]
        can_dims = self.can_bus_dims
        for fi in range(1, self.num_future + 1):
            pred, ref2hist = self._rollout(
                p, prev_feats, ref2hist, batch.future2ref[:, fi],
                batch.ref2future[:, fi],
                batch.future_can_bus[:, fi][:, can_dims])
            next_feats.append(pred)
            prev_feats = pred[-1][:, None]

        stacked = jnp.stack(next_feats, axis=0)
        return self._decode(p, stacked, batch.gt_points, batch.gt_tindex,
                            batch.cur2ref, batch.ref2cur)
