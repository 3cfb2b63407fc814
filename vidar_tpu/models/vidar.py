"""ViDAR: visual point cloud forecasting model (top level).

Capability match for reference
projects/mmdet3d_plugin/bevformer/detectors/vidar.py (forward_train:239-387,
forward_test:389-502) and bevformer.py (obtain_history_bev:158-232), rebuilt
for XLA:

* the image backbone runs ONCE over all (frame, camera) images as a single
  batched conv stack (the reference batches history frames the same way,
  bevformer.py:166-173);
* the frozen history recurrence is a ``lax.scan`` over frames with
  stop_gradient (reference: torch.no_grad + model.eval());
* the autoregressive future rollout is a ``lax.scan`` with a static length
  (train: future_pred_frame_num, test: test_future_frame_num) whose carry is
  the [bs, 1, H*W, C] memory and the ref->history 4x4;
* all meta math arrives precomputed in ``ViDARBatch`` (no numpy in-forward).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .resnet import ResNet
from .fpn import FPN
from .grid_mask import grid_mask
from .transformer import BEVEncoderHead
from .vidar_head import ViDARHead
from ..data.structures import ViDARBatch


def _bev_cell_grids(bev_h: int, bev_w: int) -> np.ndarray:
    ys = (np.arange(bev_h, dtype=np.float32) + 0.5) / bev_h
    xs = (np.arange(bev_w, dtype=np.float32) + 0.5) / bev_w
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # [N, 2]


class ViDAR(nn.Module):
    # BEV / volume configuration
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    # backbone
    backbone_depth: int = 101
    backbone_dcn: Tuple[bool, ...] = (False, False, True, True)
    frozen_stages: int = 1
    # augmentation
    use_grid_mask: bool = True
    # rollout
    future_pred_frame_num: int = 3
    test_future_frame_num: int = 6
    history_queue_length: int = 4
    supervise_all_future: bool = True
    # head
    pred_history_frame_num: int = 3
    pred_future_frame_num: int = 1
    per_frame_loss_weight: Tuple[float, ...] = (0.2, 0.4, 0.6, 1.0, 1.2)
    loss_weight: Tuple[Tuple[float, ...], ...] = ((1,), (1,), (1,), (1,), (0,))
    num_pred_height: int = 16
    ray_grid_num: int = 512
    ray_grid_step: float = 1.0
    use_ce_loss: bool = True
    use_dist_loss: bool = False
    use_dense_loss: bool = True
    decoder_num_layers: int = 3
    # encoder
    encoder_num_layers: int = 6
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    sca_capacity_ratio: float = 0.5
    rotate_mode: str = 'nearest'
    remat: bool = False
    dtype: jnp.dtype | None = None

    def setup(self):
        self.img_backbone = ResNet(
            depth=self.backbone_depth, out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages,
            stage_with_dcn=self.backbone_dcn,
            remat=self.remat,
            dtype=self.dtype, name='img_backbone')
        self.img_neck = FPN(out_channels=self.embed_dims, num_outs=4,
                            dtype=self.dtype, name='img_neck')
        self.pts_bbox_head = BEVEncoderHead(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, num_cams=self.num_cams,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            encoder_num_layers=self.encoder_num_layers,
            sca_capacity_ratio=self.sca_capacity_ratio,
            rotate_mode=self.rotate_mode,
            remat=self.remat,
            dtype=self.dtype, name='pts_bbox_head')
        self.future_pred_head = ViDARHead(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range,
            num_pred_height=self.num_pred_height,
            history_queue_length=self.history_queue_length,
            pred_history_frame_num=self.pred_history_frame_num,
            pred_future_frame_num=self.pred_future_frame_num,
            per_frame_loss_weight=self.per_frame_loss_weight,
            loss_weight=self.loss_weight,
            ray_grid_num=self.ray_grid_num,
            ray_grid_step=self.ray_grid_step,
            use_ce_loss=self.use_ce_loss,
            use_dist_loss=self.use_dist_loss,
            use_dense_loss=self.use_dense_loss,
            decoder_num_layers=self.decoder_num_layers,
            dtype=self.dtype, name='future_pred_head')

    # ------------------------------------------------------------- features

    def extract_feats(self, images):
        """[bs, T, cams, H, W, 3] -> list of [T, bs, cams, h, w, C]."""
        bs, t, cams, h, w, _ = images.shape
        x = images.reshape(bs * t * cams, h, w, 3)
        feats = self.img_backbone(x)
        feats = self.img_neck(feats)
        out = []
        for f in feats:
            _, fh, fw, c = f.shape
            out.append(f.reshape(bs, t, cams, fh, fw, c).transpose(
                1, 0, 2, 3, 4, 5))
        return out

    def extract_feats_cam_scan(self, images):
        """[bs, cams, H, W, 3] -> list of [1, bs, cams, h, w, C].

        Camera-sequential backbone for the GRADIENT-carrying frame: a
        remat'd ``nn.scan`` over cameras. A scan's backward is sequential
        BY CONSTRUCTION, so the per-camera backbone backwards cannot be
        co-scheduled — the flagship train step's peak was XLA running all
        cameras' backbone backward concurrently (~6x the working set; the
        spatial dims keep the MXU fed at conv batch 1, so the serial form
        costs only launch glue). Eval and the no-grad history frames keep
        the single batched launch (``extract_feats``)."""
        def step(mdl, carry, img):
            return carry, tuple(mdl.img_neck(mdl.img_backbone(img)))

        scan = nn.scan(nn.remat(step), variable_broadcast='params',
                       split_rngs={'params': False, 'dropout': False},
                       in_axes=0, out_axes=0)
        # [bs, cams, H, W, 3] -> [cams, bs, H, W, 3]
        _, feats = scan(self, None, images.transpose(1, 0, 2, 3, 4))
        # tuple of [cams, bs, h, w, C] -> list of [1, bs, cams, h, w, C]
        return [f.transpose(1, 0, 2, 3, 4)[None] for f in feats]

    # -------------------------------------------------------------- history

    def encode_history(self, feats, batch: ViDARBatch, img_hw,
                       *, num_history: int):
        """Frozen scan over the first ``num_history`` frames -> prev_bev.

        feats: list of [T, bs, cams, h, w, C]. Returns [bs, H*W, C].
        """
        hist_feats = [jax.lax.stop_gradient(f[:num_history]) for f in feats]

        def step(mdl, carry, xs):
            prev_bev = carry
            f0, f1, f2, f3, can_bus, shift, angle, l2i, exists = xs
            bev = mdl.pts_bbox_head(
                [f0, f1, f2, f3], can_bus, shift, angle, l2i, img_hw,
                prev_bev, exists, deterministic=True)
            bev = jax.lax.stop_gradient(bev)
            return bev, None

        bs = batch.images.shape[0]
        # BEV features are kept fp32 (the encoder's final LayerNorm outputs
        # fp32 even under a bf16 compute dtype) — the carry must match.
        init = jnp.zeros((bs, self.bev_h * self.bev_w, self.embed_dims),
                         jnp.float32)
        xs = (
            hist_feats[0], hist_feats[1], hist_feats[2], hist_feats[3],
            batch.can_bus.transpose(1, 0, 2)[:num_history],
            batch.shift.transpose(1, 0, 2)[:num_history],
            batch.rotate_angle.transpose(1, 0)[:num_history],
            batch.lidar2img.transpose(1, 0, 2, 3, 4)[:num_history],
            batch.prev_bev_exists.transpose(1, 0)[:num_history],
        )
        scan = nn.scan(step, variable_broadcast='params',
                       split_rngs={'params': False, 'dropout': False},
                       in_axes=0, out_axes=0)
        prev_bev, _ = scan(self, init, xs)
        return prev_bev

    # -------------------------------------------------------------- rollout

    def _align_future_coords(self, future2ref_t, ref_to_history):
        """Target-frame BEV grid + its projection into the memory frame(s).

        (reference vidar.py:192-237 _align_bev_coordnates; note the
        [x, y, 1, 1] homogeneous quirk — z is literally 1.)
        Returns (tgt_grids [bs, N, 2] in [0,1],
                 aligned_grids [bs, N, F, 2] in [0,1]).
        """
        bs, f = ref_to_history.shape[:2]
        pc = self.pc_range
        n = self.bev_h * self.bev_w
        grids = jnp.asarray(_bev_cell_grids(self.bev_h, self.bev_w))
        coords = jnp.stack([
            grids[:, 0] * (pc[3] - pc[0]) + pc[0],
            grids[:, 1] * (pc[4] - pc[1]) + pc[1],
            jnp.ones((n,), jnp.float32),
            jnp.ones((n,), jnp.float32),
        ], -1)  # [N, 4]

        fut2hist = jnp.einsum('bij,bfjk->bfik', future2ref_t, ref_to_history)
        aligned = jnp.einsum('nj,bfjk->bfnk', coords, fut2hist)[..., :2]
        ax = (aligned[..., 0] - pc[0]) / (pc[3] - pc[0])
        ay = (aligned[..., 1] - pc[1]) / (pc[4] - pc[1])
        aligned_grids = jnp.stack([ax, ay], -1)  # [bs, F, N, 2] in [0,1]
        aligned_grids = aligned_grids.transpose(0, 2, 1, 3)  # [bs, N, F, 2]

        tgt_grids = jnp.broadcast_to(grids[None], (bs, n, 2))
        return tgt_grids, aligned_grids

    def rollout(self, ref_bev, batch: ViDARBatch, *, num_future: int,
                train_frame_gate=None, deterministic: bool = True):
        """Autoregressive future prediction.

        Args:
          ref_bev: [bs, H*W, C] current-frame BEV.
          num_future: static rollout length (train 3 / test 6).
          train_frame_gate: optional [num_future] float gate; frames with 0
            are rolled out under stop_gradient (supervise_all_future=False).
        Returns [num_future, layers, bs, H*W, C].
        """
        bs = ref_bev.shape[0]
        if batch.future2ref.shape[1] < num_future + 1:
            raise ValueError(
                f'batch future chain has {batch.future2ref.shape[1] - 1} '
                f'future frames but the rollout needs {num_future} '
                f'(future_pred_frame_num / test_future_frame_num)')
        can_dims = np.asarray(self.future_pred_head.can_bus_dims)

        init_ref2hist = batch.ref2cur[:, self.history_queue_length][:, None]
        carry = (ref_bev[:, None], init_ref2hist)

        xs = (
            batch.future2ref.transpose(1, 0, 2, 3)[1:num_future + 1],
            batch.ref2future.transpose(1, 0, 2, 3)[1:num_future + 1],
            batch.future_can_bus.transpose(1, 0, 2)[1:num_future + 1][
                ..., can_dims],
            (train_frame_gate if train_frame_gate is not None
             else jnp.ones((num_future,))),
        )

        def step(mdl, carry, xs):
            prev_feats, ref2hist = carry
            fut2ref_t, ref2fut_t, can_bus_t, gate = xs
            tgt, aligned = mdl._align_future_coords(fut2ref_t, ref2hist)
            pred = mdl.future_pred_head.predict_next(
                prev_feats, can_bus_t, tgt, aligned,
                deterministic=deterministic)  # [layers, bs, N, C]
            pred = jnp.where(gate > 0, pred, jax.lax.stop_gradient(pred))
            new_carry = (pred[-1][:, None], ref2fut_t[:, None])
            return new_carry, pred

        scan = nn.scan(step, variable_broadcast='params',
                       split_rngs={'params': False, 'dropout': True},
                       in_axes=0, out_axes=0)
        _, preds = scan(self, carry, xs)
        return preds

    # ---------------------------------------------------- streaming methods
    # Phase-wise entry points for serving / benchmarking: each compiles to a
    # small graph reused across frames (vs one monolithic jit of the whole
    # forecast). Drive them with model.apply(..., method=...).

    def backbone_forward(self, images_flat):
        """[N, H, W, 3] -> list of [N, h, w, C] FPN maps."""
        return self.img_neck(self.img_backbone(images_flat))

    def encode_single(self, feats, can_bus, shift, rotate_angle, lidar2img,
                      prev_bev, prev_bev_exists, img_hw):
        """One frame's BEV encode. feats: list of [bs, cams, h, w, C]."""
        return self.pts_bbox_head(feats, can_bus, shift, rotate_angle,
                                  lidar2img, img_hw, prev_bev,
                                  prev_bev_exists, deterministic=True)

    def rollout_single(self, prev_feats, ref_to_history, future2ref_t,
                       ref2future_t, future_can_bus_sel):
        """One autoregressive step.

        prev_feats [bs, 1, N, C], ref_to_history [bs, 1, 4, 4].
        Returns (pred [layers, bs, N, C], new_ref_to_history).
        """
        tgt, aligned = self._align_future_coords(future2ref_t,
                                                 ref_to_history)
        pred = self.future_pred_head.predict_next(
            prev_feats, future_can_bus_sel, tgt, aligned,
            deterministic=True)
        return pred, ref2future_t[:, None]

    def decode_from_features(self, next_bev_feats, gt_points, gt_tindex,
                             cur2ref, ref2cur, num_future: int):
        """[frames, layers, bs, N, C] -> eval decode dict."""
        sigma = self.future_pred_head.forward_head(next_bev_feats)
        cur = self.pred_history_frame_num
        sigma_cur = sigma[:, -1, cur]
        return self.future_pred_head.decode_pointcloud(
            sigma_cur, gt_points, gt_tindex, cur2ref, ref2cur,
            num_rollout=num_future + 1)

    # -------------------------------------------------------------- forward

    def __call__(self, batch: ViDARBatch, *, train: bool = True,
                 gumbel_rng=None, train_frame_gate=None):
        """Full forward. Returns (losses, aux) in train mode or the decoded
        prediction dict in eval mode."""
        img_hw = batch.images.shape[3:5]
        t = batch.num_image_frames
        images = batch.images
        if train and self.use_grid_mask:
            # grid-mask only the current frame's cameras: the reference
            # extracts history features under model.eval() where GridMask is
            # a no-op (reference bevformer.py:161-173, grid_mask.py:91).
            bs, _, cams, h, w, c = images.shape
            cur = grid_mask(self.make_rng('aug'),
                            images[:, -1].reshape(bs * cams, h, w, c))
            images = images.at[:, -1].set(cur.reshape(bs, cams, h, w, c))
        if train:
            # Split the backbone: history frames carry no gradient (frozen
            # recurrence), so their activations must not be saved for the
            # backward pass — run them under stop_gradient in a separate
            # call from the current frame. The current (gradient) frame
            # runs camera-sequential (see extract_feats_cam_scan).
            hist = jax.tree.map(jax.lax.stop_gradient,
                                self.extract_feats(images[:, :-1]))
            cur_f = self.extract_feats_cam_scan(images[:, -1])
            feats = [jnp.concatenate([hf, cf], axis=0)
                     for hf, cf in zip(hist, cur_f)]
        else:
            feats = self.extract_feats(images)

        num_future = (self.future_pred_frame_num if train
                      else self.test_future_frame_num)

        if train:
            prev_bev = self.encode_history(feats, batch, img_hw,
                                           num_history=t - 1)
            cur_feats = [f[t - 1] for f in feats]
            ref_bev = self.pts_bbox_head(
                cur_feats, batch.can_bus[:, t - 1], batch.shift[:, t - 1],
                batch.rotate_angle[:, t - 1], batch.lidar2img[:, t - 1],
                img_hw, prev_bev, batch.prev_bev_exists[:, t - 1],
                deterministic=False)
        else:
            # test path: the full queue (incl. current) runs frozen
            prev_bev = self.encode_history(feats, batch, img_hw,
                                           num_history=t)
            ref_bev = prev_bev

        layers = self.decoder_num_layers
        ref_stack = jnp.broadcast_to(ref_bev[None],
                                     (layers,) + ref_bev.shape)
        if num_future > 0:
            preds = self.rollout(ref_bev, batch, num_future=num_future,
                                 train_frame_gate=train_frame_gate,
                                 deterministic=not train)
            next_bev_feats = jnp.concatenate([ref_stack[None], preds], axis=0)
        else:
            next_bev_feats = ref_stack[None]

        # [frames, layers, channels, bs, H*W, Z]
        sigma = self.future_pred_head.forward_head(next_bev_feats)

        if train:
            # frame 0 opens the queue so its own flag is always False and is
            # excluded (reference vidar.py:304-314 accumulates flags of frames
            # 1..T-1 only).
            full_prev = jnp.all(batch.prev_bev_exists[:, 1:])
            # channel-major, last decoder layer only:
            sigma_last = sigma[:, -1].transpose(1, 0, 2, 3, 4)
            losses = self.future_pred_head.loss(
                sigma_last, batch.gt_points, batch.gt_tindex,
                batch.cur2ref, batch.ref2cur,
                num_rollout=num_future + 1,
                full_prev_bev_exists=full_prev,
                rng=gumbel_rng)
            return losses, dict(ref_bev=ref_bev, sigma=sigma)

        cur = self.pred_history_frame_num
        sigma_cur = sigma[:, -1, cur]
        decode = self.future_pred_head.decode_pointcloud(
            sigma_cur, batch.gt_points, batch.gt_tindex,
            batch.cur2ref, batch.ref2cur, num_rollout=num_future + 1)
        decode['sigma'] = sigma_cur
        return decode
