"""BEVFormer detector (fine-tune / detection model family).

Capability match for reference
projects/mmdet3d_plugin/bevformer/detectors/bevformer.py: frozen history BEV
recurrence with an optional gradient window over the last
``backwarded_prev_frame_num`` frames (:191-232, the fine-tune configs use 1),
DETR detection head on the current BEV, and the streaming ``forward_test``
cache contract (prev_bev + can-bus delta rebasing, :291-324) — here the
stream state is an explicit ``StreamState`` the caller threads through.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from .resnet import ResNet
from .fpn import FPN
from .grid_mask import grid_mask
from .transformer import BEVEncoderHead
from .detection import BEVFormerHead
from ..data.structures import ViDARBatch


@flax.struct.dataclass
class StreamState:
    """Streaming-eval cache (reference prev_frame_info, bevformer.py:60-66)."""
    prev_bev: jnp.ndarray     # [bs, H*W, C]
    has_prev: jnp.ndarray     # [bs] bool


class BEVFormer(nn.Module):
    embed_dims: int = 256
    bev_h: int = 200
    bev_w: int = 200
    pc_range: Sequence[float] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    num_cams: int = 6
    num_classes: int = 10
    num_query: int = 900
    backbone_depth: int = 101
    backbone_dcn: Tuple[bool, ...] = (False, False, True, True)
    frozen_stages: int = 1
    use_grid_mask: bool = True
    backwarded_prev_frame_num: int = 0
    encoder_num_layers: int = 6
    latent_render_lids: Tuple[int, ...] = (2,)
    latent_render_cfg: Optional[dict] = None
    sca_capacity_ratio: float = 0.5
    dtype: jnp.dtype | None = None

    def setup(self):
        self.img_backbone = ResNet(
            depth=self.backbone_depth, out_indices=(1, 2, 3),
            frozen_stages=self.frozen_stages,
            stage_with_dcn=self.backbone_dcn,
            dtype=self.dtype, name='img_backbone')
        self.img_neck = FPN(out_channels=self.embed_dims, num_outs=4,
                            dtype=self.dtype, name='img_neck')
        self.bev_head = BEVEncoderHead(
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, num_cams=self.num_cams,
            latent_render_lids=self.latent_render_lids,
            latent_render_cfg=self.latent_render_cfg,
            encoder_num_layers=self.encoder_num_layers,
            sca_capacity_ratio=self.sca_capacity_ratio,
            dtype=self.dtype, name='pts_bbox_head_bev')
        self.det_head = BEVFormerHead(
            num_classes=self.num_classes, num_query=self.num_query,
            embed_dims=self.embed_dims, bev_h=self.bev_h, bev_w=self.bev_w,
            pc_range=self.pc_range, dtype=self.dtype,
            name='pts_bbox_head_det')

    def extract_feats(self, images):
        bs, t, cams, h, w, _ = images.shape
        x = images.reshape(bs * t * cams, h, w, 3)
        feats = self.img_neck(self.img_backbone(x))
        out = []
        for f in feats:
            _, fh, fw, c = f.shape
            out.append(f.reshape(bs, t, cams, fh, fw, c).transpose(
                1, 0, 2, 3, 4, 5))
        return out

    def _encode_frame(self, feats_t, batch, t_idx, prev_bev, exists, img_hw,
                      deterministic):
        return self.bev_head(
            feats_t, batch.can_bus[:, t_idx], batch.shift[:, t_idx],
            batch.rotate_angle[:, t_idx], batch.lidar2img[:, t_idx],
            img_hw, prev_bev, exists, deterministic=deterministic)

    def obtain_history_bev(self, feats, batch: ViDARBatch, img_hw,
                           *, num_prev: int, train: bool):
        """Frozen recurrence + optional gradient window (static unroll —
        the fine-tune history is <= 3 frames).

        Reference semantics (bevformer.py:158-232): ALL history backbone
        features are no-grad (even the backwarded frames' features run
        under torch.no_grad); the backwarded window only backprops through
        the BEV head, which runs in train mode (dropout active)."""
        bs = batch.images.shape[0]
        back_n = self.backwarded_prev_frame_num if train else 0
        prev_bev = jnp.zeros((bs, self.bev_h * self.bev_w, self.embed_dims),
                             feats[0].dtype)
        for t in range(num_prev):
            frame_feats = [jax.lax.stop_gradient(f[t]) for f in feats]
            frozen = t < num_prev - back_n
            bev = self._encode_frame(frame_feats, batch, t, prev_bev,
                                     batch.prev_bev_exists[:, t], img_hw,
                                     deterministic=frozen or not train)
            prev_bev = jax.lax.stop_gradient(bev) if frozen else bev
        return prev_bev

    def __call__(self, batch: ViDARBatch, *, train: bool = True):
        """Returns (det_preds, bev) — call ``.loss`` / ``.get_bboxes`` on the
        det head output."""
        img_hw = batch.images.shape[3:5]
        t = batch.num_image_frames
        images = batch.images
        if train and self.use_grid_mask:
            # grid-mask only the current frame: history feature extraction
            # runs under model.eval() in the reference, where GridMask is a
            # no-op (reference bevformer.py:161-173, grid_mask.py:91)
            bs, _, cams, h, w, c = images.shape
            cur = grid_mask(self.make_rng('aug'),
                            images[:, -1].reshape(bs * cams, h, w, c))
            images = images.at[:, -1].set(cur.reshape(bs, cams, h, w, c))
        if train:
            # split the backbone call: history frames carry no gradients,
            # so keep their activations out of the backward residuals
            hist = jax.tree.map(jax.lax.stop_gradient,
                                self.extract_feats(images[:, :-1]))
            cur_f = self.extract_feats(images[:, -1:])
            feats = [jnp.concatenate([hf, cf], axis=0)
                     for hf, cf in zip(hist, cur_f)]
        else:
            feats = self.extract_feats(images)

        prev_bev = self.obtain_history_bev(feats, batch, img_hw,
                                           num_prev=t - 1, train=train)
        cur_feats = [f[t - 1] for f in feats]
        bev = self._encode_frame(cur_feats, batch, t - 1, prev_bev,
                                 batch.prev_bev_exists[:, t - 1], img_hw,
                                 deterministic=not train)
        preds = self.det_head(bev, deterministic=not train)
        return preds

    def loss(self, preds, gt_bboxes, gt_labels, num_valid_gt):
        return self.det_head.loss(preds, gt_bboxes, gt_labels, num_valid_gt)

    def get_bboxes(self, preds):
        return self.det_head.get_bboxes(preds)

    def streaming_test(self, batch: ViDARBatch, state: StreamState):
        """Single-frame streaming eval (video_test_mode)."""
        img_hw = batch.images.shape[3:5]
        feats = self.extract_feats(batch.images[:, -1:])
        cur_feats = [f[0] for f in feats]
        bev = self._encode_frame(cur_feats, batch, batch.num_image_frames - 1,
                                 state.prev_bev, state.has_prev, img_hw,
                                 deterministic=True)
        preds = self.det_head(bev, deterministic=True)
        new_state = StreamState(prev_bev=bev,
                                has_prev=jnp.ones_like(state.has_prev))
        return preds, new_state


class BEVFormerFP16(BEVFormer):
    """Half-precision BEVFormer (reference detectors/bevformer_fp16.py:23 —
    a torch AMP fp16 variant). On TPU the native half type is bfloat16:
    this subclass defaults the compute dtype to bf16 (fp32 islands inside
    point_sampling/losses are preserved by the modules themselves)."""
    dtype: jnp.dtype | None = jnp.bfloat16
