"""Query-based multi-object tracking core (jittable, fixed capacity).

Capability match for reference
UniAD/projects/mmdet3d_plugin/uniad/dense_heads/track_head_plugin/
(``Instances`` store: track_instance.py; ``RuntimeTrackerBase``: tracker.py;
``QueryInteractionModule`` + ``MemoryBank``: modules.py), re-designed for XLA:

* the reference's variable-length ``Instances`` list becomes a FIXED-capacity
  ``TrackInstances`` struct-of-arrays with an ``active`` mask — births fill
  free slots, deaths free them, shapes never change;
* the per-instance python update loop of ``RuntimeTrackerBase.update``
  becomes a vectorised mask computation;
* object ids are allocated with a cumulative-sum over the birth mask;
* every op broadcasts over arbitrary leading batch dims ``[..., cap, X]``
  so the same code serves the bs=1 streaming path and the sharded
  multi-sample training step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import flax.struct

from ..models.layers import TorchLinear


@flax.struct.dataclass
class TrackInstances:
    """Fixed-capacity instance store (struct of arrays, [..., cap, X])."""
    query: jnp.ndarray          # [..., cap, 2C] (pos + content, like DETR)
    ref_points: jnp.ndarray     # [..., cap, 3]
    obj_idxes: jnp.ndarray      # [..., cap] int32, -1 = unassigned slot
    scores: jnp.ndarray         # [..., cap]
    pred_boxes: jnp.ndarray     # [..., cap, 10] normalized code
    pred_logits: jnp.ndarray    # [..., cap, num_classes]
    disappear_time: jnp.ndarray  # [..., cap] int32
    next_obj_id: jnp.ndarray    # [...] int32
    memory: jnp.ndarray         # [..., cap, M, C] past content FIFO (M>=0)

    @staticmethod
    def empty(capacity: int, embed_dims: int, num_classes: int,
              query_init: jnp.ndarray, ref_init: jnp.ndarray,
              memory_len: int = 0, batch_shape: Tuple[int, ...] = ()):
        b = batch_shape

        def tile(x):
            return jnp.broadcast_to(x, b + x.shape)

        return TrackInstances(
            query=tile(query_init),
            ref_points=tile(ref_init),
            obj_idxes=jnp.full(b + (capacity,), -1, jnp.int32),
            scores=jnp.zeros(b + (capacity,)),
            pred_boxes=jnp.zeros(b + (capacity, 10)),
            pred_logits=jnp.zeros(b + (capacity, num_classes)),
            disappear_time=jnp.zeros(b + (capacity,), jnp.int32),
            next_obj_id=jnp.zeros(b, jnp.int32),
            memory=jnp.zeros(b + (capacity, memory_len, embed_dims)),
        )


class RuntimeTracker:
    """Score-thresholded track birth/death (reference tracker.py:6-41)."""

    def __init__(self, score_thresh: float = 0.4,
                 filter_score_thresh: float = 0.35,
                 miss_tolerance: int = 5):
        self.score_thresh = score_thresh
        self.filter_score_thresh = filter_score_thresh
        self.miss_tolerance = miss_tolerance

    def update(self, tr: TrackInstances) -> TrackInstances:
        confident = tr.scores >= self.score_thresh
        disappear = jnp.where(confident, 0, tr.disappear_time)

        # births: unassigned slots that became confident
        birth = (tr.obj_idxes == -1) & confident
        birth_rank = jnp.cumsum(birth.astype(jnp.int32), axis=-1) - 1
        new_ids = jnp.where(birth, tr.next_obj_id[..., None] + birth_rank,
                            tr.obj_idxes)

        # deaths: assigned slots below the filter threshold for too long
        weak = (tr.obj_idxes >= 0) & (tr.scores < self.filter_score_thresh)
        disappear = jnp.where(weak, disappear + 1, disappear)
        dead = disappear >= self.miss_tolerance
        ids = jnp.where(dead, -1, new_ids)

        return tr.replace(
            obj_idxes=ids,
            disappear_time=jnp.where(dead, 0, disappear),
            next_obj_id=tr.next_obj_id +
            birth.sum(axis=-1).astype(jnp.int32))


class QueryInteractionModule(nn.Module):
    """Track-query refresh between frames (reference modules.py QIM):
    active tracks' queries are updated from their current predictions via a
    gated MLP; dead slots are re-seeded from the learned init query."""
    embed_dims: int = 256
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, tr: TrackInstances, init_query: jnp.ndarray
                 ) -> TrackInstances:
        content = tr.query[..., self.embed_dims:]
        box_feat = TorchLinear(self.embed_dims, dtype=self.dtype,
                               name='box_proj')(tr.pred_boxes)
        h = nn.LayerNorm(name='ln_in')(content + box_feat)
        upd = TorchLinear(self.embed_dims, dtype=self.dtype, name='fc1')(h)
        upd = nn.relu(upd)
        upd = TorchLinear(self.embed_dims, dtype=self.dtype, name='fc2')(upd)
        gate = jax.nn.sigmoid(
            TorchLinear(self.embed_dims, dtype=self.dtype, name='gate')(h))
        new_content = nn.LayerNorm(name='ln_out')(
            content * (1 - gate) + upd * gate)

        active = (tr.obj_idxes >= 0)[..., None]
        content_out = jnp.where(active, new_content,
                                init_query[..., self.embed_dims:])
        pos_out = jnp.where(active, tr.query[..., :self.embed_dims],
                            init_query[..., :self.embed_dims])
        return tr.replace(
            query=jnp.concatenate([pos_out, content_out], axis=-1))


class MemoryBank(nn.Module):
    """Per-track temporal embedding memory (reference modules.py MemoryBank):
    a fixed-length FIFO of past content embeddings attended by the current
    query."""
    embed_dims: int = 256
    memory_len: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, content: jnp.ndarray, memory: jnp.ndarray,
                 active: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """content [..., cap, C], memory [..., cap, M, C]
        -> (fused, new_memory)."""
        q = content[..., None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=8, qkv_features=self.embed_dims, dtype=self.dtype,
            name='mem_attn')(q, memory, memory)
        fused = nn.LayerNorm(name='ln')(content + attn[..., 0, :])
        fused = jnp.where(active[..., None], fused, content)
        new_memory = jnp.concatenate(
            [memory[..., 1:, :], fused[..., None, :]], axis=-2)
        new_memory = jnp.where(active[..., None, None], new_memory, memory)
        return fused, new_memory
