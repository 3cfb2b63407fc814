"""Video-replay training runner (EpochBasedRunner_video equivalent).

Capability match for reference
bevformer/runner/epoch_based_runner.py:18-97 + hooks/custom_hooks.py:5-13
(``TransferWeight``): a frozen copy of the model replays the sample's history
queue to produce ``prev_bev``, then ONE gradient step trains on the final
frame only. Registered-but-unused by the released configs; provided for API
completeness.

JAX formulation: the "eval model" is simply the current (or EMA) params used
under ``stop_gradient``; TransferWeight (copying train weights into the eval
model each iter) is the identity here unless an EMA state is threaded in.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def make_video_train_step(model, tx) -> Callable:
    """Train step that replays history with frozen params.

    fn(state, batch, rng, eval_params=None): eval_params defaults to
    state.params (TransferWeight semantics).
    """

    def step_fn(state, batch, rng, eval_params=None):
        ep = eval_params if eval_params is not None else state.params
        img_hw = batch.images.shape[3:5]
        t = batch.num_image_frames

        # replay queue through the frozen model
        feats = model.apply(ep, batch.images, method=model.extract_feats)
        prev_bev = model.apply(
            ep, feats, batch, img_hw, num_history=t - 1,
            method=model.encode_history)
        prev_bev = jax.lax.stop_gradient(prev_bev)

        def loss_fn(params):
            drop_rng, gumbel_rng, aug_rng = jax.random.split(rng, 3)
            cur_feats_all = model.apply(
                params, batch.images[:, -1:], method=model.extract_feats,
                rngs={'aug': aug_rng})
            cur_feats = [f[0] for f in cur_feats_all]
            ref_bev = model.apply(
                params, cur_feats, batch.can_bus[:, t - 1],
                batch.shift[:, t - 1], batch.rotate_angle[:, t - 1],
                batch.lidar2img[:, t - 1], prev_bev,
                batch.prev_bev_exists[:, t - 1], img_hw,
                method=model.encode_single)
            # single-frame supervision: current-frame channel only
            layers = model.decoder_num_layers
            stack = jnp.broadcast_to(ref_bev[None],
                                     (layers,) + ref_bev.shape)[None]
            sigma = model.apply(params, stack,
                                method=lambda m, s: m.future_pred_head.
                                forward_head(s))
            cur = model.pred_history_frame_num
            sigma_last = sigma[:, -1].transpose(1, 0, 2, 3, 4)
            losses = model.apply(
                params, sigma_last, batch.gt_points, batch.gt_tindex,
                batch.cur2ref, batch.ref2cur,
                method=lambda m, *a: m.future_pred_head.loss(
                    *a, num_rollout=1,
                    full_prev_bev_exists=jnp.all(
                        batch.prev_bev_exists[:, 1:]),
                    rng=gumbel_rng))
            return sum(jax.tree.leaves(losses)), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics['loss'] = total
        return new_state, metrics

    return jax.jit(step_fn)
