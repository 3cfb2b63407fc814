"""UniAD end-to-end smoke: encoder + track + deepened task heads."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.uniad import UniAD
from vidar_tpu.data import make_synthetic_batch


def test_uniad_forward_smoke():
    model = UniAD(embed_dims=32, bev_h=8, bev_w=8, num_cams=3,
                  num_query=16, num_seg_query=12, backbone_depth=50,
                  predict_steps=4, predict_modes=2, occ_n_future=1,
                  latent_render_lids=(1,),
                  latent_render_cfg=dict(embed_dims=32, pred_height=4,
                                         grid_num=8, grid_step=0.5,
                                         reduction=8, act='sigmoid',
                                         num_pred_fcs=0))

    rng = np.random.default_rng(0)
    batch = make_synthetic_batch(rng, bs=1, queue_length=1, future_length=1,
                                 num_cams=3, img_h=64, img_w=64,
                                 max_points=32)
    prev_bev = jnp.zeros((1, 64, 32))
    has_prev = jnp.zeros((1,), bool)
    command = jnp.zeros((1,), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), batch, None, prev_bev,
                        has_prev, command)
    out = model.apply(params, batch, None, prev_bev, has_prev, command)

    assert out['bev'].shape == (1, 64, 32)
    assert out['det']['all_cls_scores'].shape[-2] == 16
    # seg: [L, B, Q, 3] cls + [L, B, Q, 4] boxes
    assert out['seg']['outputs_classes'].shape[-2:] == (12, 3)
    assert out['seg']['outputs_coords'].shape[-1] == 4
    # motion: [L, B, A+1, P, T, 5] (agents + SDC)
    assert out['motion']['all_traj_preds'].shape[2:] == (17, 2, 4, 5)
    # occ: [B, A, T_blocks, H, W]
    assert out['occ']['ins_occ_logits'].shape == (1, 16, 2, 8, 8)
    # plan: [B, steps, 2]
    assert out['plan']['sdc_traj'].shape == (1, 6, 2)
    assert np.isfinite(np.asarray(out['plan']['sdc_traj'])).all()
    assert np.isfinite(np.asarray(
        out['motion']['all_traj_preds'])).all()
