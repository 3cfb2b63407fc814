"""UniAD end-to-end smoke: encoder + track + task heads on tiny shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from vidar_tpu.uniad import UniAD
from vidar_tpu.data import make_synthetic_batch


def test_uniad_forward_smoke():
    model = UniAD(embed_dims=32, bev_h=8, bev_w=8, num_cams=3,
                  num_query=16, backbone_depth=50,
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
    assert out['seg']['seg_logits'].shape == (1, 8, 8, 4)
    assert out['motion']['trajs'].shape[1] == 16  # agents = track capacity
    assert out['plan']['ego_traj'].shape == (1, 6, 2)
    assert np.isfinite(np.asarray(out['plan']['ego_traj'])).all()
