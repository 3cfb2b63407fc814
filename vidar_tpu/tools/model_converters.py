"""Checkpoint publishing / conversion tools.

Capability match for reference tools/model_converters/publish_model.py
(strip optimizer state, stamp the filename with a content hash) plus a
torch->orbax converter so released reference checkpoints become native
checkpoints once.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import pickle


def publish_checkpoint(in_path: str, out_path: str) -> str:
    """Strip optimizer state from an orbax train-state checkpoint and stamp
    the output name with the content hash (reference publish_model.py)."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(os.path.abspath(in_path))
    state = ckptr.restore(os.path.abspath(in_path))
    params_only = state['params'] if 'params' in state else state
    tmp = out_path + '.tmp'
    ckptr.save(os.path.abspath(tmp), params_only, force=True)
    ckptr.wait_until_finished()

    # content hash over the serialized params
    h = hashlib.sha256()
    import numpy as np
    for leaf in jax.tree.leaves(params_only):
        h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    final = f'{out_path}-{digest}'
    os.rename(tmp, final)
    print(f'published {final}')
    return final


def torch_to_orbax(pth_path: str, config: str, out_path: str,
                   cfg_options=None) -> None:
    """Convert a reference .pth into a native orbax params checkpoint."""
    import jax
    import numpy as np
    from ..core.config import load_config, apply_overrides
    from ..core.checkpoint import import_torch_checkpoint, save_checkpoint
    from ..models import ViDAR
    from ..data import make_synthetic_batch

    cfg = apply_overrides(load_config(config), cfg_options)
    m = cfg['model']
    model = ViDAR(**m)
    batch = make_synthetic_batch(
        np.random.default_rng(0), bs=1,
        queue_length=m['history_queue_length'], future_length=1,
        num_cams=m['num_cams'], img_h=64, img_w=64, max_points=64)
    key = jax.random.PRNGKey(0)
    params = model.init({'params': key, 'dropout': key}, batch, train=False)
    params = import_torch_checkpoint(pth_path, params)
    save_checkpoint(out_path, params)
    print(f'wrote {out_path}')


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    pub = sub.add_parser('publish')
    pub.add_argument('in_path')
    pub.add_argument('out_path')
    conv = sub.add_parser('from-torch')
    conv.add_argument('pth_path')
    conv.add_argument('config')
    conv.add_argument('out_path')
    conv.add_argument('--cfg-options', nargs='+', default=None)
    args = p.parse_args()
    if args.cmd == 'publish':
        publish_checkpoint(args.in_path, args.out_path)
    else:
        torch_to_orbax(args.pth_path, args.config, args.out_path,
                       args.cfg_options)


if __name__ == '__main__':
    main()
