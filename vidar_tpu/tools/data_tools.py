"""Dataset pkl tools (the reference's tools/*.py data utilities).

Capability matches:
  * merge_fullset_pkl       <- tools/merge_nusc_fullset_pkl.py:1-14
  * collect_nuplan_data     <- tools/collect_nuplan_data.py:1-28
  * convert_submission_pkl  <- tools/convert_nuplan_submission_pkl.py:1-48
  * validate_submission     <- tools/validate_hf_submission.py:48-68
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
from typing import List


def merge_fullset_pkl(train_pkl: str, test_pkl: str, out_pkl: str) -> None:
    """Merge train+test info pkls for fullset pretraining."""
    with open(train_pkl, 'rb') as f:
        train = pickle.load(f)
    with open(test_pkl, 'rb') as f:
        test = pickle.load(f)
    infos = list(train['infos']) + list(test['infos'])
    infos = sorted(infos, key=lambda e: e['timestamp'])
    out = dict(infos=infos, metadata=train.get('metadata'))
    with open(out_pkl, 'wb') as f:
        pickle.dump(out, f)
    print(f'merged {len(train["infos"])} + {len(test["infos"])} -> '
          f'{len(infos)} infos at {out_pkl}')


def collect_nuplan_data(pkl_dir: str, out_dir: str,
                        train_ratio: float = 0.85) -> None:
    """Merge per-log OpenScene pkls and split train/val by log."""
    files = sorted(glob.glob(os.path.join(pkl_dir, '*.pkl')))
    split = int(len(files) * train_ratio)
    os.makedirs(out_dir, exist_ok=True)
    for name, group in (('train', files[:split]), ('val', files[split:])):
        infos: List = []
        for p in group:
            with open(p, 'rb') as f:
                data = pickle.load(f)
            infos.extend(data['infos'] if isinstance(data, dict) else data)
        out = os.path.join(out_dir, f'nuplan_infos_{name}.pkl')
        with open(out, 'wb') as f:
            pickle.dump(dict(infos=infos), f)
        print(f'{name}: {len(group)} logs, {len(infos)} infos -> {out}')


def convert_submission_pkl(depth_dir: str, meta_pkl: str, out_pkl: str
                           ) -> None:
    """Pack per-frame depth txt dumps into a challenge submission pkl."""
    import numpy as np
    with open(meta_pkl, 'rb') as f:
        meta = pickle.load(f)
    results = {}
    for token in meta['tokens'] if 'tokens' in meta else []:
        frames = []
        for fidx in range(1, 7):
            path = os.path.join(depth_dir, f'{token}_{fidx}.txt')
            with open(path) as fh:
                frames.append(np.asarray([float(x) for x in fh], np.float32))
        results[token] = frames
    with open(out_pkl, 'wb') as f:
        pickle.dump(results, f)
    print(f'packed {len(results)} samples -> {out_pkl}')


def validate_submission(submission_pkl: str, meta_pkl: str) -> bool:
    """Shape/count contract checks against the private-test meta."""
    with open(submission_pkl, 'rb') as f:
        sub = pickle.load(f)
    with open(meta_pkl, 'rb') as f:
        meta = pickle.load(f)
    ok = True
    expected = meta.get('counts', {})
    for token, frames in sub.items():
        if len(frames) != 6:
            print(f'{token}: expected 6 future frames, got {len(frames)}')
            ok = False
        if token in expected:
            for i, fr in enumerate(frames):
                if len(fr) != expected[token][i]:
                    print(f'{token} frame {i}: count mismatch '
                          f'{len(fr)} vs {expected[token][i]}')
                    ok = False
    print('submission valid' if ok else 'submission INVALID')
    return ok


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='cmd', required=True)
    m = sub.add_parser('merge-fullset')
    m.add_argument('train_pkl')
    m.add_argument('test_pkl')
    m.add_argument('out_pkl')
    c = sub.add_parser('collect-nuplan')
    c.add_argument('pkl_dir')
    c.add_argument('out_dir')
    c.add_argument('--train-ratio', type=float, default=0.85)
    s = sub.add_parser('convert-submission')
    s.add_argument('depth_dir')
    s.add_argument('meta_pkl')
    s.add_argument('out_pkl')
    v = sub.add_parser('validate-submission')
    v.add_argument('submission_pkl')
    v.add_argument('meta_pkl')
    args = p.parse_args()
    if args.cmd == 'merge-fullset':
        merge_fullset_pkl(args.train_pkl, args.test_pkl, args.out_pkl)
    elif args.cmd == 'collect-nuplan':
        collect_nuplan_data(args.pkl_dir, args.out_dir, args.train_ratio)
    elif args.cmd == 'convert-submission':
        convert_submission_pkl(args.depth_dir, args.meta_pkl, args.out_pkl)
    elif args.cmd == 'validate-submission':
        validate_submission(args.submission_pkl, args.meta_pkl)


if __name__ == '__main__':
    main()
