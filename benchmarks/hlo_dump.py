"""Dump the optimized TPU HLO of a production phase and attribute the
long-tail XLA fusions (the ~143 ms/frame of non-Pallas encode time in the
round-4 trace) to source lines.

Usage: python benchmarks/hlo_dump.py [encode|rollout] [fusion.33 ...]
Writes the full text to /tmp/<phase>_hlo.txt and prints, for each named
fusion (default: the biggest trace offenders), its root op, shapes and
source metadata.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402  (trace_profile.build needs it)
from benchmarks.trace_profile import build  # noqa: E402


def main():
    import jax.numpy as jnp
    phase = sys.argv[1] if len(sys.argv) > 1 else 'encode'
    want = sys.argv[2:]
    runner, batch, model = build()
    p = runner.params
    bs, t, cams, h, w, _ = batch.images.shape
    imgs = batch.images.reshape(bs * t * cams, h, w, 3)
    feats_all = runner._backbone(p, imgs)
    feats_all = [x.reshape((bs, t, cams) + x.shape[1:]) for x in feats_all]
    prev_bev = jnp.zeros(
        (bs, model.bev_h * model.bev_w, model.embed_dims), jnp.float32)
    feats0 = [x[:, 0] for x in feats_all]
    if phase == 'encode':
        fn = runner._encode
        args = (p, feats0, batch.can_bus[:, 0], batch.shift[:, 0],
                batch.rotate_angle[:, 0], batch.lidar2img[:, 0], prev_bev,
                batch.prev_bev_exists[:, 0])
    else:
        hq = model.history_queue_length
        prev_feats = prev_bev[:, None]
        ref2hist = batch.ref2cur[:, hq][:, None]
        fn = runner._rollout
        args = (p, prev_feats, ref2hist, batch.future2ref[:, 1],
                batch.ref2future[:, 1],
                batch.future_can_bus[:, 1][:, runner.can_bus_dims])

    compiled = fn.lower(*args).compile()
    texts = [m.to_string() for m in compiled.runtime_executable().hlo_modules()] \
        if hasattr(compiled, 'runtime_executable') else None
    if texts is None:
        texts = [compiled.as_text()]
    text = '\n'.join(texts)
    out = f'/tmp/{phase}_hlo.txt'
    with open(out, 'w') as f:
        f.write(text)
    print(f'wrote {len(text)} bytes to {out}', flush=True)

    if not want:
        want = ['fusion.33', 'fusion.25', 'copy.1714', 'fusion.46',
                'fusion.648', 'fusion.51', 'fusion.59',
                'maximum_convert_fusion', 'slice_select_fusion.3']
    # print the fusion definition headers + a few body lines with metadata
    lines = text.splitlines()
    for name in want:
        pat = re.compile(r'^\s*%?' + re.escape(name) + r'\s*=')
        callee = None
        for i, ln in enumerate(lines):
            if pat.search(ln):
                print('=' * 80)
                print(ln.strip()[:400])
                m = re.search(r'calls=([%\w.\-]+)', ln)
                if m:
                    callee = m.group(1).lstrip('%')
                break
        if callee:
            cpat = re.compile(r'^\s*%?' + re.escape(callee) + r'\s*[({]')
            for i, ln in enumerate(lines):
                if cpat.search(ln):
                    j = i
                    while j < min(i + 40, len(lines)):
                        print(lines[j][:240])
                        if lines[j].strip().startswith('ROOT'):
                            break
                        j += 1
                    break


if __name__ == '__main__':
    main()
