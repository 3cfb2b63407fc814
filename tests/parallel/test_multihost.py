"""Multi-host (2-process) launch test on the CPU backend.

Capability match for the reference's multi-node path
(reference tools/multinode_train.sh:12-36): two processes rendezvous via
``jax.distributed.initialize`` (driven by the VIDAR_* env contract of
``vidar_tpu.parallel.multihost``), assemble a global batch from per-process
local slices, run one DP train step whose gradient reduction spans the
processes, and gather eval objects — asserting bit-identical results to the
single-process math.
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      '_mh_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step(tmp_path):
    port = _free_port()
    out = str(tmp_path / 'result')
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS='cpu',
                   VIDAR_REPO=REPO,
                   VIDAR_COORDINATOR=f'127.0.0.1:{port}',
                   VIDAR_NUM_PROCESSES='2',
                   VIDAR_PROCESS_ID=str(rank))
        # the worker pins its own device count; drop the conftest's 8-device
        # flag so local_device_count is the worker's choice
        env['XLA_FLAGS'] = env.get('XLA_FLAGS', '').replace(
            '--xla_force_host_platform_device_count=8', '').strip()
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, out], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, o) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f'rank {rank} failed:\n{o[-3000:]}'
        assert f'MH_OK {rank}' in o, o[-2000:]

    results = []
    for rank in range(2):
        with open(out + f'.rank{rank}') as f:
            results.append(json.load(f))
    # both ranks converge to the identical post-step parameters
    assert results[0]['w'] == results[1]['w']
    assert results[0]['loss'] == results[1]['loss']
