"""Build the native hostops shared library (cached by source hash).

Usage: ``python -m vidar_tpu.native.build`` or implicitly on first import of
``vidar_tpu.native`` (falls back to pure-numpy when no compiler/jpeg).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

_SRC = os.path.join(os.path.dirname(__file__), 'hostops.cpp')
_CACHE = os.path.join(os.path.expanduser('~'), '.cache', 'vidar_tpu')


def lib_path() -> str:
    with open(_SRC, 'rb') as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_CACHE, f'hostops-{h}.so')


def build(verbose: bool = False) -> str:
    """Compile hostops.cpp to a cached .so; returns its path."""
    out = lib_path()
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE, exist_ok=True)
    tmp = out + f'.tmp{os.getpid()}'
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           _SRC, '-ljpeg', '-o', tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise RuntimeError(f'hostops build failed: {e}') from e
    os.replace(tmp, out)
    return out


if __name__ == '__main__':
    print(build(verbose=True))
