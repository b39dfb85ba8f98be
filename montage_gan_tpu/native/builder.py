"""JIT builder for the native C++ runtime library.

The reference compiles its CUDA plugins at runtime with md5-digest source
caching and a FileBaton lock against concurrent builds
(reference: torch_utils/custom_ops.py:49-129).  Same contract here, for a
plain shared library built with g++: the compiled .so is cached under
``~/.cache/montage_gan_tpu/<name>-<digest>/`` and guarded by an fcntl lock.
On any failure the caller falls back to the pure-Python implementation
(mirroring the reference's ref-impl fallback, bias_act.py:52-66).
"""

from __future__ import annotations

import fcntl
import hashlib
import os
import subprocess
import sys
from typing import List, Optional

_verbosity = os.environ.get('MGT_NATIVE_VERBOSITY', 'brief')  # 'none'|'brief'|'full'


def _cache_dir() -> str:
    root = os.environ.get('MGT_NATIVE_CACHE',
                          os.path.join(os.path.expanduser('~'), '.cache',
                                       'montage_gan_tpu'))
    os.makedirs(root, exist_ok=True)
    return root


def build_library(name: str, sources: List[str],
                  extra_flags: Optional[List[str]] = None,
                  libs: Optional[List[str]] = None) -> str:
    """Compile ``sources`` into a cached shared library; returns the .so path.

    Raises on compile failure (callers catch and fall back)."""
    digest = hashlib.md5()
    for src in sources:
        with open(src, 'rb') as f:
            digest.update(f.read())
    digest.update(' '.join(extra_flags or []).encode())
    tag = digest.hexdigest()[:16]
    out_dir = os.path.join(_cache_dir(), f'{name}-{tag}')
    so_path = os.path.join(out_dir, f'{name}.so')
    if os.path.exists(so_path):
        return so_path

    os.makedirs(out_dir, exist_ok=True)
    lock_path = os.path.join(out_dir, 'lock')
    with open(lock_path, 'w') as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)  # concurrent-build guard
        if os.path.exists(so_path):
            return so_path
        cmd = (['g++', '-O3', '-march=native', '-shared', '-fPIC',
                '-std=c++17', '-pthread']
               + (extra_flags or []) + sources + ['-o', so_path + '.tmp']
               + [f'-l{l}' for l in (libs or [])])
        if _verbosity == 'full':
            print('Building native library:', ' '.join(cmd))
        elif _verbosity == 'brief':
            print(f'Building native library {name}... ', end='', flush=True,
                  file=sys.stderr)
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            if _verbosity == 'brief':
                print('Failed.', file=sys.stderr)
            raise RuntimeError(f'native build failed:\n{e.stderr}') from e
        os.replace(so_path + '.tmp', so_path)
        if _verbosity == 'brief':
            print('Done.', file=sys.stderr)
    return so_path


def get_loader_library() -> str:
    """Build (or fetch cached) the data-loader library."""
    src = os.path.join(os.path.dirname(__file__), 'mgt_loader.cpp')
    return build_library('mgt_loader', [src], libs=['png', 'z'])
