"""Native threaded batch loader (ctypes wrapper + Python fallback).

The reference overlaps data loading with compute via torch DataLoader worker
processes (reference: custom/training_loop_aio.py:240-244).  Here the decode
path is a C++ thread pool (native/mgt_loader.cpp): Python submits batches of
item indices (keeping the InfiniteSampler determinism), workers decode the
layer PNGs and assemble ``[B, L, H, W, C]`` float [0,1] buffers, and
``collect()`` returns them FIFO — so the next batch decodes while the TPU
runs the current step.

Mirrors the reference's dual-impl pattern (bias_act.py:52-66): if the native
build is unavailable the same API runs on a pure-Python/PIL path.
"""

from __future__ import annotations

import ctypes
import os
import warnings
from typing import List, Optional, Sequence

import numpy as np

_lib = None
_lib_failed = False


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from ..native.builder import get_loader_library
        lib = ctypes.CDLL(get_loader_library())
        lib.mgt_loader_create.restype = ctypes.c_void_p
        lib.mgt_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.mgt_loader_submit.restype = ctypes.c_int
        lib.mgt_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
        lib.mgt_loader_collect.restype = ctypes.c_int
        lib.mgt_loader_collect.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_float)]
        lib.mgt_loader_last_error.restype = ctypes.c_char_p
        lib.mgt_loader_last_error.argtypes = [ctypes.c_void_p]
        lib.mgt_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        warnings.warn(f'native loader unavailable, using Python decode '
                      f'fallback: {e}')
        _lib_failed = True
    return _lib


class NativeBatchLoader:
    """Decode-and-assemble loader over per-item PNG path lists.

    Args:
        item_paths: list of items, each a list of ``images_per_item`` PNG
            paths (the sorted layer files of one sample).
        height/width/channels: required geometry (asserted at decode).
        num_threads: C++ worker threads.
        force_python: skip the native path (tests / parity checks).
    """

    def __init__(self, item_paths: Sequence[Sequence[str]], height: int,
                 width: int, channels: int = 4, num_threads: int = 0,
                 force_python: bool = False):
        self.item_paths = [list(p) for p in item_paths]
        self.ipi = len(self.item_paths[0])
        assert all(len(p) == self.ipi for p in self.item_paths)
        self.h, self.w, self.c = height, width, channels
        self._handle = None
        self._inflight = 0
        lib = None if force_python else _get_lib()
        if lib is not None:
            flat = [p.encode() for item in self.item_paths for p in item]
            arr = (ctypes.c_char_p * len(flat))(*flat)
            handle = lib.mgt_loader_create(arr, len(flat), self.ipi,
                                           height, width, channels,
                                           num_threads)
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lib = lib
        self._py_queue: List[np.ndarray] = []

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def __len__(self) -> int:
        return len(self.item_paths)

    # ------------------------------------------------------------------

    def submit(self, indices: Sequence[int],
               flips: Optional[Sequence[bool]] = None) -> None:
        indices = np.asarray(indices, np.int64)
        flips_arr = (np.asarray(flips, np.uint8) if flips is not None
                     else np.zeros(len(indices), np.uint8))
        if self._handle is not None:
            rc = self._lib.mgt_loader_submit(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                len(indices))
            if rc != 0:
                raise RuntimeError(self._last_error())
            self._inflight += 1
        else:
            self._py_queue.append(self._decode_python(indices, flips_arr))

    def collect(self, batch: int) -> np.ndarray:
        """Returns [batch, images_per_item, H, W, C] float32 in [0, 1]."""
        if self._handle is not None:
            out = np.empty((batch, self.ipi, self.h, self.w, self.c),
                           np.float32)
            rc = self._lib.mgt_loader_collect(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise RuntimeError(self._last_error())
            self._inflight -= 1
            return out
        return self._py_queue.pop(0)

    def next_batch(self, indices, flips=None) -> np.ndarray:
        self.submit(indices, flips)
        return self.collect(len(indices))

    # ------------------------------------------------------------------

    def _decode_python(self, indices, flips) -> np.ndarray:
        from PIL import Image
        out = np.empty((len(indices), self.ipi, self.h, self.w, self.c),
                       np.float32)
        mode = {4: 'RGBA', 3: 'RGB', 1: 'L'}[self.c]
        for b, (idx, fl) in enumerate(zip(indices, flips)):
            for j, path in enumerate(self.item_paths[int(idx)]):
                img = np.asarray(Image.open(path).convert(mode), np.uint8)
                if img.ndim == 2:
                    img = img[:, :, None]
                assert img.shape == (self.h, self.w, self.c), \
                    f'{path}: size mismatch {img.shape}'
                if fl:
                    img = img[:, ::-1]
                out[b, j] = img.astype(np.float32) / 255.0
        return out

    def _last_error(self) -> str:
        return self._lib.mgt_loader_last_error(self._handle).decode()

    def close(self):
        if self._handle is not None:
            self._lib.mgt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
