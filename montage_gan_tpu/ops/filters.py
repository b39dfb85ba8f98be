"""FIR filter preparation for the resampling ops.

Same contract as the reference's upfirdn2d.setup_filter
(reference: torch_utils/ops/upfirdn2d.py:83-127): accepts a 2-D filter, a 1-D
separable tap list, a scalar impulse, or None (identity); normalizes to unit DC
gain; optionally flips; scales by gain**(ndim/2).  Returns a float32 numpy
array — filters are compile-time constants baked into the jitted program,
which is the TPU-idiomatic replacement for the reference's device buffers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

FilterArg = Union[None, float, Sequence[float], np.ndarray]


def setup_filter(f: FilterArg,
                 normalize: bool = True,
                 flip_filter: bool = False,
                 gain: float = 1.0,
                 separable: Optional[bool] = None) -> np.ndarray:
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2)
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = (f.ndim == 1 and f.size >= 8)
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def default_resample_filter() -> np.ndarray:
    """The [1, 3, 3, 1] binomial filter used throughout StyleGAN2."""
    return setup_filter([1, 3, 3, 1])
