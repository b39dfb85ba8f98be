"""Pad → zero-upsample → FIR filter → downsample, fused.

Same op contract as the reference's upfirdn2d
(reference: torch_utils/ops/upfirdn2d.py:132-171 documents the semantics; the
CUDA kernel upfirdn2d.cu implements 86 tiled specializations of it).

TPU-first design: the whole pipeline lowers to a single
``lax.conv_general_dilated`` call — ``lhs_dilation`` performs the zero
upsampling, the padding config performs the (possibly negative = cropping)
padding, ``window_strides`` performs the downsampling, and the depthwise FIR
filter is the conv kernel.  XLA/Mosaic tiles this onto the VPU directly; there
is no need for the reference's hand-scheduled shared-memory tiles.  Gradients
of arbitrary order come from JAX AD (the reference encodes the 1st-order
gradient as "another upfirdn2d with swapped up/down",
torch_utils/ops/upfirdn2d.py:262-281 — XLA derives the same transpose).

Layout: NHWC (``[N, H, W, C]``), unlike the NCHW reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import numpy as np
from jax import lax

IntOrPair = Union[int, Sequence[int]]


def _impl() -> str:
    """'xla' (default) or 'pallas' — from MGT_UPFIRDN_IMPL.

    'pallas' engages only on a TPU backend (on CPU the kernel would need
    interpret mode); 'pallas_force' engages unconditionally (tests wrap
    calls in ``force_tpu_interpret_mode``)."""
    import os
    impl = os.environ.get('MGT_UPFIRDN_IMPL', 'xla')
    if impl == 'pallas' and jax.default_backend() != 'tpu':
        return 'xla'
    if impl == 'pallas_force':
        return 'pallas'
    return impl


def _parse_scaling(scaling: IntOrPair) -> Tuple[int, int]:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding: IntOrPair) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def _depthwise_fir(x: jax.Array,
                   f: np.ndarray,
                   up: Tuple[int, int],
                   down: Tuple[int, int],
                   pad: Tuple[int, int, int, int],
                   gain: float,
                   flip_filter: bool) -> jax.Array:
    """One fused dilated/strided depthwise conv implementing the 2-D op."""
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = pad
    num_channels = x.shape[-1]

    f = np.asarray(f, dtype=np.float32) * (gain ** (f.ndim / 2))
    assert f.ndim == 2
    if not flip_filter:
        f = f[::-1, ::-1]
    # Depthwise kernel: HWIO with I=1, feature_group_count=C.
    kernel = np.tile(f[:, :, None, None], (1, 1, 1, num_channels))

    # lhs_dilation gives size (H-1)*up + 1; the reference's zero-upsample gives
    # H*up (trailing zeros), so fold the missing up-1 zeros into the hi pad.
    return lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(downy, downx),
        padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=num_channels,
        precision=lax.Precision.HIGHEST,
    )


def upfirdn2d(x: jax.Array,
              f: Union[np.ndarray, None],
              up: IntOrPair = 1,
              down: IntOrPair = 1,
              padding: IntOrPair = 0,
              flip_filter: bool = False,
              gain: float = 1.0) -> jax.Array:
    """Upsample, FIR-filter, and downsample a batch of NHWC images.

    Args:
        x: ``[N, H, W, C]`` input.
        f: float32 FIR filter ``[fh, fw]`` (non-separable), ``[taps]``
           (separable), or None (identity).  Must be a concrete
           (numpy) compile-time constant, as produced by ``setup_filter``.
        up / down: integer or ``[x, y]`` scaling factors.
        padding: int, ``[x, y]``, or ``[x0, x1, y0, y1]`` w.r.t. the upsampled
           image; negative values crop.
        flip_filter: False = convolution, True = correlation.
        gain: overall magnitude scaling.
    """
    assert x.ndim == 4
    if f is None:
        f = np.ones([1, 1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)

    # dual-implementation switch (the reference's impl='cuda'|'ref' pattern,
    # torch_utils/ops/upfirdn2d.py:174-176): MGT_UPFIRDN_IMPL=pallas routes
    # separable filters through the hand-written Pallas kernel
    if f.ndim == 1 and _impl() == 'pallas':
        from .pallas.upfirdn2d_kernel import upfirdn2d_pallas
        return upfirdn2d_pallas(x, f, up=up, down=down, padding=padding,
                                flip_filter=flip_filter, gain=gain)
    return _upfirdn2d_xla(x, f, up=up, down=down, padding=padding,
                          flip_filter=flip_filter, gain=gain)


def _upfirdn2d_xla(x: jax.Array, f, up: IntOrPair = 1, down: IntOrPair = 1,
                   padding: IntOrPair = 0, flip_filter: bool = False,
                   gain: float = 1.0) -> jax.Array:
    """The XLA-composed implementation, bypassing the impl dispatch (used
    directly by the Pallas kernel's transpose VJP)."""
    if f is None:
        f = np.ones([1, 1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[np.newaxis, np.newaxis]
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f.ndim == 2:
        return _depthwise_fir(x, f, (upx, upy), (downx, downy),
                              (padx0, padx1, pady0, pady1), gain, flip_filter)

    # Separable: two 1-D passes, sqrt(gain) each
    # (matches reference torch_utils/ops/upfirdn2d.py:254-257).
    g = float(np.sqrt(gain))
    fx = f[np.newaxis, :]  # [1, taps] — filters along W
    fy = f[:, np.newaxis]  # [taps, 1] — filters along H
    x = _depthwise_fir(x, fx, (upx, 1), (downx, 1),
                       (padx0, padx1, 0, 0), g, flip_filter)
    x = _depthwise_fir(x, fy, (1, upy), (1, downy),
                       (0, 0, pady0, pady1), g, flip_filter)
    return x


def filter2d(x: jax.Array, f, padding: IntOrPair = 0,
             flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Filter without resampling, keeping spatial size
    (reference contract: torch_utils/ops/upfirdn2d.py:290-321)."""
    fh, fw = _filter_size(f)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = [padx0 + fw // 2, padx1 + (fw - 1) // 2,
         pady0 + fh // 2, pady1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x: jax.Array, f, up: IntOrPair = 2, padding: IntOrPair = 0,
               flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Upsample with the given filter
    (reference contract: torch_utils/ops/upfirdn2d.py:327-361)."""
    upx, upy = _parse_scaling(up)
    fh, fw = _filter_size(f)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = [padx0 + (fw + upx - 1) // 2, padx1 + (fw - upx) // 2,
         pady0 + (fh + upy - 1) // 2, pady1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x: jax.Array, f, down: IntOrPair = 2, padding: IntOrPair = 0,
                 flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """Downsample with the given filter
    (reference contract: torch_utils/ops/upfirdn2d.py:367-401)."""
    downx, downy = _parse_scaling(down)
    fh, fw = _filter_size(f)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    p = [padx0 + (fw - downx + 1) // 2, padx1 + (fw - downx) // 2,
         pady0 + (fh - downy + 1) // 2, pady1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def _filter_size(f) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[0]), int(f.shape[1])
