"""2-D convolution with optional FIR up/downsampling.

Same op contract as the reference's conv2d_resample
(reference: torch_utils/ops/conv2d_resample.py:62-160): padding is specified
once w.r.t. the upsampled image; the op composes
``downsample ∘ FIR ∘ conv(w) ∘ pad ∘ zero-upsample`` with the documented
padding adjustments.

TPU-first design (NHWC / HWIO):
  * up-path: the zero-insert upsample + dense conv collapse into one
    ``lax.conv_general_dilated`` with ``lhs_dilation`` (XLA's native
    transposed-conv form, MXU-friendly), followed by the depthwise FIR.
  * down-path: depthwise FIR first, then a strided dense conv.
  * plain path: one conv with (possibly asymmetric/negative) padding — lax
    supports this directly, so no pad/crop juggling is needed.
Arbitrary-order gradients come from JAX AD; the reference's conv2d_gradfix
machinery (torch_utils/ops/conv2d_gradfix.py) has no equivalent here — its
"no_weight_gradients" feature is expressed with jax.lax.stop_gradient on the
weights at the loss level.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .upfirdn2d import upfirdn2d, _parse_padding, _filter_size


def _conv(x: jax.Array,
          w: jax.Array,
          stride: int = 1,
          padding=((0, 0), (0, 0)),
          groups: int = 1,
          flip_weight: bool = True,
          lhs_dilation: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Dense conv. flip_weight=True → correlation (torch F.conv2d semantics)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
    )


def conv2d_resample(x: jax.Array,
                    w: jax.Array,
                    f: Optional[np.ndarray] = None,
                    up: int = 1,
                    down: int = 1,
                    padding=0,
                    groups: int = 1,
                    flip_weight: bool = True,
                    flip_filter: bool = False) -> jax.Array:
    """Convolve NHWC ``x`` with HWIO ``w``, resampling with FIR filter ``f``.

    Args:
        x: ``[N, H, W, C_in]``.
        w: ``[kh, kw, C_in // groups, C_out]``.
        f: FIR filter from ``setup_filter`` (numpy const) or None.
        up / down: integer resampling factors.
        padding: int, ``[x, y]`` or ``[x0, x1, y0, y1]`` w.r.t. the upsampled
            image; negative crops.
        flip_weight: False = convolution, True = correlation.
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Padding adjustments for the FIR stages
    # (contract from reference conv2d_resample.py:97-107).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Downsampling (optionally with 1x1 conv): FIR+pad first, strided conv after.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsampling: fused zero-insert + dense conv (lhs_dilation), keeping the
    # full output, then the FIR with the remaining padding (gain up²).
    if up > 1:
        x = _conv(x, w, groups=groups, flip_weight=flip_weight,
                  lhs_dilation=(up, up),
                  padding=((kh - 1, kh - 1 + up - 1), (kw - 1, kw - 1 + up - 1)))
        x = upfirdn2d(x, f,
                      padding=[px0 - (kw - 1), px1 - (kw - 1),
                               py0 - (kh - 1), py1 - (kh - 1)],
                      gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain convolution (lax handles asymmetric / negative padding natively).
    return _conv(x, w, padding=((py0, py1), (px0, px1)), groups=groups,
                 flip_weight=flip_weight)
