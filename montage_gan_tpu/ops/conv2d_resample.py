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

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .upfirdn2d import upfirdn2d, _parse_padding, _filter_size


def _up_impl() -> str:
    """'dilated' | 'subpixel' | 'auto' — from ``MGT_UP_IMPL``.

    Two mathematically identical lowerings of the fused zero-insert+conv
    (the up-path's transposed conv): 'dilated' is one
    ``lax.conv_general_dilated`` with ``lhs_dilation``; 'subpixel' contracts
    only the non-zero taps as up² phase convs on the LOW-res input (1/up²
    of the dense-at-output-res MACs when the backend executes the dilated
    form densely).  'auto' resolves to 'dilated': measured r5 on real
    production phases (v5e, 256² noaug, mb16): subpixel gmain 93.5 /
    dmain 110.6 ms vs dilated 81.7 / 105.1 — XLA's dilated lowering
    already skips the stuffed zeros on TPU, and the subpixel form's up²
    phase convs + stack/reshape cost more than they save.
    """
    impl = os.environ.get('MGT_UP_IMPL', 'auto')
    if impl == 'auto':
        return 'dilated'
    return impl


def _fir_fold() -> bool:
    """``MGT_FIR_FOLD`` ∈ {'auto','1','0'} — fold the depthwise resample FIR
    into the dense conv kernel (exact composition of the two linear ops;
    kernel grows to (k+taps−1)², removing the FIR pass and its intermediate).
    'auto' resolves per measurement on v5e (r5): the FIR passes cost
    ~2–2.4 ms/site at 256² (op-profile) while the widened kernel adds well
    under 1 ms of MXU time."""
    v = os.environ.get('MGT_FIR_FOLD', 'auto')
    if v == 'auto':
        return True
    return v == '1'


def _fold_weight_fir(w: jax.Array, f, flip_weight: bool, flip_filter: bool,
                     gain: float = 1.0) -> jax.Array:
    """Compose the depthwise FIR ``f`` into the dense kernel ``w`` (exact).

    Returns the correlation-form kernel ``w'`` of spatial size
    ``(kh+fh−1, kw+fw−1)`` such that ``corr(·, w') == corr(·, w̃) ∘ corr(·, f̃)``
    where ``w̃``/``f̃`` are ``w``/``f`` in correlation orientation
    (``w'[m] = Σ_k w̃[k]·f̃[m−k]``).  Order-independent: the same kernel is
    exact whether the FIR ran before (down path) or after (up path) the
    dense conv.  Reference semantics anchor: the down path's FIR→strided
    conv and up path's transposed-conv→FIR compositions,
    torch_utils/ops/conv2d_resample.py:109-160."""
    if not flip_weight:
        w = jnp.flip(w, (0, 1))
    f2 = np.asarray(f, np.float32)
    if f2.ndim == 1:
        f2 = np.outer(f2, f2)
    if not flip_filter:
        f2 = f2[::-1, ::-1]
    fh, fw = int(f2.shape[0]), int(f2.shape[1])
    kh, kw, ci, co = (int(s) for s in w.shape)
    wr = (w.astype(jnp.float32).transpose(2, 3, 0, 1)
          .reshape(ci * co, kh, kw, 1))
    ker = jnp.asarray(np.ascontiguousarray(f2[::-1, ::-1]) * gain,
                      jnp.float32).reshape(fh, fw, 1, 1)
    out = lax.conv_general_dilated(
        wr, ker, (1, 1), ((fh - 1, fh - 1), (fw - 1, fw - 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return (out.reshape(ci, co, kh + fh - 1, kw + fw - 1)
            .transpose(2, 3, 0, 1).astype(w.dtype))


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


def _up_conv_subpixel(x: jax.Array,
                      w: jax.Array,
                      up: int,
                      groups: int = 1,
                      flip_weight: bool = True) -> jax.Array:
    """Fused zero-insert ×up + dense conv, as up² phase convs on the
    low-res input.

    Bit-identical (modulo float reassociation) to the dilated form used by
    the up path::

        _conv(x, w, lhs_dilation=(up, up),
              padding=((kh-1, kh-1+up-1), (kw-1, kw-1+up-1)))

    but each output phase ``(r, s)`` contracts only the kernel taps that
    land on non-zero (non-stuffed) input samples — the strided slice
    ``w[(kh-1-r) % up :: up, (kw-1-s) % up :: up]`` — so the MAC count is
    1/up² of the dense-at-output-res contraction.  Requires
    ``(kh-1) % up == 0`` (true for the synthesis conv0's k=3, up=2).
    Reference semantics anchor: torch_utils/ops/conv2d_resample.py:119-139
    (transposed conv as the up-path engine).
    """
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    n, h_in, w_in, _ = x.shape
    kh, kw = int(w.shape[0]), int(w.shape[1])
    c_out = int(w.shape[3])
    assert (kh - 1) % up == 0 and (kw - 1) % up == 0
    p0y, p0x = kh - 1, kw - 1
    my = h_in + (kh - 1) // up   # per-phase output rows
    mx = w_in + (kw - 1) // up   # per-phase output cols

    rows = []
    for r in range(up):
        sy = (p0y - r) % up
        ty = max(0, -(-(kh - sy) // up))
        qy = (p0y - r) // up
        cols = []
        for s in range(up):
            sx = (p0x - s) % up
            tx = max(0, -(-(kw - sx) // up))
            qx = (p0x - s) // up
            if ty == 0 or tx == 0:
                cols.append(jnp.zeros((n, my, mx, c_out), x.dtype))
                continue
            sub = w[sy::up, sx::up]
            pad_hi_y = my + ty - qy - h_in - 1
            pad_hi_x = mx + tx - qx - w_in - 1
            cols.append(lax.conv_general_dilated(
                x, sub.astype(x.dtype), window_strides=(1, 1),
                padding=((qy, pad_hi_y), (qx, pad_hi_x)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=groups))
        rows.append(jnp.stack(cols, axis=3))        # [N, My, Mx, up, Co]
    y = jnp.stack(rows, axis=2)                     # [N, My, up, Mx, up, Co]
    return y.reshape(n, up * my, up * mx, c_out)


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
        if f is not None and _fir_fold():
            wf = _fold_weight_fir(w, f, flip_weight, flip_filter)
            return _conv(x, wf, stride=down,
                         padding=((py0, py1), (px0, px1)), groups=groups,
                         flip_weight=True)
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsampling: fused zero-insert + dense conv (lhs_dilation), keeping the
    # full output, then the FIR with the remaining padding (gain up²).
    if up > 1:
        if down == 1 and f is not None and _fir_fold() \
                and _up_impl() == 'dilated':
            # FIR folded into the transposed conv: one dilated conv with the
            # composed (k+taps−1)² kernel and the total padding of both
            # stages ((kh−1, kh−1+up−1) conv pad + the FIR stage's
            # remaining (p − (k−1)) pad).
            wf = _fold_weight_fir(w, f, flip_weight, flip_filter,
                                  gain=float(up ** 2))
            return _conv(x, wf, lhs_dilation=(up, up),
                         padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
                         groups=groups, flip_weight=True)
        if (_up_impl() == 'subpixel'
                and (kh - 1) % up == 0 and (kw - 1) % up == 0):
            x = _up_conv_subpixel(x, w, up, groups=groups,
                                  flip_weight=flip_weight)
        else:
            x = _conv(x, w, groups=groups, flip_weight=flip_weight,
                      lhs_dilation=(up, up),
                      padding=((kh - 1, kh - 1 + up - 1),
                               (kw - 1, kw - 1 + up - 1)))
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
