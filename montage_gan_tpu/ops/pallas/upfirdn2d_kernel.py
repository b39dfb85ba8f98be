"""Pallas TPU kernel: separable upfirdn2d (pad → zero-upsample → FIR → down).

The hand-written analogue of the reference's upfirdn2d CUDA kernel's
separable small-filter specializations (reference:
torch_utils/ops/upfirdn2d.cu:97-200 — two 1-D passes over shared-memory
tiles; dispatch table :205-310).  Here each 1-D pass is one ``pallas_call``:
a block of rows is DMA'd to VMEM, zero-upsampled/padded *in VMEM* (the fusion
win — the dilated intermediate never touches HBM), filtered with an unrolled
tap loop on the VPU, downsampled by phase selection, and stored.

Semantics are identical to ``ops.upfirdn2d.upfirdn2d`` with a 1-D
(separable) filter; parity is pinned in tests/test_pallas_kernels.py.
Supported: any up/down/pad (incl. negative = crop), any tap count.

The op is linear in ``x``; the custom VJP computes the cotangent through
``jax.linear_transpose`` of the XLA twin (the reference's
backward-is-another-upfirdn2d identity, torch_utils/ops/upfirdn2d.py:262-281,
is exactly this transpose), so gradients of arbitrary order remain exact.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..upfirdn2d import (_upfirdn2d_xla as _xla_upfirdn2d,
                         _parse_padding, _parse_scaling)


def _pass_compute(x: jax.Array, *, taps: Tuple[float, ...], up: int,
                  down: int, p0: int, p1: int, axis: int, out_len: int,
                  out_dtype) -> jax.Array:
    """One 1-D resampling pass along ``axis`` of a VMEM-resident block (the
    trailing dim is the channel/lane axis and is never filtered)."""
    x = x.astype(jnp.float32)
    shape = list(x.shape)
    length = shape[axis]

    # zero-upsample to length*up (trailing zeros included, matching the
    # reference's Upsample step, torch_utils/ops/upfirdn2d.py:192-198)
    if up > 1:
        parts = [x] + [jnp.zeros_like(x)] * (up - 1)
        x = jnp.stack(parts, axis=axis + 1)
        shape[axis] = length * up
        x = x.reshape(shape)
        length = length * up

    # padding (negative pads crop); over-pad the high side so every tap's
    # slice of length out_len*down is in range
    crop0, crop1 = max(-p0, 0), max(-p1, 0)
    if crop0 or crop1:
        x = jax.lax.slice_in_dim(x, crop0, length - crop1, axis=axis)
        length -= crop0 + crop1
    need = (len(taps) - 1) + out_len * down
    pad0 = max(p0, 0)
    pad1 = max(need - (length + pad0), 0)
    if pad0 or pad1:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (pad0, pad1)
        x = jnp.pad(x, pads)

    # unrolled correlation + phase-0 downsampling
    acc = None
    for t, ft in enumerate(taps):
        seg = jax.lax.slice_in_dim(x, t, t + out_len * down, axis=axis)
        if down > 1:
            sshape = list(seg.shape)
            sshape[axis:axis + 1] = [out_len, down]
            seg = jax.lax.index_in_dim(seg.reshape(sshape), 0,
                                       axis=axis + 1, keepdims=False)
        term = seg * np.float32(ft)
        acc = term if acc is None else acc + term
    return acc.astype(out_dtype)


def _round_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (block sizes must tile n)."""
    for b in range(min(target, n), 0, -1):
        if n % b == 0:
            return b
    return 1


def _lane_block(c: int) -> int:
    """Channel (lane) block: Mosaic requires the last block dim to be a
    multiple of 128 or the full dimension."""
    if c % 128 == 0:
        return 128
    return c


def _sublane_block(w: int, budget_rows: int) -> int:
    """Second-to-last block dim: a multiple of 8 dividing w (or w itself),
    at most ``budget_rows``.  Returns 0 if no legal tiling exists."""
    if w <= budget_rows:
        return w
    best = 0
    for b in range(8, min(budget_rows, w) + 1, 8):
        if w % b == 0:
            best = b
    return best


def _taps(f: np.ndarray, flip_filter: bool, gain: float) -> Tuple[float, ...]:
    fk = np.asarray(f, np.float32) * np.float32(gain)
    if not flip_filter:
        fk = fk[::-1]
    return tuple(float(v) for v in fk)


def _pass_h(x: jax.Array, taps, up, down, p0, p1) -> jax.Array:
    """Horizontal (W-axis) pass over ``[N, H, W, C]``."""
    n, h, w, c = x.shape
    out_w = (w * up + p0 + p1 - len(taps)) // down + 1
    assert out_w > 0
    x2 = x.reshape(n * h, w, c)
    bc = _lane_block(c)
    br = _round_block(n * h, max(1, (1 << 18) // (4 * max(w * up + abs(p0) +
                                                          abs(p1), out_w)
                                                  * bc)))
    compute = functools.partial(_pass_compute, taps=taps, up=up, down=down,
                                p0=p0, p1=p1, axis=1, out_len=out_w,
                                out_dtype=x.dtype)

    def kernel(x_ref, o_ref):
        o_ref[...] = compute(x_ref[...])

    out = pl.pallas_call(
        kernel,
        grid=(n * h // br, c // bc),
        in_specs=[pl.BlockSpec((br, w, bc), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((br, out_w, bc), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, out_w, c), x.dtype),
    )(x2)
    return out.reshape(n, h, out_w, c)


def _pass_v(x: jax.Array, taps, up, down, p0, p1) -> jax.Array:
    """Vertical (H-axis) pass over ``[N, H, W, C]``."""
    n, h, w, c = x.shape
    out_h = (h * up + p0 + p1 - len(taps)) // down + 1
    assert out_h > 0
    bc = _lane_block(c)
    bw = _sublane_block(w, max(1, (1 << 18) // (4 * max(h * up + abs(p0) +
                                                        abs(p1), out_h)
                                                 * bc)))
    if bw == 0:
        return None  # no legal Mosaic tiling; caller falls back to XLA
    compute = functools.partial(_pass_compute, taps=taps, up=up, down=down,
                                p0=p0, p1=p1, axis=0, out_len=out_h,
                                out_dtype=x.dtype)

    def kernel(x_ref, o_ref):
        o_ref[...] = compute(x_ref[...][0])[None]

    out = pl.pallas_call(
        kernel,
        grid=(n, w // bw, c // bc),
        in_specs=[pl.BlockSpec((1, h, bw, bc), lambda i, j, k: (i, 0, j, k),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, out_h, bw, bc),
                               lambda i, j, k: (i, 0, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_h, w, c), x.dtype),
    )(x)
    return out


def _forward(x, f, upx, upy, downx, downy, padx0, padx1, pady0, pady1,
             flip_filter, gain):
    g = float(np.sqrt(gain))
    x = _pass_h(x, _taps(f, flip_filter, g), upx, downx, padx0, padx1)
    out = _pass_v(x, _taps(f, flip_filter, g), upy, downy, pady0, pady1)
    if out is None:
        # no legal Mosaic tiling for the vertical pass (intermediate width
        # not a multiple of 8): finish with the XLA twin's vertical pass
        out = _xla_upfirdn2d(x, np.asarray(f, np.float32)[:, None],
                             up=[1, upy], down=[1, downy],
                             padding=[0, 0, pady0, pady1],
                             flip_filter=flip_filter, gain=g)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _upfirdn2d_sep(x, f_tuple, up, down, pad, flip_filter, gain):
    f = np.asarray(f_tuple, np.float32)
    return _forward(x, f, up[0], up[1], down[0], down[1],
                    pad[0], pad[1], pad[2], pad[3], flip_filter, gain)


def _fwd(x, f_tuple, up, down, pad, flip_filter, gain):
    return (_upfirdn2d_sep(x, f_tuple, up, down, pad, flip_filter, gain),
            x.shape)


def _bwd(f_tuple, up, down, pad, flip_filter, gain, x_shape, dy):
    # the op is linear in x: cotangent = transpose of the XLA twin
    # (the reference's swapped-up/down backward identity)
    f = np.asarray(f_tuple, np.float32)

    def apply(t):
        return _xla_upfirdn2d(t, f, up=list(up), down=list(down),
                              padding=list(pad), flip_filter=flip_filter,
                              gain=gain)

    dx, = jax.linear_transpose(
        apply, jax.ShapeDtypeStruct(x_shape, dy.dtype))(dy)
    return (dx,)


_upfirdn2d_sep.defvjp(_fwd, _bwd)


def upfirdn2d_pallas(x: jax.Array, f, up=1, down=1, padding=0,
                     flip_filter: bool = False, gain: float = 1.0
                     ) -> jax.Array:
    """Drop-in replacement for ``ops.upfirdn2d.upfirdn2d`` with a separable
    (1-D) filter, executing as two Pallas passes.  Non-separable filters
    fall back to the XLA path."""
    f_arr = None if f is None else np.asarray(f, np.float32)
    if f_arr is None or f_arr.ndim != 1:
        return _xla_upfirdn2d(x, f, up=up, down=down, padding=padding,
                              flip_filter=flip_filter, gain=gain)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    pad = _parse_padding(padding)
    return _upfirdn2d_sep(x, tuple(float(v) for v in f_arr),
                          (upx, upy), (downx, downy), pad,
                          bool(flip_filter), float(gain))
