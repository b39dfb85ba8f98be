"""Pallas TPU kernel: fused per-layer translate + alpha composite.

This is the MontageGAN-specific hot op (SURVEY.md §7.1 kernel #4): the
reference chains STN grid_sample (fukuwarai/networks.py:250-255) with a
sequential Python A-over-B recurrence (custom_utils/image_utils.py:112-163).
The XLA composition (ops/composite.py) already fuses well, but its bilinear
gather materializes L translated layers in HBM; this kernel instead streams
each layer's shifted window HBM→VMEM once and accumulates the composite in
VMEM, so HBM traffic is exactly L reads + 1 write per tile.

Semantics: identical to ops.composite.translate_and_composite for
translation-only placement, with shifts clamped to ±1 (the theta-constraint
range, custom/loss_aio.py:182-188).

Layout: input layers are pre-padded by pad = extent//2 on each side with the
pad value (host/XLA side, cheap); the kernel does only dynamic-offset DMAs,
bilinear lerps, and the A-over-B update.  Forward-only — training uses the
XLA path (AD-complete); this kernel serves inference/serving.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(siy_ref, six_ref, fy_ref, fx_ref,   # scalar prefetch [B, L]
            x_ref,                              # HBM [B, L, Hp, Wp, C]
            out_ref,                            # VMEM [1, TH, W, C]
            layer_buf, sem,                     # scratch
            *, num_layers: int, tile_h: int, width: int, channels: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * tile_h

    canvas = jnp.zeros((tile_h, width, channels), jnp.float32)

    def body(l, canvas):
        siy = siy_ref[b, l]
        six = six_ref[b, l]
        fy = fy_ref[b, l]
        fx = fx_ref[b, l]
        # window rows [row0+siy, row0+siy+tile_h], cols [six, six+width]
        copy = pltpu.make_async_copy(
            x_ref.at[b, l, pl.ds(row0 + siy, tile_h + 1),
                     pl.ds(six, width + 1), :],
            layer_buf,
            sem,
        )
        copy.start()
        copy.wait()
        win = layer_buf[...].astype(jnp.float32)  # [TH+1, W+1, C]
        top = win[:-1, :-1] + (win[:-1, 1:] - win[:-1, :-1]) * fx
        bot = win[1:, :-1] + (win[1:, 1:] - win[1:, :-1]) * fx
        layer = top + (bot - top) * fy            # [TH, W, C]

        # straight-alpha A-over-B: layer OVER canvas
        la = layer[..., channels - 1:]
        ca = canvas[..., channels - 1:]
        ao = la + ca * (1.0 - la)
        safe = jnp.where(ao == 0, 1.0, ao)
        co = jnp.where(
            ao == 0, 0.0,
            (layer[..., :channels - 1] * la
             + canvas[..., :channels - 1] * ca * (1.0 - la)) / safe)
        return jnp.concatenate([co, ao], axis=-1)

    canvas = lax.fori_loop(0, num_layers, body, canvas)
    out_ref[0] = canvas.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('pad_value', 'tile_h'))
def translate_and_composite_pallas(layers: jax.Array,
                                   translations: jax.Array,
                                   pad_value: float = 0.0,
                                   tile_h: int = 64) -> jax.Array:
    """Fused translate+composite on TPU.

    Args:
        layers: ``[B, L, H, W, 4]`` RGBA in [0, 1] (compose in [0,1]; for
            [-1,1] data shift outside, as ops.composite.translate_and_composite
            does).
        translations: ``[B, L, 2]`` normalized (dx, dy) in [-1, 1] (clamped).
        pad_value: fill for content pulled from outside the canvas.
        tile_h: output rows per grid step.
    Returns:
        ``[B, H, W, 4]`` composite in [0, 1].
    """
    b, l, h, w, c = layers.shape
    assert h % tile_h == 0
    # margin covers |t| ≤ 1 shifts plus the +1 bilinear support on both ends
    pad = max(h, w) // 2 + 2

    # source coordinate = out + t·(extent/2)  (align_corners=False translate)
    t = jnp.clip(translations.astype(jnp.float32), -1.0, 1.0)
    sx = t[..., 0] * (w * 0.5)
    sy = t[..., 1] * (h * 0.5)
    # split into integer + fractional parts, offset by the pad margin
    six = jnp.floor(sx)
    siy = jnp.floor(sy)
    fx = (sx - six).astype(jnp.float32)
    fy = (sy - siy).astype(jnp.float32)
    six = (six + pad).astype(jnp.int32)
    siy = (siy + pad).astype(jnp.int32)

    padded = jnp.pad(layers,
                     [(0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)],
                     constant_values=pad_value)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, h // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tile_h, w, c),
                               lambda b_, t_, *refs: (b_, t_, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 1, w + 1, c), layers.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(_kernel, num_layers=l, tile_h=tile_h,
                               width=w, channels=c)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
    )(siy, six, fy, fx, padded)
