"""Differentiable alpha compositing of RGBA layer stacks.

Same contract as the reference's straight-alpha A-over-B recurrence
(reference: custom_utils/image_utils.py:112-163 ``alpha_composite_pytorch``):
layer l is composited OVER the accumulated canvas, canvas starts as layer 0,
inputs/outputs in [0, 1], and 0/0 color divisions resolve to 0.

TPU-first design: instead of the sequential L-step recurrence, the composite
is evaluated in closed form with an exclusive reverse cumulative product of
transmittances —

    A_out           = 1 - Π_l (1 - a_l)
    C_out · A_out   = Σ_l c_l · a_l · Π_{k>l} (1 - a_k)

— one vectorized pass over the layer axis (VPU-friendly, no host round-trip),
which also eliminates the reference's PIL CPU round-trip
(custom_utils/image_utils.py:74-96) from the training path entirely.  The PIL
path survives only as the numpy test oracle (tests/oracles.py).

The fused ``translate_and_composite`` combines the STN translation placement
with compositing — the "composite op to fuse on TPU" (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import translate_sample


def _safe_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """num / den with 0/0 → 0 and well-defined gradients at den == 0."""
    den_safe = jnp.where(den == 0, jnp.ones_like(den), den)
    return jnp.where(den == 0, jnp.zeros_like(num), num / den_safe)


def alpha_composite(layers: jax.Array, layer_axis: int = 1) -> jax.Array:
    """Straight-alpha composite over the layer axis.

    Args:
        layers: ``[..., L, H, W, 4]`` (default ``layer_axis=1`` for
            ``[B, L, H, W, 4]``) RGBA in [0, 1]; higher ``l`` is on top.
    Returns:
        RGBA composite with the layer axis removed.
    """
    layers = jnp.moveaxis(layers, layer_axis, 0)  # [L, ..., H, W, 4]
    color = layers[..., :3]
    alpha = layers[..., 3:4]

    # transmittance above layer l: T_l = Π_{k>l} (1 - a_k)  (exclusive, reversed)
    one_minus = 1.0 - alpha
    rev = jnp.flip(one_minus, axis=0)
    t_above = jnp.flip(
        jnp.concatenate([jnp.ones_like(rev[:1]),
                         jnp.cumprod(rev, axis=0)[:-1]], axis=0),
        axis=0)

    weight = alpha * t_above                       # [L, ..., 1]
    alpha_out = 1.0 - jnp.prod(one_minus, axis=0)  # [..., 1]
    color_out = _safe_div(jnp.sum(color * weight, axis=0), alpha_out)
    return jnp.concatenate([color_out, alpha_out], axis=-1)


def alpha_composite_premultiplied(layers: jax.Array, layer_axis: int = 1) -> jax.Array:
    """Premultiplied-alpha variant
    (reference contract: custom_utils/image_utils.py:135-152)."""
    layers = jnp.moveaxis(layers, layer_axis, 0)
    color = layers[..., :3] * layers[..., 3:4]  # premultiply
    alpha = layers[..., 3:4]
    one_minus = 1.0 - alpha
    rev = jnp.flip(one_minus, axis=0)
    t_above = jnp.flip(
        jnp.concatenate([jnp.ones_like(rev[:1]),
                         jnp.cumprod(rev, axis=0)[:-1]], axis=0),
        axis=0)
    alpha_out = 1.0 - jnp.prod(one_minus, axis=0)
    color_out = _safe_div(jnp.sum(color * t_above, axis=0), alpha_out)
    return jnp.concatenate([color_out, alpha_out], axis=-1)


def translate_and_composite(layers: jax.Array,
                            translations: jax.Array,
                            pad_value: float = 0.0,
                            input_range: str = 'zero1') -> jax.Array:
    """Fused per-layer translation + alpha composite.

    Replaces the reference chain STN grid_sample (fukuwarai/networks.py:250-255)
    → alpha_composite_pytorch (custom/loss_aio.py:245-251) with one
    differentiable op.

    Args:
        layers: ``[B, L, H, W, 4]`` RGBA.  Range per ``input_range``:
            'zero1' ([0,1], pad should be 0) or 'minus11' ([-1,1], pad -1).
        translations: ``[B, L, 2]`` normalized (dx, dy).
        pad_value: fill for content translated in from outside.
        input_range: 'zero1' | 'minus11'; output matches the input range.
    Returns:
        ``[B, H, W, 4]`` composite.
    """
    b, l, h, w, c = layers.shape
    flat = layers.reshape(b * l, h, w, c)
    t = translations.reshape(b * l, 2)
    moved = translate_sample(flat, t, pad_value=pad_value)
    moved = moved.reshape(b, l, h, w, c)
    if input_range == 'minus11':
        comp = alpha_composite((moved + 1.0) * 0.5)
        return comp * 2.0 - 1.0
    return alpha_composite(moved)
