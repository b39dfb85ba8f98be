"""Basic equalized-learning-rate layers shared by all networks.

Contract parity with the reference's FullyConnectedLayer / Conv2dLayer /
MinibatchStdLayer (reference: custom/networks_aio.py:95-179, 773-795), in
NHWC with weights stored as [in, out] / [kh, kw, in, out] (the torch importer
transposes).  Weights are init'd N(0, 1)/lr_mult and scaled at runtime by
lr_mult/sqrt(fan_in) — the equalized-LR trick.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bias_act import bias_act, activation_funcs
from ..ops.conv2d_resample import conv2d_resample
from ..ops.filters import setup_filter


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """RMS-normalize (reference: custom/networks_aio.py:20-22)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def _normal_init(stddev: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev
    return init


class FullyConnected(nn.Module):
    """Equalized-LR linear layer (reference: custom/networks_aio.py:95-124)."""
    out_features: int
    use_bias: bool = True
    activation: str = 'linear'
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        w = self.param('weight', _normal_init(1.0 / self.lr_multiplier),
                       (in_features, self.out_features))
        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        b = None
        if self.use_bias:
            b = self.param('bias', nn.initializers.constant(self.bias_init),
                           (self.out_features,))
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        y = jnp.dot(x, (w * weight_gain).astype(x.dtype))
        return bias_act(y, b, dim=-1, act=self.activation)


class Conv2dLayer(nn.Module):
    """Equalized-LR conv with optional FIR up/down resampling
    (reference: custom/networks_aio.py:130-179)."""
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = 'linear'
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True  # False = frozen buffer (Freeze-D)

    @nn.compact
    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        in_channels = x.shape[-1]
        k = self.kernel_size
        w = self.param('weight', _normal_init(1.0),
                       (k, k, in_channels, self.out_channels))
        b = (self.param('bias', nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b) if b is not None else None

        weight_gain = 1.0 / math.sqrt(in_channels * k * k)
        f = setup_filter(list(self.resample_filter))
        flip_weight = (self.up == 1)
        x = conv2d_resample(x, (w * weight_gain).astype(x.dtype), f=f,
                            up=self.up, down=self.down, padding=k // 2,
                            flip_weight=flip_weight)

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, dim=-1, act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class MinibatchStd(nn.Module):
    """Minibatch standard-deviation feature channel
    (reference: custom/networks_aio.py:773-795)."""
    group_size: Optional[int] = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        assert n % g == 0, f"batch {n} not divisible by mbstd group {g}"
        f = self.num_channels
        cc = c // f

        y = x.astype(jnp.float32).reshape(g, -1, h, w, f, cc)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)          # [n/g, h, w, f, cc]
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 4))              # [n/g, f]
        y = y.reshape(1, -1, 1, 1, f)
        y = jnp.tile(y, (g, 1, h, w, 1)).reshape(n, h, w, f)
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


# Backwards-friendly alias matching the reference's class name.
MinibatchStdLayer = MinibatchStd
