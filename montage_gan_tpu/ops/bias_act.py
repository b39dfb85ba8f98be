"""Fused bias + activation + gain + clamp.

Same op contract as the reference's bias_act
(reference: torch_utils/ops/bias_act.py:71-140 and the CUDA kernel
bias_act.cu:54-130): ``y = clamp(gain * act(x + b), -clamp, clamp)`` with a
per-activation default gain/alpha registry.

TPU-first design: this is a pure-jnp composition.  On TPU, a standalone kernel
for an elementwise chain would *hurt* performance — XLA fuses this whole chain
into the epilogue of the producing matmul/conv, keeping it in registers/VMEM
instead of round-tripping HBM (which is exactly what the CUDA kernel exists to
avoid on GPUs).  JAX AD supplies the 1st/2nd-order gradients that the
reference hand-codes as grad-order dispatch G∈{0,1,2}.  An optional Pallas
implementation exists for benchmarking (ops/pallas/bias_act_kernel.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.config import EasyDict

# Activation registry. `def_gain` is the default output gain (sqrt(2) for
# variance-preserving relu/lrelu per the equalized-LR scheme); `def_alpha` the
# default shape parameter. Mirrors the reference registry's contract
# (reference: torch_utils/ops/bias_act.py:25-43).
activation_funcs = {
    'linear':   EasyDict(func=lambda x, **_: x,
                         def_alpha=0.0, def_gain=1.0),
    'relu':     EasyDict(func=lambda x, **_: jax.nn.relu(x),
                         def_alpha=0.0, def_gain=math.sqrt(2)),
    'lrelu':    EasyDict(func=lambda x, alpha, **_: jax.nn.leaky_relu(x, alpha),
                         def_alpha=0.2, def_gain=math.sqrt(2)),
    'tanh':     EasyDict(func=lambda x, **_: jnp.tanh(x),
                         def_alpha=0.0, def_gain=1.0),
    'sigmoid':  EasyDict(func=lambda x, **_: jax.nn.sigmoid(x),
                         def_alpha=0.0, def_gain=1.0),
    'elu':      EasyDict(func=lambda x, **_: jax.nn.elu(x),
                         def_alpha=0.0, def_gain=1.0),
    'selu':     EasyDict(func=lambda x, **_: jax.nn.selu(x),
                         def_alpha=0.0, def_gain=1.0),
    'softplus': EasyDict(func=lambda x, **_: jax.nn.softplus(x),
                         def_alpha=0.0, def_gain=1.0),
    'swish':    EasyDict(func=lambda x, **_: jax.nn.sigmoid(x) * x,
                         def_alpha=0.0, def_gain=math.sqrt(2)),
}


def bias_act(x: jax.Array,
             b: Optional[jax.Array] = None,
             dim: int = -1,
             act: str = 'linear',
             alpha: Optional[float] = None,
             gain: Optional[float] = None,
             clamp: Optional[float] = None) -> jax.Array:
    """Add bias along ``dim``, apply ``act``, scale by ``gain``, clamp to ±clamp.

    Note: ``dim`` defaults to -1 (channels-last / NHWC), unlike the NCHW
    reference which defaults to 1.
    """
    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        axis = dim % x.ndim
        assert b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha=alpha)

    if gain != 1:
        x = x * jnp.asarray(gain, dtype=x.dtype)

    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
