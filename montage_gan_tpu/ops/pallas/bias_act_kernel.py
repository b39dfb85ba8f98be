"""Pallas TPU kernel: fused bias + activation + gain + clamp.

The direct analogue of the reference's bias_act CUDA kernel
(reference: torch_utils/ops/bias_act.cu:27-130), provided as an alternative
implementation of ops.bias_act for benchmarking and for standalone
(non-fusable) call sites.  In fused contexts the pure-jnp path is preferred —
XLA folds the chain into the producing conv/matmul epilogue, which a custom
kernel would prevent (see ops/bias_act.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..bias_act import activation_funcs


def _kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp, has_bias):
    x = x_ref[...]
    if has_bias:
        x = x + b_ref[...].astype(x.dtype)  # bias broadcast over rows
    spec = activation_funcs[act]
    y = spec.func(x, alpha=alpha)
    if gain != 1.0:
        y = y * jnp.asarray(gain, y.dtype)
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    o_ref[...] = y


@functools.partial(jax.jit,
                   static_argnames=('act', 'alpha', 'gain', 'clamp'))
def bias_act_pallas(x: jax.Array,
                    b: Optional[jax.Array] = None,
                    act: str = 'linear',
                    alpha: Optional[float] = None,
                    gain: Optional[float] = None,
                    clamp: Optional[float] = None) -> jax.Array:
    """Channels-last fused bias+act (bias over the trailing dim)."""
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    tile = 256 if n % 256 == 0 else (8 if n % 8 == 0 else 1)

    has_bias = b is not None
    args = [x2]
    in_specs = [pl.BlockSpec((tile, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_bias:
        args.append(b.reshape(1, c))
        in_specs.append(pl.BlockSpec((1, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, act=act, alpha=alpha, gain=gain,
                               clamp=clamp, has_bias=has_bias)
    if not has_bias:
        def kernel(x_ref, o_ref, *, _k=functools.partial(
                _kernel, act=act, alpha=alpha, gain=gain, clamp=clamp,
                has_bias=False)):
            _k(x_ref, None, o_ref)

    out = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
    )(*args)
    return out.reshape(orig_shape)
