"""Style-modulated convolution — the signature StyleGAN2 op.

Same math as the reference's modulated_conv2d
(reference: custom/networks_aio.py:27-89): per-sample style modulation of the
weights, optional demodulation by the per-sample output-channel RMS, optional
up/downsampling through conv2d_resample, optional additive noise.

TPU-first design: the reference's "fused" path folds the batch into
convolution groups (networks_aio.py:79-89), which on TPU would degenerate the
MXU tiling (batch-1 grouped conv).  Instead we always use the algebraically
identical scale-activations form (the reference's non-fused path,
networks_aio.py:66-76), with the demodulation coefficients computed directly
from (styles, weights) as one [N,I]×[I,O] matmul — no per-sample weight tensor
is ever materialized:

    dcoef[n,o] = rsqrt( Σ_i styles[n,i]² · Σ_k w[k,i,o]²  + 1e-8 )

which equals the reference's rsqrt(Σ_{i,k} (w·s)² + 1e-8) exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .conv2d_resample import conv2d_resample


def modulated_conv2d(x: jax.Array,
                     weight: jax.Array,
                     styles: jax.Array,
                     noise: Optional[jax.Array] = None,
                     up: int = 1,
                     down: int = 1,
                     padding: int = 0,
                     resample_filter: Optional[np.ndarray] = None,
                     demodulate: bool = True,
                     flip_weight: bool = True) -> jax.Array:
    """Args:
        x: ``[N, H, W, I]``.
        weight: ``[kh, kw, I, O]``.
        styles: ``[N, I]`` modulation coefficients.
        noise: optional ``[N, Ho, Wo, 1]`` (or broadcastable) additive noise.
    Returns:
        ``[N, Ho, Wo, O]``.
    """
    n = x.shape[0]
    kh, kw, in_channels, out_channels = weight.shape
    assert x.shape[-1] == in_channels
    assert styles.shape == (n, in_channels)

    # Modulate activations instead of weights.
    x = x * styles.astype(x.dtype)[:, None, None, :]
    x = conv2d_resample(x, weight, f=resample_filter, up=up, down=down,
                        padding=padding, flip_weight=flip_weight)

    if demodulate:
        w32 = weight.astype(jnp.float32)
        w_sq = jnp.sum(w32 * w32, axis=(0, 1))                   # [I, O]
        s32 = styles.astype(jnp.float32)
        var = jnp.dot(s32 * s32, w_sq,
                      precision=lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)        # [N, O]
        dcoefs = lax.rsqrt(var + 1e-8).astype(x.dtype)
        if noise is not None:
            x = x * dcoefs[:, None, None, :] + noise.astype(x.dtype)
        else:
            x = x * dcoefs[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
