"""Mapping networks: z (+c) → w.

Contract parity with the reference's MappingNetwork / GlobalMappingNetwork
(reference: custom/networks_aio.py:185-350).  GlobalMappingNetwork is the
MontageGAN addition: the final FC widens to ``w_dim * num_splits`` and the
output is reshaped to ``[B, L, num_ws, w_dim]`` — one style per image layer
from a single z.

The w moving average lives in the 'moving_stats' flax collection; pass
``mutable=['moving_stats']`` and ``update_w_avg=True`` during training steps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import FullyConnected, normalize_2nd_moment


class _MappingBase(nn.Module):
    z_dim: int = 512
    w_dim: int = 512
    num_ws: Optional[int] = None
    c_dim: int = 0
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = 'lrelu'
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    def _out_dim(self) -> int:
        raise NotImplementedError

    @nn.compact
    def _forward(self, z, c, truncation_psi, truncation_cutoff, update_w_avg):
        embed_features = self.embed_features
        if embed_features is None:
            embed_features = self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim
        out_dim = self._out_dim()
        features = ([self.z_dim + embed_features]
                    + [layer_features] * (self.num_layers - 1) + [out_dim])

        x = None
        if self.z_dim > 0:
            assert z.shape[-1] == self.z_dim
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = FullyConnected(embed_features, name='embed')(c.astype(jnp.float32))
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        for idx in range(self.num_layers):
            x = FullyConnected(features[idx + 1], activation=self.activation,
                               lr_multiplier=self.lr_multiplier,
                               name=f'fc{idx}')(x)

        w_avg = None
        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable('moving_stats', 'w_avg',
                                  lambda: jnp.zeros([out_dim], jnp.float32))
            if update_w_avg and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                # torch: w_avg ← mean.lerp(w_avg, beta) = beta·w_avg + (1-beta)·mean
                w_avg.value = (self.w_avg_beta * w_avg.value
                               + (1.0 - self.w_avg_beta) * mean_w)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert w_avg is not None
            avg = w_avg.value
            if self.num_ws is None or truncation_cutoff is None:
                x = avg + truncation_psi * (x - avg)
            else:
                trunc = avg + truncation_psi * (x[:, :truncation_cutoff] - avg)
                x = x.at[:, :truncation_cutoff].set(trunc)
        return x


class MappingNetwork(_MappingBase):
    """z (+c) → [B, num_ws, w_dim] (reference: custom/networks_aio.py:185-260)."""

    def _out_dim(self) -> int:
        return self.w_dim

    def __call__(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_w_avg: bool = False):
        return self._forward(z, c, truncation_psi, truncation_cutoff, update_w_avg)


class GlobalMappingNetwork(_MappingBase):
    """z (+c) → [B, num_splits, num_ws, w_dim]
    (reference: custom/networks_aio.py:264-350)."""
    num_splits: int = 9

    def _out_dim(self) -> int:
        return self.w_dim * self.num_splits

    def __call__(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                 update_w_avg: bool = False):
        x = self._forward(z, c, truncation_psi, truncation_cutoff, update_w_avg)
        b = x.shape[0]
        x = x.reshape(b, self.num_ws, self.num_splits, self.w_dim)
        return jnp.swapaxes(x, 1, 2)  # [B, L, num_ws, w_dim]
