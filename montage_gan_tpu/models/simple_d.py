"""Simple global discriminators for stage-0 STN pretraining.

Contract parity with the reference's SimpleGlobalDiscriminator (R1-GAN style,
reference: fukuwarai/networks.py:286-326) and SimpleGlobalDiscriminatorV2
(SG2-flavored resnet blocks with bilinear downsampling,
fukuwarai/networks.py:340-417).  Used only by the standalone fukuwarai
pretraining stage; the AIO loop uses the full SG2 Discriminator as global D
(reference: train_aio.py:205-207).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ResidualBlock(nn.Module):
    """(reference: fukuwarai/networks.py:261-283)"""
    planes: int

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        y = nn.leaky_relu(nn.Conv(self.planes, (3, 3), padding=1)(x), 0.2)
        y = nn.leaky_relu(nn.Conv(self.planes, (3, 3), padding=1)(y), 0.2)
        if inplanes != self.planes:
            x = nn.Conv(self.planes, (1, 1))(x)
        return y + x


def _avg_pool_3s2p1(x):
    """AvgPool2d(3, 2, padding=1) semantics (count_include_pad=True)."""
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       count_include_pad=True)


class SimpleGlobalDiscriminator(nn.Module):
    """(reference: fukuwarai/networks.py:286-326)"""
    img_resolution: int = 256
    img_channels: int = 4
    nf1: int = 64

    @nn.compact
    def __call__(self, x):
        widths = (self.nf1, self.nf1 * 2, self.nf1 * 4, self.nf1 * 8,
                  self.nf1 * 16, self.nf1 * 16)
        y = nn.Conv(self.nf1, (3, 3), padding=1)(x)
        for w in widths:
            y = ResidualBlock(w)(y)
            y = _avg_pool_3s2p1(y)
        y = y.reshape(y.shape[0], -1)
        return nn.Dense(1)(y)


def _bilinear_down2(x):
    """Bilinear ×0.5 with align_corners=False
    (reference DownSampling: fukuwarai/networks.py:329-337)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h // 2, w // 2, c), method='bilinear')


class SimpleDiscriminatorBlock(nn.Module):
    """(reference: fukuwarai/networks.py:340-380)"""
    tmp_planes: int
    planes: int
    first: bool = False

    @nn.compact
    def __call__(self, x):
        if self.first:
            x = nn.leaky_relu(nn.Conv(self.tmp_planes, (1, 1))(x), 0.2)
        y = _bilinear_down2(nn.Conv(self.planes, (1, 1), use_bias=False)(x))
        x = nn.leaky_relu(nn.Conv(self.tmp_planes, (3, 3), padding=1)(x), 0.2)
        x = nn.leaky_relu(_bilinear_down2(
            nn.Conv(self.planes, (3, 3), padding=1)(x)), 0.2)
        return y + x


class SimpleGlobalDiscriminatorV2(nn.Module):
    """(reference: fukuwarai/networks.py:383-417)"""
    img_resolution: int = 256
    img_channels: int = 4
    nf: int = 512

    @nn.compact
    def __call__(self, x):
        specs = [(128, 256, True), (256, 512, False), (512, 512, False),
                 (512, 512, False), (512, 512, False), (512, 512, False)]
        y = x
        for tmp, out, first in specs:
            y = SimpleDiscriminatorBlock(tmp, out, first=first)(y)
        y = y.reshape(y.shape[0], -1)
        y = nn.Dense(self.nf)(y)
        return nn.Dense(1)(y)
