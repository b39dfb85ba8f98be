"""StyleGAN2 discriminator, non-square capable.

Contract parity with the reference's DiscriminatorBlock /
DiscriminatorEpilogue / Discriminator
(reference: custom/networks_aio.py:668-938): resnet architecture, fromrgb at
the top resolution, per-block reduced precision (bfloat16 here), minibatch-std
epilogue over the ``init_res`` spatial cells, optional conditional projection
head, Freeze-D via the ``freeze_layers`` counter.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2dLayer, FullyConnected, MinibatchStd
from .mapping import MappingNetwork
from .synthesis import block_resolutions as _block_res, channels_for
from ..ops.filters import setup_filter
from ..ops.upfirdn2d import downsample2d


class DiscriminatorBlock(nn.Module):
    """(reference: custom/networks_aio.py:668-767)"""
    in_channels: int  # 0 = first block
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    first_layer_idx: int = 0
    architecture: str = 'resnet'
    activation: str = 'lrelu'
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    freeze_layers: int = 0

    @staticmethod
    def num_layers(in_channels: int, architecture: str) -> int:
        """Freeze-D layer count for one block — the single source the parent
        uses to advance ``first_layer_idx`` (reference: the block's
        ``num_layers`` attribute, networks_aio.py:706-713).  Must mirror the
        ``next_trainable()`` call sequence in ``__call__``."""
        return ((1 if (in_channels == 0 or architecture == 'skip') else 0)
                + 2 + (1 if architecture == 'resnet' else 0))

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 force_fp32: bool = False):
        assert self.architecture in ('orig', 'skip', 'resnet')
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32

        layer_idx = self.first_layer_idx

        def next_trainable():
            nonlocal layer_idx
            t = layer_idx >= self.freeze_layers
            layer_idx += 1
            return t

        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == 'skip':
            img = img.astype(dtype)
            y = Conv2dLayer(self.tmp_channels, kernel_size=1,
                            activation=self.activation,
                            trainable=next_trainable(),
                            conv_clamp=self.conv_clamp, name='fromrgb')(img)
            x = x + y if x is not None else y
            img = (downsample2d(img, setup_filter(list(self.resample_filter)))
                   if self.architecture == 'skip' else None)

        conv0 = Conv2dLayer(self.tmp_channels, kernel_size=3,
                            activation=self.activation,
                            trainable=next_trainable(),
                            conv_clamp=self.conv_clamp, name='conv0')
        conv1 = Conv2dLayer(self.out_channels, kernel_size=3,
                            activation=self.activation, down=2,
                            trainable=next_trainable(),
                            resample_filter=tuple(self.resample_filter),
                            conv_clamp=self.conv_clamp, name='conv1')

        if self.architecture == 'resnet':
            skip = Conv2dLayer(self.out_channels, kernel_size=1, use_bias=False,
                               down=2, trainable=next_trainable(),
                               resample_filter=tuple(self.resample_filter),
                               name='skip')
            y = skip(x, gain=math.sqrt(0.5))
            x = conv0(x)
            x = conv1(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = conv0(x)
            x = conv1(x)

        assert x.dtype == dtype
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """(reference: custom/networks_aio.py:801-860).  Always float32."""
    in_channels: int
    cmap_dim: int
    init_res: Tuple[int, int] = (4, 4)
    img_channels: int = 3
    architecture: str = 'resnet'
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = 'lrelu'
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, img: Optional[jax.Array],
                 cmap: Optional[jax.Array]) -> jax.Array:
        h0, w0 = self.init_res
        assert x.shape[1] == h0 and x.shape[2] == w0, (x.shape, self.init_res)
        x = x.astype(jnp.float32)
        if self.architecture == 'skip':
            x = x + Conv2dLayer(self.in_channels, kernel_size=1,
                                activation=self.activation,
                                name='fromrgb')(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStd(group_size=self.mbstd_group_size,
                             num_channels=self.mbstd_num_channels,
                             name='mbstd')(x)
        x = Conv2dLayer(self.in_channels, kernel_size=3,
                        activation=self.activation,
                        conv_clamp=self.conv_clamp, name='conv')(x)
        x = FullyConnected(self.in_channels, activation=self.activation,
                           name='fc')(x.reshape(x.shape[0], -1))
        x = FullyConnected(1 if self.cmap_dim == 0 else self.cmap_dim,
                           name='out')(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


class Discriminator(nn.Module):
    """(reference: custom/networks_aio.py:866-938)"""
    img_resolution: int
    img_channels: int
    c_dim: int = 0
    init_res: Tuple[int, int] = (4, 4)
    conv_config_index: int = 2
    architecture: str = 'resnet'
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    cmap_dim: Optional[int] = None
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    freeze_layers: int = 0

    @nn.compact
    def __call__(self, img: jax.Array, c: Optional[jax.Array] = None,
                 force_fp32: bool = False) -> jax.Array:
        res_log2 = int(math.log2(self.img_resolution))
        resolutions = [2 ** i for i in range(res_log2, self.conv_config_index, -1)]
        cdict = {res: channels_for(res, self.channel_base, self.channel_max)
                 for res in resolutions + [2 ** self.conv_config_index]}
        fp16_resolution = max(2 ** (res_log2 + 1 - self.num_fp16_res), 8)

        cmap_dim = self.cmap_dim
        if cmap_dim is None:
            cmap_dim = cdict[2 ** self.conv_config_index]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        cur_layer_idx = 0
        for res in resolutions:
            in_ch = cdict[res] if res < self.img_resolution else 0
            block = DiscriminatorBlock(
                in_channels=in_ch, tmp_channels=cdict[res],
                out_channels=cdict[res // 2], resolution=res,
                img_channels=self.img_channels, first_layer_idx=cur_layer_idx,
                architecture=self.architecture, conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution),
                freeze_layers=self.freeze_layers, name=f'b{res}')
            x, img = block(x, img, force_fp32=force_fp32)
            cur_layer_idx += DiscriminatorBlock.num_layers(
                in_ch, self.architecture)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim,
                                  num_ws=None, w_avg_beta=None,
                                  name='mapping')(None, c)
        x = DiscriminatorEpilogue(
            in_channels=cdict[2 ** self.conv_config_index], cmap_dim=cmap_dim,
            init_res=tuple(self.init_res), img_channels=self.img_channels,
            architecture=self.architecture,
            mbstd_group_size=self.mbstd_group_size,
            mbstd_num_channels=self.mbstd_num_channels,
            conv_clamp=self.conv_clamp, name='b4')(x, img, cmap)
        return x
