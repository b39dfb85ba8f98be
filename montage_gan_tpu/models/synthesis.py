"""StyleGAN2 synthesis networks, non-square capable.

Contract parity with the reference's SynthesisLayer / ToRGBLayer /
SynthesisBlock / SynthesisNetwork / Generator
(reference: custom/networks_aio.py:356-662), including the non-square
``init_res`` + ``conv_config_index`` geometry: a block at nominal resolution
``r`` has spatial extent ``(r·init_res[0] / 2^cci, r·init_res[1] / 2^cci)``
and the pyramid spans ``r = 2^cci .. img_resolution``.

TPU adaptations: NHWC; per-block reduced precision uses bfloat16 (the
reference's fp16 blocks, networks_aio.py:517); ToRGB accumulates in float32
(networks_aio.py:556); modulated convs use the scale-activation form (see
ops/modulated_conv.py).  Random noise comes from the flax 'noise' RNG stream
instead of ambient torch RNG.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.bias_act import bias_act, activation_funcs
from ..ops.filters import setup_filter
from ..ops.modulated_conv import modulated_conv2d
from ..ops.upfirdn2d import upsample2d
from .layers import FullyConnected, _normal_init
from .mapping import MappingNetwork


def block_resolutions(img_resolution: int, conv_config_index: int) -> Tuple[int, ...]:
    res_log2 = int(math.log2(img_resolution))
    return tuple(2 ** i for i in range(conv_config_index, res_log2 + 1))


def channels_for(res: int, channel_base: int, channel_max: int) -> int:
    return min(channel_base // res, channel_max)


def num_ws_for(img_resolution: int, conv_config_index: int) -> int:
    """Total style vectors consumed (reference: networks_aio.py:592-603)."""
    n = 0
    for res in block_resolutions(img_resolution, conv_config_index):
        n += 1 if res == 2 ** conv_config_index else 2
    return n + 1  # + torgb of the last block


def _spatial(resolution: int, init_res: Sequence[int], cci: int) -> Tuple[int, int]:
    return (resolution * init_res[0] // 2 ** cci,
            resolution * init_res[1] // 2 ** cci)


class SynthesisLayer(nn.Module):
    """(reference: custom/networks_aio.py:356-424)"""
    out_channels: int
    resolution: int
    init_res: Tuple[int, int] = (4, 4)
    conv_config_index: int = 2
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = 'lrelu'
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array,
                 noise_mode: str = 'random', gain: float = 1.0) -> jax.Array:
        assert noise_mode in ('random', 'const', 'none')
        out_h, out_w = _spatial(self.resolution, self.init_res, self.conv_config_index)
        in_channels = x.shape[-1]
        k = self.kernel_size

        styles = FullyConnected(in_channels, bias_init=1.0, name='affine')(w)
        weight = self.param('weight', _normal_init(1.0),
                            (k, k, in_channels, self.out_channels))

        noise = None
        if self.use_noise:
            noise_const = self.variable(
                'noise', 'noise_const',
                lambda: jax.random.normal(self.make_rng('noise'), (out_h, out_w)))
            noise_strength = self.param('noise_strength', nn.initializers.zeros, ())
            if noise_mode == 'random':
                key = self.make_rng('noise')
                noise = (jax.random.normal(key, (x.shape[0], out_h, out_w, 1),
                                           dtype=jnp.float32) * noise_strength)
            elif noise_mode == 'const':
                noise = (noise_const.value * noise_strength)[None, :, :, None]

        flip_weight = (self.up == 1)
        f = setup_filter(list(self.resample_filter))
        x = modulated_conv2d(x, weight, styles, noise=noise, up=self.up,
                             padding=k // 2, resample_filter=f,
                             flip_weight=flip_weight)

        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias, dim=-1, act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """(reference: custom/networks_aio.py:430-445)"""
    out_channels: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x: jax.Array, w: jax.Array) -> jax.Array:
        in_channels = x.shape[-1]
        k = self.kernel_size
        weight_gain = 1.0 / math.sqrt(in_channels * k * k)
        styles = FullyConnected(in_channels, bias_init=1.0, name='affine')(w) * weight_gain
        weight = self.param('weight', _normal_init(1.0),
                            (k, k, in_channels, self.out_channels))
        x = modulated_conv2d(x, weight, styles, demodulate=False)
        bias = self.param('bias', nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, bias, dim=-1, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """(reference: custom/networks_aio.py:451-561)"""
    in_channels: int  # 0 = first block (learned const input)
    out_channels: int
    resolution: int
    img_channels: int
    is_last: bool
    init_res: Tuple[int, int] = (4, 4)
    conv_config_index: int = 2
    architecture: str = 'skip'
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False  # on TPU: bfloat16
    use_noise: bool = True
    activation: str = 'lrelu'

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == 'skip') else 0

    @nn.compact
    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 ws: jax.Array, noise_mode: str = 'random',
                 force_fp32: bool = False):
        assert self.architecture in ('orig', 'skip', 'resnet')
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        batch = ws.shape[0]
        w_list = [ws[:, i] for i in range(ws.shape[1])]
        w_iter = iter(w_list)

        layer_kw = dict(init_res=self.init_res,
                        conv_config_index=self.conv_config_index,
                        resample_filter=tuple(self.resample_filter),
                        conv_clamp=self.conv_clamp, use_noise=self.use_noise,
                        activation=self.activation)

        if self.in_channels == 0:
            h0, w0 = _spatial(self.resolution, self.init_res, self.conv_config_index)
            const = self.param('const', _normal_init(1.0),
                               (h0, w0, self.out_channels))
            x = jnp.tile(const.astype(dtype)[None], (batch, 1, 1, 1))
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = SynthesisLayer(self.out_channels, resolution=self.resolution,
                               name='conv1', **layer_kw)(x, next(w_iter),
                                                         noise_mode=noise_mode)
        elif self.architecture == 'resnet':
            from .layers import Conv2dLayer
            y = Conv2dLayer(self.out_channels, kernel_size=1, use_bias=False,
                            up=2, resample_filter=tuple(self.resample_filter),
                            name='skip')(x, gain=math.sqrt(0.5))
            x = SynthesisLayer(self.out_channels, resolution=self.resolution,
                               up=2, name='conv0', **layer_kw)(x, next(w_iter),
                                                               noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, resolution=self.resolution,
                               name='conv1', **layer_kw)(x, next(w_iter),
                                                         noise_mode=noise_mode,
                                                         gain=math.sqrt(0.5))
            x = y + x
        else:
            x = SynthesisLayer(self.out_channels, resolution=self.resolution,
                               up=2, name='conv0', **layer_kw)(x, next(w_iter),
                                                               noise_mode=noise_mode)
            x = SynthesisLayer(self.out_channels, resolution=self.resolution,
                               name='conv1', **layer_kw)(x, next(w_iter),
                                                         noise_mode=noise_mode)

        if img is not None:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == 'skip':
            y = ToRGBLayer(self.img_channels, conv_clamp=self.conv_clamp,
                           name='torgb')(x, next(w_iter))
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y

        assert x.dtype == dtype
        assert img is None or img.dtype == jnp.float32
        return x, img


class SynthesisNetwork(nn.Module):
    """(reference: custom/networks_aio.py:567-621)"""
    img_resolution: int
    img_channels: int
    w_dim: int = 512
    init_res: Tuple[int, int] = (4, 4)
    conv_config_index: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    architecture: str = 'skip'
    conv_clamp: Optional[float] = None
    use_noise: bool = True
    activation: str = 'lrelu'

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        return block_resolutions(self.img_resolution, self.conv_config_index)

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 2 ** self.conv_config_index else 2
            if res == self.img_resolution:
                n += 1
        return n

    @nn.compact
    def __call__(self, ws: jax.Array, noise_mode: str = 'random',
                 force_fp32: bool = False) -> jax.Array:
        assert ws.shape[1] >= self.num_ws and ws.shape[2] == self.w_dim
        ws = ws.astype(jnp.float32)
        res_log2 = int(math.log2(self.img_resolution))
        fp16_resolution = max(2 ** (res_log2 + 1 - self.num_fp16_res), 8)
        cdict = {res: channels_for(res, self.channel_base, self.channel_max)
                 for res in self.block_resolutions}

        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = cdict[res // 2] if res > 2 ** self.conv_config_index else 0
            is_last = (res == self.img_resolution)
            num_conv = 1 if in_ch == 0 else 2
            num_torgb = 1 if (is_last or self.architecture == 'skip') else 0
            block_ws = ws[:, w_idx:w_idx + num_conv + num_torgb]
            w_idx += num_conv
            block = SynthesisBlock(
                in_channels=in_ch, out_channels=cdict[res], resolution=res,
                img_channels=self.img_channels, is_last=is_last,
                init_res=self.init_res, conv_config_index=self.conv_config_index,
                architecture=self.architecture, conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_resolution), use_noise=self.use_noise,
                activation=self.activation, name=f'b{res}')
            x, img = block(x, img, block_ws, noise_mode=noise_mode,
                           force_fp32=force_fp32)
        return img


class Generator(nn.Module):
    """mapping + synthesis wrapper (reference: custom/networks_aio.py:627-662)."""
    img_resolution: int
    img_channels: int
    z_dim: int = 512
    w_dim: int = 512
    c_dim: int = 0
    init_res: Tuple[int, int] = (4, 4)
    conv_config_index: int = 2
    mapping_num_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None

    def setup(self):
        self.synthesis = SynthesisNetwork(
            img_resolution=self.img_resolution, img_channels=self.img_channels,
            w_dim=self.w_dim, init_res=self.init_res,
            conv_config_index=self.conv_config_index,
            channel_base=self.channel_base, channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res, conv_clamp=self.conv_clamp)
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, w_dim=self.w_dim, c_dim=self.c_dim,
            num_ws=self.synthesis.num_ws, num_layers=self.mapping_num_layers)

    @property
    def num_ws(self) -> int:
        return num_ws_for(self.img_resolution, self.conv_config_index)

    def __call__(self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
                 noise_mode: str = 'random', update_w_avg: bool = False):
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_w_avg=update_w_avg)
        return self.synthesis(ws, noise_mode=noise_mode)
