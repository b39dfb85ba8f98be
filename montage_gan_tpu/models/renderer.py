"""Learned differentiable renderers (layer stack → composited image).

Contract parity with the reference's Renderer / RendererTanh /
RendererSubPixelConv (reference: diff_rendering/networks.py:6-134).

Reference quirk preserved for checkpoint compatibility: the three middle
"blocks" are the SAME module repeated (``*[self.block] * 3`` shares weights,
diff_rendering/networks.py:29,74,120), so the tanh/sigmoid renderers have only
one distinct mid conv.  ``shared_mid_block=False`` gives the (probably
intended) unshared variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


# single source of the layout-critical [B,L,H,W,C] → [B,H,W,L*C] mapping
# (channel index = l*C + c, matching the reference's NCHW view(b, l*c, h, w))
from ..utils.image_utils import stack_layer_to_channel as _stack_layers  # noqa: E402


class _SimpleRenderer(nn.Module):
    img_resolution: int = 256
    img_channels: int = 4
    img_layers: int = 9
    nf: int = 64
    shared_mid_block: bool = True

    def _out_act(self, x):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, L, H, W, C] → [B, H, W, C]."""
        y = _stack_layers(x)
        y = nn.relu(nn.Conv(self.nf, (3, 3), padding=1, name='conv_in')(y))
        if self.shared_mid_block:
            block = nn.Conv(self.nf, (3, 3), padding=1, name='block')
            for _ in range(3):
                y = nn.relu(block(y))
        else:
            for i in range(3):
                y = nn.relu(nn.Conv(self.nf, (3, 3), padding=1,
                                    name=f'block{i}')(y))
        y = nn.Conv(self.img_channels, (3, 3), padding=1, name='conv_out')(y)
        return self._out_act(y)


class RendererSigmoid(_SimpleRenderer):
    """Output in [0, 1] (reference: diff_rendering/networks.py:6-44)."""

    def _out_act(self, x):
        return nn.sigmoid(x)


class RendererTanh(_SimpleRenderer):
    """Output in [-1, 1] — the production variant
    (reference: diff_rendering/networks.py:47-89)."""

    def _out_act(self, x):
        return nn.tanh(x)


def _pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle: [B, H, W, r²] → [B, H·r, W·r, 1] with torch's
    channel ordering (channel index = i*r + j)."""
    b, h, w, c = x.shape
    assert c == r * r
    x = x.reshape(b, h, w, r, r)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(b, h * r, w * r, 1)


class RendererSubPixelConv(nn.Module):
    """PixelShuffle(6) variant (reference: diff_rendering/networks.py:92-134).
    Requires img_layers * img_channels == 36."""
    img_resolution: int = 256
    img_channels: int = 4
    img_layers: int = 9
    nf1: int = 8
    nf2: int = 64
    shared_mid_block: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lc = self.img_layers * self.img_channels
        r = int(lc ** 0.5)
        assert r * r == lc and r == 6, "only 9 RGBA layers supported"
        y = _stack_layers(x)
        y = _pixel_shuffle(y, r)                                   # [B,6H,6W,1]
        y = nn.relu(nn.Conv(self.nf1, (3, 3), strides=2, padding=1,
                            name='conv_down1')(y))                 # [B,3H,3W,nf1]
        y = nn.relu(nn.Conv(self.nf2, (3, 3), strides=3, padding='VALID',
                            name='conv_down2')(y))                 # [B,H,W,nf2]
        if self.shared_mid_block:
            block = nn.Conv(self.nf2, (3, 3), padding=1, name='block')
            for _ in range(2):
                y = nn.relu(block(y))
        else:
            for i in range(2):
                y = nn.relu(nn.Conv(self.nf2, (3, 3), padding=1,
                                    name=f'block{i}')(y))
        y = nn.Conv(4, (3, 3), padding=1, name='conv_out')(y)
        return nn.tanh(y)


def build_renderer(renderer_type: str, **kwargs):
    """Factory matching the reference's renderer_config switch
    (reference: custom/training_loop_aio.py:94-105)."""
    types = {'sigmoid': RendererSigmoid, 'tanh': RendererTanh,
             'subpixel': RendererSubPixelConv}
    if renderer_type not in types:
        raise ValueError(f"unknown renderer type {renderer_type!r}")
    return types[renderer_type](**kwargs)
