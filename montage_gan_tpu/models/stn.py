"""Spatial-transformer position estimator for layer placement.

Contract parity with the reference's STNv2c (the production variant,
reference: fukuwarai/networks.py:148-258): a 5-stage conv/maxpool
localization net over the channel-stacked montage, an FC head regressing
translation-only parameters (zero-init for an identity start), then a
per-layer translate.  The reference's "+1 shift" grid_sample workaround for
[-1,1] data (fukuwarai/networks.py:252-255) is expressed natively as
``pad_value=-1`` (see ops/grid_sample.py).

The reference's STNv2b (zero-fill variant) is ``pad_value=0.0``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import translate_sample, translate_to_theta


def auto_stn_stages(img_resolution: int, max_stages: int = 5) -> int:
    """Deepest localization depth that keeps a ≥1px spatial output
    (the reference's fixed 5 stages assume 256px input)."""
    kernels = (7, 5, 3, 3, 3)
    size = img_resolution
    stages = 0
    for k in kernels[:max_stages]:
        nxt = (size - (k - 1)) // 2
        if nxt < 1:
            break
        size = nxt
        stages += 1
    return max(stages, 1)


class STN(nn.Module):
    img_resolution: int = 256
    img_channels: int = 4
    img_layers: int = 9
    nf1: int = 64
    nf2: int = 64
    num_stages: int = 5  # 5 at 256px (reference); fewer for small resolutions
    pad_value: float = -1.0  # -1 ⇔ reference STNv2c; 0 ⇔ STNv2b

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Args:  x ``[B, L, H, W, C]`` in [-1, 1].
        Returns: (transformed ``[B, L, H, W, C]``, theta ``[B, L, 2, 3]``)."""
        b, l, h, w, c = x.shape
        assert l == self.img_layers and c == self.img_channels

        # Stack layers into channels: [B, H, W, L*C] (shared helper — the
        # torch-checkpoint importer depends on this exact channel order)
        from ..utils.image_utils import stack_layer_to_channel
        y = stack_layer_to_channel(x)

        # Localization net: (conv k, maxpool 2, relu) × 5, VALID padding
        # (reference: fukuwarai/networks.py:169-189).
        widths = (self.nf1, self.nf1 * 2, self.nf1 * 4,
                  self.nf1 * 6, self.nf1 * 8)[:self.num_stages]
        kernels = (7, 5, 3, 3, 3)[:self.num_stages]
        for width, k in zip(widths, kernels):
            y = nn.Conv(width, (k, k), padding='VALID')(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            y = nn.relu(y)

        y = y.reshape(b, -1)
        y = nn.relu(nn.Dense(self.nf2)(y))
        translation = nn.Dense(self.img_layers * 2,
                               kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros)(y)
        translation = translation.reshape(b, l, 2)
        theta = translate_to_theta(translation)

        flat = x.reshape(b * l, h, w, c)
        moved = translate_sample(flat, translation.reshape(b * l, 2),
                                 pad_value=self.pad_value)
        return moved.reshape(b, l, h, w, c), theta
