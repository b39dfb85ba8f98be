"""Image/layer layout helpers.

Capability parity with the reference's custom_utils/image_utils.py, split by
execution domain (a TPU-first decision the reference doesn't make):

  * device-side (jnp): range shifts, center padding, white-background
    blending, random layer placement — everything that runs inside jitted
    steps with static shapes.
  * host-side (numpy): content-dependent crops/re-centering
    (``crop_to_content``, ``generate_pseudo_fake``, ``make_batch_for_local_d``
    — reference image_utils.py:209-278) whose bounding boxes are data
    dependent; these belong in the input pipeline, not the compiled step.

Layouts are NHWC: images ``[B, H, W, C]``, layer stacks ``[B, L, H, W, C]``.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.composite import alpha_composite
from ..ops.grid_sample import translate_sample


# ---------------------------------------------------------------------------
# Range shifts (reference: image_utils.py:184-195)
# ---------------------------------------------------------------------------

def normalize_minus11(x):
    """[0, 1] → [-1, 1]."""
    return x * 2.0 - 1.0


def normalize_zero1(x):
    """[-1, 1] → [0, 1]."""
    return (x + 1.0) / 2.0


# ---------------------------------------------------------------------------
# Device-side (jnp)
# ---------------------------------------------------------------------------

def pad_center(x: jax.Array, size: int = 256, pad_value: float = 0.0) -> jax.Array:
    """Center-pad NHWC images to ``size``²
    (reference pad_256 contract: image_utils.py:216-226)."""
    h, w = x.shape[-3], x.shape[-2]
    pad_y, pad_x = size - h, size - w
    py0, px0 = pad_y // 2, pad_x // 2
    py1, px1 = pad_y - py0, pad_x - px0
    pads = [(0, 0)] * (x.ndim - 3) + [(py0, py1), (px0, px1), (0, 0)]
    return jnp.pad(x, pads, constant_values=pad_value)


def make_batch_for_pos_estimator(list_of_bhwc: Sequence[jax.Array],
                                 size: int = 256,
                                 pad_value: float = 0.0) -> jax.Array:
    """List of per-layer batches (various sizes) → ``[B, L, size, size, C]``
    (reference contract: image_utils.py:229-243)."""
    padded = [pad_center(x, size, pad_value) for x in list_of_bhwc]
    return jnp.stack(padded, axis=1)


def blend_white_bg(images: jax.Array) -> jax.Array:
    """RGBA [0,1] → RGB [0,1] over white
    (reference contract: image_utils.py:359-371)."""
    white = jnp.ones_like(images)
    stack = jnp.stack([white, images], axis=1)  # [B, 2, H, W, 4]
    return alpha_composite(stack)[..., :3]


def random_position(layers: jax.Array, key: jax.Array,
                    pad_value: float = 0.0) -> jax.Array:
    """Translate each layer to a uniform random position in [-1, 1]
    (reference contract: image_utils.py:281-294); used by renderer/STN
    stage-0 pretraining."""
    b, l, h, w, c = layers.shape
    t = jax.random.uniform(key, (b * l, 2), minval=-1.0, maxval=1.0)
    flat = layers.reshape(b * l, h, w, c)
    moved = translate_sample(flat, t, pad_value=pad_value)
    return moved.reshape(b, l, h, w, c)


def calc_psnr(x, y, data_range: float = 1.0):
    mse = jnp.mean(jnp.square(x - y))
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def stack_layer_to_channel(x: jax.Array) -> jax.Array:
    """[B, L, H, W, C] → [B, H, W, L*C] (channel index = l*C + c)."""
    b, l, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, l * c)


def unstack_layer_to_channel(x: jax.Array, num_channels: int = 4) -> jax.Array:
    """Inverse of stack_layer_to_channel."""
    b, h, w, lc = x.shape
    l = lc // num_channels
    return jnp.transpose(x.reshape(b, h, w, l, num_channels), (0, 3, 1, 2, 4))


# ---------------------------------------------------------------------------
# Host-side (numpy, input pipeline)
# ---------------------------------------------------------------------------

def crop_to_content_np(img: np.ndarray) -> np.ndarray:
    """Crop an [H, W, 4] image to its nonzero-alpha bounding box
    (reference contract: image_utils.py:209-213)."""
    alpha = img[..., 3]
    ys, xs = np.nonzero(alpha)
    if len(ys) == 0:
        return img[:0, :0]
    return img[ys.min():ys.max(), xs.min():xs.max()]


def pad_center_np(img: np.ndarray, size: int = 256,
                  pad_value: float = 0.0) -> np.ndarray:
    h, w = img.shape[:2]
    pad_y, pad_x = size - h, size - w
    py0, px0 = pad_y // 2, pad_x // 2
    return np.pad(img, [(py0, pad_y - py0), (px0, pad_x - px0), (0, 0)],
                  constant_values=pad_value)


def generate_pseudo_fake_np(blhwc: np.ndarray) -> np.ndarray:
    """Re-center every layer's content (reference: image_utils.py:269-278).
    Input [B, L, H, W, 4] in [0, 1]."""
    b, l, h, w, c = blhwc.shape
    out = np.zeros_like(blhwc)
    flat_in = blhwc.reshape(b * l, h, w, c)
    flat_out = out.reshape(b * l, h, w, c)
    for i in range(b * l):
        flat_out[i] = pad_center_np(crop_to_content_np(flat_in[i]), h)
    return out


def make_batch_for_local_d_np(blhwc: np.ndarray,
                              layer_size_list: Sequence[Tuple[int, int]],
                              to_minus11: bool = False) -> List[np.ndarray]:
    """Real montage layers → per-layer centered crops for the local Ds
    (reference contract: image_utils.py:246-266).  Input [B, L, H, W, 4]
    in [0, 1]; returns a list of [B, h_l, w_l, 4]."""
    assert blhwc.min() >= 0 and blhwc.max() <= 1
    b, l, h, w, c = blhwc.shape
    centered = generate_pseudo_fake_np(blhwc)
    outs = []
    for idx, (bh, bw) in enumerate(layer_size_list):
        y0, x0 = (h - bh) // 2, (w - bw) // 2
        crop = centered[:, idx, y0:y0 + bh, x0:x0 + bw]
        outs.append(crop * 2.0 - 1.0 if to_minus11 else crop)
    return outs


def alpha_composite_np(layers: np.ndarray) -> np.ndarray:
    """Numpy straight-alpha composite ([..., L, H, W, 4] in [0,1]) — the
    host-side oracle replacing the reference's PIL round-trip."""
    canvas = layers[..., 0, :, :, :]
    for i in range(1, layers.shape[-4]):
        top = layers[..., i, :, :, :]
        ca, ta = canvas[..., 3:], top[..., 3:]
        ao = ta + ca * (1 - ta)
        safe = np.where(ao == 0, 1.0, ao)
        co = np.where(ao == 0, 0.0,
                      (top[..., :3] * ta + canvas[..., :3] * ca * (1 - ta)) / safe)
        canvas = np.concatenate([co, ao], axis=-1)
    return canvas
