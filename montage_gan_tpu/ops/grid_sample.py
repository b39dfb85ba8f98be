"""Differentiable bilinear grid sampling (spatial transformer primitive).

Same sampling contract as torch's ``affine_grid`` + ``grid_sample`` with
``align_corners=False`` and bilinear interpolation, which the reference uses
for the STN (fukuwarai/networks.py:220-222), the ADA geometric branch
(training/augment.py:338-339), and random layer placement
(custom_utils/image_utils.py:281-294).  The reference needs a dedicated
2nd-order-capable wrapper (torch_utils/ops/grid_sample_gradfix.py); here the
op is pure jnp (gather + lerp), so JAX AD differentiates it to any order.

TPU-first additions:
  * ``pad_value``: out-of-bounds samples return ``pad_value`` instead of 0.
    ``pad_value=-1`` natively expresses the reference's STNv2c "+1 shift"
    workaround for [-1, 1]-ranged data (fukuwarai/networks.py:252-255) —
    bilinear interpolation is affine in the corner values, so shifting in/out
    of [0, 2] is exactly equivalent to sampling with a -1 fill.
  * NHWC layout; the grid is ``[N, H, W, 2]`` with (x, y) normalized coords.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta: jax.Array, height: int, width: int) -> jax.Array:
    """Sampling grid for a batch of 2x3 affine matrices (align_corners=False).

    Args:
        theta: ``[N, 2, 3]`` inverse transforms (output coords → input coords).
    Returns:
        ``[N, H, W, 2]`` grid of normalized (x, y) input coordinates.
    """
    n = theta.shape[0]
    x = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
    y = (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height - 1.0
    xx, yy = jnp.meshgrid(x, y)  # [H, W]
    ones = jnp.ones_like(xx)
    base = jnp.stack([xx, yy, ones], axis=-1)  # [H, W, 3]
    # grid[n, i, j, :] = theta[n] @ base[i, j] — f32 precision is required
    # for sub-pixel alignment (TPU matmuls default to bf16 inputs).
    grid = jnp.einsum('nab,ijb->nija', theta.astype(jnp.float32), base,
                      precision=jax.lax.Precision.HIGHEST)
    return grid


def grid_sample(x: jax.Array, grid: jax.Array, pad_value: float = 0.0) -> jax.Array:
    """Bilinear sampling of NHWC ``x`` at normalized grid coords.

    Args:
        x: ``[N, H, W, C]``.
        grid: ``[N, Ho, Wo, 2]`` with (x, y) in [-1, 1] (align_corners=False
            convention: ±1 maps to the outer pixel *edges*).
        pad_value: value returned for out-of-bounds samples.
    Returns:
        ``[N, Ho, Wo, C]``.
    """
    n, h, w, c = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # Normalized [-1, 1] → pixel-center coordinates.
    ix = (gx + 1.0) * (w * 0.5) - 0.5
    iy = (gy + 1.0) * (h * 0.5) - 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def gather(iy_, ix_):
        valid = (ix_ >= 0) & (ix_ < w) & (iy_ >= 0) & (iy_ < h)
        ix_c = jnp.clip(ix_, 0, w - 1)
        iy_c = jnp.clip(iy_, 0, h - 1)
        batch = jnp.arange(n, dtype=jnp.int32).reshape(n, 1, 1)
        vals = x[batch, iy_c, ix_c]  # [N, Ho, Wo, C]
        fill = jnp.asarray(pad_value, dtype=x.dtype)
        return jnp.where(valid[..., None], vals, fill)

    tx = tx[..., None].astype(x.dtype)
    ty = ty[..., None].astype(x.dtype)
    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix1)
    v10 = gather(iy1, ix0)
    v11 = gather(iy1, ix1)
    top = v00 + (v01 - v00) * tx
    bot = v10 + (v11 - v10) * tx
    return top + (bot - top) * ty


def translate_sample(x: jax.Array, translation: jax.Array,
                     pad_value: float = 0.0) -> jax.Array:
    """Translate NHWC images by normalized offsets (the STN's only transform).

    ``translation`` is ``[N, 2]`` (dx, dy) in the affine_grid convention used
    by the reference (custom_utils/image_utils.py:316-335): the *sampling*
    coordinate is shifted by +t, so content moves by -t·(extent/2) pixels.

    This is the specialization of affine_grid+grid_sample for a translation-
    only theta; kept separate so the fused Pallas composite kernel can target
    it directly.
    """
    n = x.shape[0]
    eye = jnp.tile(jnp.eye(2, 3, dtype=jnp.float32), (n, 1, 1))
    theta = eye.at[:, :, 2].add(translation.astype(jnp.float32))
    grid = affine_grid(theta, x.shape[1], x.shape[2])
    return grid_sample(x, grid, pad_value=pad_value)


def translate_to_theta(translation: jax.Array) -> jax.Array:
    """``[..., 2]`` translations → ``[..., 2, 3]`` affine matrices
    (reference contract: custom_utils/image_utils.py:316-335)."""
    shape = translation.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32), shape + (2, 3))
    return eye.at[..., :, 2].add(translation.astype(jnp.float32))
