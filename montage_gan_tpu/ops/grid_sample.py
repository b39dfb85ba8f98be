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
    only theta.  On TPU it dispatches to the dense-matmul engine
    (``translate_sample_matmul``) — per-pixel gathers and their scatter-add
    VJPs are catastrophic on TPU, and unlike ``ops.affine_warp`` (which
    stop-gradients theta) the STN needs d/d-translation, which the matmul
    form provides through the hat weights.  ``MGT_WARP_IMPL`` overrides
    (``matmul`` | ``gather`` | ``auto``)."""
    from .affine_warp import use_matmul_warp
    if use_matmul_warp():
        return translate_sample_matmul(x, translation, pad_value=pad_value)
    n = x.shape[0]
    eye = jnp.tile(jnp.eye(2, 3, dtype=jnp.float32), (n, 1, 1))
    theta = eye.at[:, :, 2].add(translation.astype(jnp.float32))
    grid = affine_grid(theta, x.shape[1], x.shape[2])
    return grid_sample(x, grid, pad_value=pad_value)


def translate_sample_matmul(x: jax.Array, translation: jax.Array,
                            pad_value: float = 0.0) -> jax.Array:
    """``translate_sample`` as two dense MXU matmuls — differentiable in BOTH
    ``x`` and ``translation``.

    A pure translation shifts every sampling coordinate of axis a by the same
    per-sample offset ``δ_a = t_a · extent_a/2`` (pixel units; from the
    affine_grid algebra ``ix_j = j + δx``), so bilinear sampling factorizes
    into separable hat-kernel weight matrices

        Wy[n, k, i] = hat(k + δy_n − i),   Wx[n, l, j] = hat(l + δx_n − j),
        out = Wy @ x @ Wxᵀ    (per sample, per channel),

    with ``hat(d) = max(0, 1 − |d|)``.  Each row has ≤2 nonzeros but a dense
    [S, S] matmul on the MXU beats the per-pixel gather by ~an order of
    magnitude on TPU, and every derivative — d/dx (the transposed matmuls),
    d/dt (through the piecewise-linear hat), and R1/PL grad-of-grad — is
    again matmuls, replacing the gather path's scatter-add VJP.  This is the
    gradient-carrying sibling of ``ops.affine_warp`` (whose theta is RNG-
    derived and stop-gradient); the STN trains its translations through this
    op (reference: fukuwarai/networks.py:195-222 regresses theta and
    backprops through grid_sample).

    Out-of-bounds taps get zero hat weight (== the gather path's masked
    fill); ``pad_value`` is restored exactly via the separable coverage
    ``(ΣᵢWy)·(ΣⱼWx)``: ``out += pad_value · (1 − coverage)``.

    Numerics: weights and accumulation in f32 with HIGHEST matmul precision
    (sub-pixel placement breaks under bf16 contraction — the same rule as
    the affine grids, docs/GAPS.md).  Parity with the gather path is pinned
    in tests/test_ops_parity.py.
    """
    n, h, w, c = x.shape
    t = translation.astype(jnp.float32)
    dy = t[:, 1] * (h * 0.5)                     # [N] pixel shifts
    dx = t[:, 0] * (w * 0.5)

    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)

    def hat(d):
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))

    wy = hat(iy[None, :, None] + dy[:, None, None] - iy[None, None, :])
    wx = hat(ix[None, :, None] + dx[:, None, None] - ix[None, None, :])

    xf = x.astype(jnp.float32)
    z = jnp.einsum('nki,nijc->nkjc', wy, xf,
                   precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum('nlj,nkjc->nklc', wx, z,
                     precision=jax.lax.Precision.HIGHEST)

    if pad_value != 0.0:
        cov = (jnp.sum(wy, axis=-1)[:, :, None]
               * jnp.sum(wx, axis=-1)[:, None, :])          # [N, H, W]
        out = out + jnp.float32(pad_value) * (1.0 - cov)[..., None]
    return out.astype(x.dtype)


def translate_to_theta(translation: jax.Array) -> jax.Array:
    """``[..., 2]`` translations → ``[..., 2, 3]`` affine matrices
    (reference contract: custom_utils/image_utils.py:316-335)."""
    shape = translation.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(2, 3, dtype=jnp.float32), shape + (2, 3))
    return eye.at[..., :, 2].add(translation.astype(jnp.float32))
