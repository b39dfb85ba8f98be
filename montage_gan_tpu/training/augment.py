"""ADA augmentation pipeline ("Training GANs with Limited Data"), as a pure
jittable function.

Capability parity with the reference AugmentPipe
(reference: training/augment.py:156-482) including the MontageGAN RGBA
modification — the color matrix applies to RGB only, alpha passes through
(reference: training/augment.py:403-406).

TPU-first differences from the reference:
  * ``p`` is a traced scalar (on-device ADA state), the config multipliers are
    static floats — disabled stages compile away entirely.
  * The geometric branch uses a STATIC reflect-pad margin instead of the
    reference's data-dependent margin (training/augment.py:311-326), which is
    dynamic-shape-hostile.  The reference computes the margin as exactly the
    maximum sampling reach (clamped to size-1), so any static margin ≥ that
    reach is *equivalent*; beyond the margin both give zeros.  Default
    ``geom_margin=None`` picks size//4 + filter support, covering all but
    extreme joint draws (those read zeros, as the reference's clamp case
    does).  Set geom_margin=size-1 for the exact worst-case superset.
  * Per-sample image filters are applied with a batched depthwise separable
    conv (vmapped), not torch's groups=B*C fold.

All functions take an explicit PRNG key; transform selection matches the
reference's probability gating exactly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.filters import setup_filter
from ..ops.grid_sample import grid_sample
from ..ops.upfirdn2d import downsample2d, upsample2d

# Standard wavelet low-pass decomposition coefficients (public constants, cf.
# Daubechies, "Ten Lectures on Wavelets"; identical values in pywt).
WAVELETS = {
    'haar': [0.7071067811865476, 0.7071067811865476],
    'sym2': [-0.12940952255092145, 0.22414386804185735,
             0.836516303737469, 0.48296291314469025],
    'sym6': [0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
             -0.048311742585633, 0.4910559419267466, 0.787641141030194,
             0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
             0.04472490177066578, 0.0017677118642428036, -0.007800708325034148],
}


# ---------------------------------------------------------------------------
# Batched homogeneous-matrix helpers (cf. reference training/augment.py:67-146)
# ---------------------------------------------------------------------------

def _rows(*rows):
    """Stack rows of (possibly batched) scalars into [..., R, C] matrices."""
    elems = [jnp.asarray(e, dtype=jnp.float32) for row in rows for e in row]
    shape = jnp.broadcast_shapes(*[e.shape for e in elems])
    elems = [jnp.broadcast_to(e, shape) for e in elems]
    m = jnp.stack(elems, axis=-1)
    return m.reshape(shape + (len(rows), len(rows[0])))


def translate2d(tx, ty):
    o, i = jnp.zeros_like(jnp.asarray(tx, jnp.float32)), jnp.ones_like(jnp.asarray(tx, jnp.float32))
    return _rows([i, o, tx], [o, i, ty], [o, o, i])


def scale2d(sx, sy):
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    o = jnp.zeros_like(sx)
    i = jnp.ones_like(sx)
    return _rows([sx, o, o], [o, sy, o], [o, o, i])


def rotate2d(theta):
    theta = jnp.asarray(theta, jnp.float32)
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, i = jnp.zeros_like(c), jnp.ones_like(c)
    return _rows([c, -s, o], [s, c, o], [o, o, i])


def translate3d(tx, ty, tz):
    tx = jnp.asarray(tx, jnp.float32)
    o, i = jnp.zeros_like(tx), jnp.ones_like(tx)
    return _rows([i, o, o, tx], [o, i, o, ty], [o, o, i, tz], [o, o, o, i])


def scale3d(sx, sy, sz):
    sx = jnp.asarray(sx, jnp.float32)
    o, i = jnp.zeros_like(sx), jnp.ones_like(sx)
    return _rows([sx, o, o, o], [o, sy, o, o], [o, o, sz, o], [o, o, o, i])


def rotate3d(v, theta):
    vx, vy, vz = v[0], v[1], v[2]
    theta = jnp.asarray(theta, jnp.float32)
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    o, i = jnp.zeros_like(c), jnp.ones_like(c)
    return _rows(
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, o],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, o],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, o],
        [o, o, o, i])


def translate2d_inv(tx, ty):
    return translate2d(-tx, -ty)


def scale2d_inv(sx, sy):
    return scale2d(1.0 / sx, 1.0 / sy)


def rotate2d_inv(theta):
    return rotate2d(-theta)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers and parameter ranges
    (field-for-field the reference AugmentPipe ctor, training/augment.py:157-204)."""
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    geom_margin: Optional[int] = None  # static reflect margin; None = auto

    @property
    def any_blit(self):
        return self.xflip > 0 or self.rotate90 > 0 or self.xint > 0

    @property
    def any_geom(self):
        return self.scale > 0 or self.rotate > 0 or self.aniso > 0 or self.xfrac > 0


# The reference's augpipe presets (reference: train_aio.py:307-323).
AUGPIPE_SPECS = {
    'blit': dict(xflip=1, rotate90=1, xint=1),
    'geom': dict(scale=1, rotate=1, aniso=1, xfrac=1),
    'color': dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    'filter': dict(imgfilter=1),
    'noise': dict(noise=1),
    'cutout': dict(cutout=1),
    'bg': dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1),
    'bgc': dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    'bgcf': dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                 xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                 saturation=1, imgfilter=1),
    'bgcfn': dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                  xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1, imgfilter=1, noise=1),
    'bgcfnc': dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                   xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                   saturation=1, imgfilter=1, noise=1, cutout=1),
}


def make_augment_config(spec: str, **overrides) -> AugmentConfig:
    return AugmentConfig(**{**AUGPIPE_SPECS[spec], **overrides})


def _make_fbank() -> np.ndarray:
    """4-band filter bank from sym2 (reference: training/augment.py:210-219)."""
    hz_lo = np.asarray(WAVELETS['sym2'])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(fbank.shape[0], -1)[:, :-1]
        fbank = np.stack([np.convolve(row, hz_lo2) for row in fbank])
        fbank[i, (fbank.shape[1] - hz_hi2.size) // 2:
                 (fbank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return fbank.astype(np.float32)


_HZ_FBANK = _make_fbank()
_HZ_GEOM = setup_filter(WAVELETS['sym6'])


def _toeplitz_rows(f: jax.Array, n_out: int) -> jax.Array:
    """Per-sample banded correlation matrices from 1-D filters.

    ``f``: ``[B, taps]`` → ``[B, n_out, n_out + taps − 1]`` with
    ``M[b, i, i + t] = f[b, t]`` — so ``M @ x_padded`` equals a VALID
    correlation of ``x`` reflect-padded by ``taps//2`` (odd taps).

    Built with the tile/slice/reshape Toeplitz trick (no gather, no big
    static constants): tiling ``[f, 0⋯0]`` (length taps+n_out) n_out times
    and reshaping to rows of length taps+n_out−1 shifts each row by one.

    Rationale: the reference applies the per-sample ADA filters as grouped
    depthwise convs (training/augment.py:442-451); on TPU that lowering
    (vmap → batch·C feature groups, 43-tap kernels) measured ~12 ms per
    256² call (r5 op-profile) while this banded-matmul form runs on the
    MXU in well under 1 ms for the same exact linear operator.
    """
    b, taps = f.shape
    width = n_out + taps - 1
    c = jnp.concatenate([f, jnp.zeros((b, n_out), f.dtype)], axis=1)
    s = jnp.tile(c, (1, n_out))[:, :n_out * width]
    return s.reshape(b, n_out, width)


def _down2_matrix(n_in: int, dtype=np.float32) -> np.ndarray:
    """Static ``[n_out, n_in]`` matrix of the geometric branch's trailing
    ``downsample2d(f=_HZ_GEOM, down=2, padding=−2·hz_pad, flip_filter=True)``
    along one axis: ``out[q] = Σ_j f[j] · x[2q + j − p0]`` with the upfirdn
    pad algebra ``p0 = padding + (taps − down + 1)//2``
    (ops/upfirdn2d.py:190-199; reference torch_utils/ops/upfirdn2d.py:
    367-401).  Exact same linear operator as the conv path; as a pair of
    axis matmuls it avoids the conv path's internal pad and the C=4 NHWC
    depthwise lowering (~7 ms fwd+bwd per 256² call, r5 op-profile).
    """
    f = np.asarray(_HZ_GEOM, np.float32)
    taps = int(f.shape[0])
    hz_pad = taps // 4
    p0 = -2 * hz_pad + (taps - 2 + 1) // 2
    n_out = (n_in + 2 * p0 - taps) // 2 + 1
    D = np.zeros((n_out, n_in), dtype)
    for q in range(n_out):
        for j in range(taps):
            s = 2 * q + j - p0
            if 0 <= s < n_in:
                D[q, s] += f[j]
    return D

# Matmul-warp engine knobs for the geometric branch (ops/affine_warp.py),
# the swept optimum at the 256-px ADA shape on a v5e (see the call site
# below for the coverage contract at these values).  Module-level so the
# on-chip sweep tool (docs/tools/warp_sweep.py) can override them before
# tracing; static at trace time.
# 2026-08-20 extended sweep at the 256-px ADA shape (docs/tools/
# warp_sweep.py 256 256 16, v5e): fwd 30.6 / fwd+bwd 103.7 / gg 201.0 ms,
# −5% score vs the round-3 optimum (tile 32/block 64, tile_t 32/block_t
# 160: 31.9/108.9/209.0).  Coverage bounds at the new values are
# equal-or-better: transpose |J⁻¹| ≤ 128/(2·23+13) = 2.17 (was 2.13),
# forward |J| ≤ (96−13)·2/48 = 3.46 (was 3.19).
# 2026-08-21 r4 sweep adds weight_precision=DEFAULT (single-pass bf16
# weight-build matmul): fwd 26.1 / fwd+bwd 84.8 / gg 159.8 ms — −17%
# score at the same tiles; every tile/block alternative re-lost at the
# new precision.  Weight error ~0.4% relative — noise-level against the
# pipe's own corruption stages; end-to-end guarded by the bench's on-chip
# matmul-vs-gather selftest.
WARP_TUNE = dict(tile=48, block=96, tile_t=24, block_t=128,
                 chunk=32, chunk_t=24, precision=jax.lax.Precision.DEFAULT,
                 weight_precision=jax.lax.Precision.DEFAULT)

# Per-input-geometry overrides (keyed by the (H, W) of the image entering
# the pipe — the per-layer local-D crop shapes, reference
# custom/dataset_aio.py:30-83).  Populate from
# `python docs/tools/warp_sweep.py H W` runs on the target part.
# v5e conclusion (r4 sweeps, all six production geometries): the base
# WARP_TUNE tiles win at every geometry — the only winning lever was
# weight_precision=DEFAULT (−17–24% score everywhere), which lives in the
# base dict above — so this table is INTENTIONALLY EMPTY on v5e.  Other
# parts (v5p/v6e VMEM and MXU shapes differ) should re-sweep.
WARP_TUNE_BY_GEOM: dict = {}


def _warp_tune_for(height: int, width: int) -> dict:
    return {**WARP_TUNE, **WARP_TUNE_BY_GEOM.get((height, width), {})}


# ---------------------------------------------------------------------------
# The pipeline
# ---------------------------------------------------------------------------

def augment_pipe(images: jax.Array,
                 p: jax.Array,
                 key: jax.Array,
                 cfg: AugmentConfig,
                 debug_percentile: Optional[float] = None) -> jax.Array:
    """Apply the ADA pipeline to NHWC images with overall probability ``p``.

    ``p`` may be a traced scalar; ``cfg`` is static.  ``debug_percentile``
    (static float) replaces all random draws with fixed quantiles for
    deterministic testing (reference: training/augment.py:225-226 etc.).
    """
    # The 3×3/4×4 transform chains are numerically load-bearing (sub-pixel
    # alignment); force f32 matmuls — on TPU the default would be bf16.
    with jax.default_matmul_precision('float32'):
        return _augment_pipe(images, p, key, cfg, debug_percentile)


def _key_stream(key):
    import itertools
    return iter(jax.random.fold_in(key, i) for i in itertools.count())


def gate(k, prob, value, identity):
    take = jax.random.uniform(k, [value.shape[0]]) < prob
    return jnp.where(take.reshape([-1] + [1] * (value.ndim - 1)), value,
                     identity)


def _sample_geom_inverse(keys, p, cfg, batch, height, width, dp):
    """Sample the composed inverse homography of the pixel-blit + geometric
    sections (reference training/augment.py:237-303) — factored out so the
    warp coverage test measures the TRUE production theta law
    (tests/test_affine_warp.py) from the same code and RNG stream the pipe
    uses."""
    G_inv = jnp.tile(jnp.eye(3, dtype=jnp.float32), (batch, 1, 1))

    if cfg.xflip > 0:
        i = jnp.floor(jax.random.uniform(next(keys), [batch]) * 2)
        i = gate(next(keys), cfg.xflip * p, i, jnp.zeros_like(i))
        if dp is not None:
            i = jnp.full_like(i, np.floor(dp * 2))
        G_inv = G_inv @ scale2d_inv(1 - 2 * i, jnp.ones_like(i))
    if cfg.rotate90 > 0:
        i = jnp.floor(jax.random.uniform(next(keys), [batch]) * 4)
        i = gate(next(keys), cfg.rotate90 * p, i, jnp.zeros_like(i))
        if dp is not None:
            i = jnp.full_like(i, np.floor(dp * 4))
        G_inv = G_inv @ rotate2d_inv(-np.pi / 2 * i)
    if cfg.xint > 0:
        t = (jax.random.uniform(next(keys), [batch, 2]) * 2 - 1) * cfg.xint_max
        t = gate(next(keys), cfg.xint * p, t, jnp.zeros_like(t))
        if dp is not None:
            t = jnp.full_like(t, (dp * 2 - 1) * cfg.xint_max)
        G_inv = G_inv @ translate2d_inv(jnp.round(t[:, 0] * width),
                                        jnp.round(t[:, 1] * height))
    if cfg.scale > 0:
        s = jnp.exp2(jax.random.normal(next(keys), [batch]) * cfg.scale_std)
        s = gate(next(keys), cfg.scale * p, s, jnp.ones_like(s))
        if dp is not None:
            s = jnp.full_like(s, np.exp2(_erfinv(dp * 2 - 1) * cfg.scale_std))
        G_inv = G_inv @ scale2d_inv(s, s)
    p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
    if cfg.rotate > 0:
        theta = ((jax.random.uniform(next(keys), [batch]) * 2 - 1)
                 * np.pi * cfg.rotate_max)
        theta = gate(next(keys), p_rot, theta, jnp.zeros_like(theta))
        if dp is not None:
            theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.rotate_max)
        G_inv = G_inv @ rotate2d_inv(-theta)
    if cfg.aniso > 0:
        s = jnp.exp2(jax.random.normal(next(keys), [batch]) * cfg.aniso_std)
        s = gate(next(keys), cfg.aniso * p, s, jnp.ones_like(s))
        if dp is not None:
            s = jnp.full_like(s, np.exp2(_erfinv(dp * 2 - 1) * cfg.aniso_std))
        G_inv = G_inv @ scale2d_inv(s, 1 / s)
    if cfg.rotate > 0:
        theta = ((jax.random.uniform(next(keys), [batch]) * 2 - 1)
                 * np.pi * cfg.rotate_max)
        theta = gate(next(keys), p_rot, theta, jnp.zeros_like(theta))
        if dp is not None:
            theta = jnp.zeros_like(theta)
        G_inv = G_inv @ rotate2d_inv(-theta)
    if cfg.xfrac > 0:
        t = jax.random.normal(next(keys), [batch, 2]) * cfg.xfrac_std
        t = gate(next(keys), cfg.xfrac * p, t, jnp.zeros_like(t))
        if dp is not None:
            t = jnp.full_like(t, _erfinv(dp * 2 - 1) * cfg.xfrac_std)
        G_inv = G_inv @ translate2d_inv(t[:, 0] * width, t[:, 1] * height)
    return G_inv


def _warp_geometry(cfg: AugmentConfig, height: int, width: int):
    """Static plane geometry of the geometric branch: reflect margins,
    padded input size, and warp output size."""
    hz_pad = _HZ_GEOM.shape[0] // 4
    # per-axis margins: non-square inputs (the local-D layer crops) need
    # the height margin sized by height — a width-derived margin would
    # under-reflect vertically and read pad zeros where the reference's
    # data-dependent margin reflects real content (augment.py:311-326)
    mx, my = cfg.geom_margin, cfg.geom_margin
    if mx is None:
        mx = min(width // 4 + hz_pad * 2, width - 1)
        my = min(height // 4 + hz_pad * 2, height - 1)
    # output grid over the (unpadded-size + filter support) ×2 canvas,
    # sampled from the ×2-upsampled padded plane
    out_h, out_w = (height + hz_pad * 2) * 2, (width + hz_pad * 2) * 2
    return hz_pad, mx, my, height + 2 * my, width + 2 * mx, out_h, out_w


def _normalize_geom_matrix(G_inv, batch, pad_h, pad_w, out_h, out_w):
    """Rescale the unit-square homography into the normalized affine_grid
    convention over the ×2-upsampled padded plane (the warp's theta)."""
    G = scale2d(2.0, 2.0)[None] @ G_inv @ scale2d_inv(2.0, 2.0)[None]
    G = translate2d(-0.5, -0.5)[None] @ G @ translate2d_inv(-0.5, -0.5)[None]
    G = G.reshape(batch, 3, 3)
    in_h, in_w = pad_h * 2, pad_w * 2
    return (scale2d(2.0 / in_w, 2.0 / in_h).reshape(1, 3, 3) @ G
            @ scale2d_inv(2.0 / out_w, 2.0 / out_h).reshape(1, 3, 3))


def sample_warp_theta(key, p, cfg: AugmentConfig, batch: int,
                      height: int, width: int):
    """The exact theta distribution reaching the geometric-branch warp call
    for ``[batch, height, width, C]`` inputs at augment probability ``p`` —
    same sampling code and RNG stream as the pipe itself.  Returns
    ``(theta [B,2,3], pad_h, pad_w, out_h, out_w)`` where pad_* is the
    stored (reflect-padded, 1×) plane the warp reads.  Used by the coverage
    contract measurement (tests/test_affine_warp.py)."""
    keys = _key_stream(key)
    G_inv = _sample_geom_inverse(keys, p, cfg, batch, height, width, None)
    _, _, _, pad_h, pad_w, out_h, out_w = _warp_geometry(cfg, height, width)
    G = _normalize_geom_matrix(G_inv, batch, pad_h, pad_w, out_h, out_w)
    return G[:, :2, :], pad_h, pad_w, out_h, out_w


def _augment_pipe(images, p, key, cfg, debug_percentile):
    batch, height, width, num_channels = images.shape
    keys = _key_stream(key)
    dp = debug_percentile

    # ----------------------- pixel blitting + geometric ------------------
    have_geom = cfg.any_blit or cfg.any_geom
    G_inv = _sample_geom_inverse(keys, p, cfg, batch, height, width, dp)

    if have_geom:
        hz_pad, mx, my, pad_h, pad_w, out_h, out_w = _warp_geometry(
            cfg, height, width)
        # reflect-pad (symmetric static margin ⇒ no origin shift)
        x = jnp.pad(images, [(0, 0), (my, my), (mx, mx), (0, 0)],
                    mode='reflect')
        G = _normalize_geom_matrix(G_inv, batch, pad_h, pad_w, out_h, out_w)
        from ..ops.affine_warp import (affine_warp, coverage_excess,
                                       use_matmul_warp)
        from ..ops.grid_sample import affine_grid

        def _gather_warp(xx):
            xx = upsample2d(xx, _HZ_GEOM, up=2)
            grid = affine_grid(G[:, :2, :], out_h, out_w)
            return grid_sample(xx, grid)

        if use_matmul_warp():
            # Dense-matmul warp engine with the ×2 upsample fused into the
            # sampling kernel (exact — see ops/affine_warp.py): the warp
            # reads the 1× padded plane directly.  On TPU this resolves to
            # the Mosaic kernels (ops/pallas/warp_kernel.py, r5 default —
            # 33.6 vs 69.1 ms fwd+bwd at this 256px shape) whose adjoint is
            # EXACT for every theta, so no transpose-side coverage contract
            # applies in production.  The XLA engine (CPU / MGT_WARP_ENGINE
            # =xla) keeps the measured 'in'-adjoint contract (|J⁻¹| ≤
            # ~2.13: 0.24% of draws at the production ceiling p=0.6 lose
            # bounded gradient mass — ops/affine_warp.py docstring);
            # MGT_WARP_ADJOINT=out selects its exact adjoint (~27% slower).
            # The forward bound (|J| ≤ ~3.5, 0 violations in 1e5 draws)
            # applies to all engines.
            tune = _warp_tune_for(height, width)
            if os.environ.get('MGT_WARP_GUARD', '0') == '1':
                # Runtime escape hatch for out-of-contract thetas: when any
                # sample in the batch exceeds a coverage bound, the whole
                # batch falls back to the exact gather path for this call.
                # Only meaningful under the default MGT_WARP_ADJOINT=in
                # engine (the out-tiled adjoint never drops mass).
                # Off by default: expected batch-gradient corruption is
                # ~1e-6, while the guard makes ~4-13% of batches (batch
                # 16-32 at p≥0.6) pay the ~10× gather cost and compiles
                # the gather VJP chain into every D program; for exact
                # grads at lower cost use MGT_WARP_ADJOINT=out instead.
                fwd_ex, bwd_ex = coverage_excess(
                    G[:, :2, :], x.shape[1], x.shape[2], out_h, out_w,
                    tile=tune['tile'], block=tune['block'],
                    tile_t=tune['tile_t'], block_t=tune['block_t'],
                    up=2, n_taps=int(_HZ_GEOM.shape[0]))
                violated = jnp.any((fwd_ex > 0) | (bwd_ex > 0))
                x = jax.lax.cond(
                    violated, _gather_warp,
                    lambda xx: affine_warp(xx, G[:, :2, :], out_h, out_w,
                                           up=2, up_filter=_HZ_GEOM,
                                           **tune),
                    x)
            else:
                x = affine_warp(x, G[:, :2, :], out_h, out_w,
                                up=2, up_filter=_HZ_GEOM, **tune)
        else:
            x = _gather_warp(x)
        if os.environ.get('MGT_AUG_DOWN_IMPL', 'matmul') == 'matmul':
            Dy = jnp.asarray(_down2_matrix(out_h))
            Dx = Dy if out_w == out_h else jnp.asarray(_down2_matrix(out_w))
            t = jnp.einsum('qh,nhwc->nqwc', Dy, x)
            images = jnp.einsum('rw,nqwc->nqrc', Dx, t)
        else:
            images = downsample2d(x, _HZ_GEOM, down=2, padding=-hz_pad * 2,
                                  flip_filter=True)

    # ------------------------------ color --------------------------------
    have_color = (cfg.brightness > 0 or cfg.contrast > 0 or cfg.lumaflip > 0
                  or cfg.hue > 0 or cfg.saturation > 0)
    if have_color:
        I4 = jnp.eye(4, dtype=jnp.float32)
        C = jnp.tile(I4, (batch, 1, 1))
        if cfg.brightness > 0:
            b = jax.random.normal(next(keys), [batch]) * cfg.brightness_std
            b = gate(next(keys), cfg.brightness * p, b, jnp.zeros_like(b))
            if dp is not None:
                b = jnp.full_like(b, _erfinv(dp * 2 - 1) * cfg.brightness_std)
            C = translate3d(b, b, b) @ C
        if cfg.contrast > 0:
            c = jnp.exp2(jax.random.normal(next(keys), [batch]) * cfg.contrast_std)
            c = gate(next(keys), cfg.contrast * p, c, jnp.ones_like(c))
            if dp is not None:
                c = jnp.full_like(c, np.exp2(_erfinv(dp * 2 - 1) * cfg.contrast_std))
            C = scale3d(c, c, c) @ C
        v = np.asarray([1, 1, 1, 0], dtype=np.float32) / np.sqrt(3)
        vv = jnp.asarray(np.outer(v, v))
        if cfg.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), [batch, 1, 1]) * 2)
            i = gate(next(keys), cfg.lumaflip * p, i, jnp.zeros_like(i))
            if dp is not None:
                i = jnp.full_like(i, np.floor(dp * 2))
            C = (I4[None] - 2 * vv[None] * i) @ C  # Householder reflection
        if cfg.hue > 0 and num_channels > 1:
            theta = (jax.random.uniform(next(keys), [batch]) * 2 - 1) * np.pi * cfg.hue_max
            theta = gate(next(keys), cfg.hue * p, theta, jnp.zeros_like(theta))
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.hue_max)
            C = rotate3d(v, theta) @ C
        if cfg.saturation > 0 and num_channels > 1:
            s = jnp.exp2(jax.random.normal(next(keys), [batch, 1, 1]) * cfg.saturation_std)
            s = gate(next(keys), cfg.saturation * p, s, jnp.ones_like(s))
            if dp is not None:
                s = jnp.full_like(s, np.exp2(_erfinv(dp * 2 - 1) * cfg.saturation_std))
            C = (vv[None] + (I4[None] - vv[None]) * s) @ C

        flat = images.reshape(batch, height * width, num_channels)
        if num_channels == 4:
            # RGBA: matrix on RGB only, alpha passthrough
            # (MontageGAN modification, reference training/augment.py:403-406)
            rgb = jnp.einsum('nab,npb->npa', C[:, :3, :3], flat[..., :3]) \
                + C[:, None, :3, 3]
            flat = jnp.concatenate([rgb, flat[..., 3:]], axis=-1)
        elif num_channels == 3:
            flat = jnp.einsum('nab,npb->npa', C[:, :3, :3], flat) + C[:, None, :3, 3]
        elif num_channels == 1:
            Cm = jnp.mean(C[:, :3, :], axis=1, keepdims=True)  # [B,1,4]
            flat = flat * jnp.sum(Cm[:, :, :3], axis=2, keepdims=True) + Cm[:, :, 3:]
        else:
            raise ValueError('images must have 1, 3, or 4 channels')
        images = flat.reshape(batch, height, width, num_channels)

    # -------------------------- image-space filtering --------------------
    if cfg.imgfilter > 0:
        num_bands = _HZ_FBANK.shape[0]
        assert len(cfg.imgfilter_bands) == num_bands
        expected_power = np.array([10, 1, 1, 1], dtype=np.float32) / 13

        g = jnp.ones([batch, num_bands])
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(next(keys), [batch]) * cfg.imgfilter_std)
            t_i = gate(next(keys), cfg.imgfilter * p * band_strength,
                       t_i, jnp.ones_like(t_i))
            if dp is not None:
                t_i = (jnp.full_like(t_i, np.exp2(_erfinv(dp * 2 - 1) * cfg.imgfilter_std))
                       if band_strength > 0 else jnp.ones_like(t_i))
            t = jnp.ones([batch, num_bands]).at[:, i].set(t_i)
            # normalize overall power (reference: training/augment.py:437)
            t = t / jnp.sqrt(jnp.sum(expected_power[None] * jnp.square(t),
                                     axis=-1, keepdims=True))
            g = g * t

        hz_prime = g @ jnp.asarray(_HZ_FBANK)  # [B, taps]
        taps = _HZ_FBANK.shape[1]
        assert taps % 2 == 1
        pad = taps // 2
        x = jnp.pad(images, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                    mode='reflect')

        if os.environ.get('MGT_AUG_FILTER_IMPL', 'matmul') == 'matmul':
            # per-sample banded-matmul form of the separable correlation
            # (exact same operator as the conv path — see _toeplitz_rows)
            My = _toeplitz_rows(hz_prime, height)
            Mx = My if width == height else _toeplitz_rows(hz_prime, width)
            t = jnp.einsum('nqh,nhwc->nqwc', My, x)
            images = jnp.einsum('nrw,nqwc->nqrc', Mx, t)
        else:
            def filt_one(img, f1d):
                # depthwise separable correlation, per-sample 1-D filter
                kx = jnp.tile(f1d[None, :, None, None],
                              (1, 1, 1, num_channels))
                ky = jnp.tile(f1d[:, None, None, None],
                              (1, 1, 1, num_channels))
                y = lax.conv_general_dilated(
                    img[None], kx, (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=num_channels)
                y = lax.conv_general_dilated(
                    y, ky, (1, 1), 'VALID',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=num_channels)
                return y[0]

            images = jax.vmap(filt_one)(x, hz_prime)

    # -------------------------- corruptions ------------------------------
    if cfg.noise > 0:
        sigma = jnp.abs(jax.random.normal(next(keys), [batch, 1, 1, 1])) * cfg.noise_std
        sigma = gate(next(keys), cfg.noise * p, sigma, jnp.zeros_like(sigma))
        if dp is not None:
            sigma = jnp.full_like(sigma, _erfinv(dp) * cfg.noise_std)
        images = images + jax.random.normal(
            next(keys), (batch, height, width, num_channels)) * sigma

    if cfg.cutout > 0:
        size = jnp.full([batch, 2], cfg.cutout_size)
        keep = jax.random.uniform(next(keys), [batch, 1]) < cfg.cutout * p
        size = jnp.where(keep, size, jnp.zeros_like(size))
        center = jax.random.uniform(next(keys), [batch, 2])
        if dp is not None:
            size = jnp.full_like(size, cfg.cutout_size)
            center = jnp.full_like(center, dp)
        coord_x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
        coord_y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
        mask_x = (jnp.abs(coord_x[None, None, :] - center[:, 0, None, None])
                  >= size[:, 0, None, None] / 2)
        mask_y = (jnp.abs(coord_y[None, :, None] - center[:, 1, None, None])
                  >= size[:, 1, None, None] / 2)
        mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
        images = images * mask[..., None]

    return images


def _erfinv(x: float) -> float:
    from scipy.special import erfinv as _e  # only used for debug percentiles
    return float(_e(x))
