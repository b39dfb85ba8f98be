"""Mosaic (Pallas) warp engine parity and exact-adjoint contracts.

Runs the kernels (ops/pallas/warp_kernel.py) in interpret mode on CPU with
``compute_dtype=float32`` so the ALGORITHM is checked tightly, separate from
the bf16 production operating point (whose error class equals the XLA
engine's ``precision=DEFAULT`` on TPU and is guarded end-to-end by the
bench's on-chip matmul-vs-gather selftest).  Oracles: the XLA engine at
HIGHEST precision (itself gather-parity-tested in test_affine_warp.py) and
its exact ``out``-tiled adjoint.

Reference contract being reimplemented: the ADA geometric branch's
``grid_sample(upsample2d(x, sym6), affine_grid(theta))``
(reference training/augment.py:331-339).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from montage_gan_tpu.ops import affine_warp as aw
from montage_gan_tpu.ops.filters import setup_filter
from montage_gan_tpu.ops.pallas.warp_kernel import (warp_forward_pallas,
                                                    warp_transpose_pallas)
from montage_gan_tpu.training.augment import WAVELETS

quick = pytest.mark.quick
slow = pytest.mark.slow

F_SYM6 = np.asarray(setup_filter(WAVELETS['sym6']))
TAPS = tuple(float(v) for v in F_SYM6)


def _thetas(n, seed=0, translate=0.125):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        s = 2.0 ** (rng.randn() * 0.2)
        an = 2.0 ** (rng.randn() * 0.2)
        th = rng.uniform(-np.pi, np.pi)
        t = rng.randn(2) * translate
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]])
        lin = rot @ np.diag([s * an, s / an])
        if i % 3 == 0:
            lin = lin @ np.array([[0.0, -1.0], [1.0, 0.0]])
        out.append(np.concatenate([lin, t[:, None]], axis=1))
    return jnp.asarray(np.stack(out), jnp.float32)


def _xla_ref(x, theta, out_h, out_w, tile, block, up, f):
    return aw._warp_tiled(
        aw._Spec(x.shape[0], x.shape[1], x.shape[2], x.shape[3],
                 out_h, out_w, tile, block, tile, block, 4, 4, up,
                 TAPS if up > 1 else None,
                 lax.Precision.HIGHEST, lax.Precision.HIGHEST),
        x.astype(jnp.float32), theta)


@quick
def test_mosaic_forward_matches_xla_engine():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (3, 60, 52, 4), jnp.float32)
    theta = _thetas(3)
    ref = _xla_ref(x, theta, 70, 66, 16, 32, 2, F_SYM6)
    with pltpu.force_tpu_interpret_mode():
        got = warp_forward_pallas(x, theta, 70, 66, tile=16, block=32,
                                  up=2, taps=TAPS,
                                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@quick
def test_mosaic_forward_plain_hat_and_tiny_canvas():
    key = jax.random.PRNGKey(1)
    theta = _thetas(2, seed=3)
    # plain bilinear (up=1, taps=None)
    x = jax.random.uniform(key, (2, 48, 40, 4), jnp.float32)
    ref = aw._warp_tiled(
        aw._Spec(2, 48, 40, 4, 56, 44, 16, 32, 16, 32, 4, 4, 1, None,
                 lax.Precision.HIGHEST, lax.Precision.HIGHEST),
        x, theta)
    with pltpu.force_tpu_interpret_mode():
        got = warp_forward_pallas(x, theta, 56, 44, tile=16, block=32,
                                  up=1, taps=None,
                                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # window covers the whole plane (block > both extents)
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 20, 24, 4),
                            jnp.float32)
    ref2 = _xla_ref(x2, theta[:1], 30, 26, 8, 64, 2, F_SYM6)
    with pltpu.force_tpu_interpret_mode():
        got2 = warp_forward_pallas(x2, theta[:1], 30, 26, tile=8, block=64,
                                   up=2, taps=TAPS,
                                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)


@quick
def test_mosaic_transpose_is_exact_adjoint():
    """<W x, g> == <x, Wᵀ g> for every theta (incl. magnifying ones that
    violate the XLA 'in' engine's coverage contract) — the property the
    Mosaic engine exists to make fast (VERDICT r4 #3)."""
    kx, kg = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.uniform(kx, (4, 44, 36, 4), jnp.float32)
    # strong magnification: |J⁻¹| large — out-of-contract for 'in'
    theta = jnp.concatenate([
        _thetas(2, seed=5),
        jnp.asarray([[[0.1, 0.0, 0.3], [0.0, 0.1, -0.2]],
                     [[0.05, -0.03, 0.0], [0.03, 0.05, 0.0]]],
                    jnp.float32)])
    g = jax.random.uniform(kg, (4, 52, 40, 4), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        wx = warp_forward_pallas(x, theta, 52, 40, tile=16, block=32,
                                 up=2, taps=TAPS,
                                 compute_dtype=jnp.float32)
        wtg = warp_transpose_pallas(g, theta, 44, 36, tile=16, block=32,
                                    up=2, taps=TAPS,
                                    compute_dtype=jnp.float32)
    lhs = float(jnp.vdot(wx, g))
    rhs = float(jnp.vdot(x, wtg))
    assert abs(lhs - rhs) <= 1e-5 * max(abs(lhs), 1.0), (lhs, rhs)


@quick
def test_mosaic_transpose_matches_xla_outtiled():
    """Same windows → same adjoint as the XLA exact ('out') engine."""
    kg = jax.random.PRNGKey(4)
    theta = _thetas(3, seed=7)
    g = jax.random.uniform(kg, (3, 52, 40, 4), jnp.float32)
    spec = aw._Spec(3, 44, 36, 4, 52, 40, 16, 32, 16, 32, 4, 4, 2, TAPS,
                    lax.Precision.HIGHEST, lax.Precision.HIGHEST)
    ref = aw._warp_transpose_outtiled(spec, g, theta)
    with pltpu.force_tpu_interpret_mode():
        got = warp_transpose_pallas(g, theta, 44, 36, tile=16, block=32,
                                    up=2, taps=TAPS,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@quick
def test_mosaic_kernels_under_f32_matmul_precision_context():
    """The augment pipe wraps everything in
    ``jax.default_matmul_precision('float32')`` (sub-pixel transform chains
    need f32) — the kernels' bf16 dots must pin their own precision or that
    context reaches Mosaic as HIGHEST-on-bf16 and fails to compile
    (regression: r5 on-chip bench, every geometry failed until the
    in-kernel dots carried explicit Precision.DEFAULT)."""
    kx = jax.random.PRNGKey(7)
    x = jax.random.uniform(kx, (2, 44, 36, 4), jnp.float32)
    theta = _thetas(2, seed=11)
    with pltpu.force_tpu_interpret_mode():
        ref = warp_forward_pallas(x, theta, 52, 40, tile=16, block=32,
                                  up=2, taps=TAPS,
                                  compute_dtype=jnp.float32)
        with jax.default_matmul_precision('float32'):
            got = warp_forward_pallas(x, theta, 52, 40, tile=16, block=32,
                                      up=2, taps=TAPS,
                                      compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@slow
def test_mosaic_engine_dispatch_and_gradients(monkeypatch):
    """The public ``affine_warp`` routed through MGT_WARP_ENGINE=mosaic:
    custom_vjp gradient and grad-of-grad (the R1 path, reference
    custom/loss_aio.py:168-179) must match the XLA engine."""
    monkeypatch.setenv('MGT_WARP_ENGINE', 'mosaic')
    monkeypatch.setenv('MGT_WARP_MOSAIC_DTYPE', 'float32')
    kx = jax.random.PRNGKey(5)
    x = jax.random.uniform(kx, (2, 44, 36, 4), jnp.float32)
    theta = _thetas(2, seed=9)

    def loss(xx):
        y = aw.affine_warp(xx, theta, 52, 40, tile=16, block=32,
                           up=2, up_filter=F_SYM6)
        return jnp.sum(y * y), y

    def gnorm(xx):
        (_, y), gx = jax.value_and_grad(loss, has_aux=True)(xx)
        return jnp.sum(gx * gx), (y, gx)

    with pltpu.force_tpu_interpret_mode():
        (_, (y_m, gx_m)), ggx_m = jax.value_and_grad(
            gnorm, has_aux=True)(x)
    monkeypatch.setenv('MGT_WARP_ENGINE', 'xla')
    monkeypatch.setenv('MGT_WARP_ADJOINT', 'out')
    (_, (y_r, gx_r)), ggx_r = jax.value_and_grad(gnorm, has_aux=True)(x)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_r),
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ggx_m), np.asarray(ggx_r),
                               rtol=1e-4, atol=2e-2)
