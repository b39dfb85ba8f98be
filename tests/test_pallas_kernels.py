"""Pallas kernel parity vs the XLA-composed reference paths (interpret mode
on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.ops.composite import translate_and_composite


def _interpret_pallas(monkeypatch_off=False):
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_translate_composite_kernel_matches_xla():
    from montage_gan_tpu.ops.pallas.composite_kernel import (
        translate_and_composite_pallas)

    rng = np.random.RandomState(0)
    layers = rng.rand(2, 5, 64, 64, 4).astype(np.float32)
    layers[:, 0, ..., 3] = 0.0  # exercise 0-alpha
    trans = rng.uniform(-0.9, 0.9, (2, 5, 2)).astype(np.float32)

    ref = translate_and_composite(jnp.asarray(layers), jnp.asarray(trans),
                                  pad_value=0.0, input_range='zero1')
    with _interpret_pallas():
        out = translate_and_composite_pallas(jnp.asarray(layers),
                                             jnp.asarray(trans),
                                             pad_value=0.0, tile_h=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_translate_composite_kernel_extreme_shifts():
    from montage_gan_tpu.ops.pallas.composite_kernel import (
        translate_and_composite_pallas)

    rng = np.random.RandomState(1)
    layers = rng.rand(1, 3, 32, 32, 4).astype(np.float32)
    trans = np.array([[[1.0, -1.0], [-1.0, 1.0], [0.0, 0.0]]], np.float32)

    ref = translate_and_composite(jnp.asarray(layers), jnp.asarray(trans),
                                  pad_value=0.0, input_range='zero1')
    with _interpret_pallas():
        out = translate_and_composite_pallas(jnp.asarray(layers),
                                             jnp.asarray(trans),
                                             pad_value=0.0, tile_h=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act,clamp", [("lrelu", None), ("tanh", 0.9),
                                       ("linear", 256.0)])
def test_bias_act_kernel_matches_reference_impl(act, clamp):
    from montage_gan_tpu.ops.bias_act import bias_act
    from montage_gan_tpu.ops.pallas.bias_act_kernel import bias_act_pallas

    rng = np.random.RandomState(2)
    x = rng.randn(4, 8, 8, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    ref = bias_act(jnp.asarray(x), jnp.asarray(b), act=act, clamp=clamp)
    with _interpret_pallas():
        out = bias_act_pallas(jnp.asarray(x), jnp.asarray(b), act=act,
                              clamp=clamp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    ref_nb = bias_act(jnp.asarray(x), None, act=act, clamp=clamp)
    with _interpret_pallas():
        out_nb = bias_act_pallas(jnp.asarray(x), None, act=act, clamp=clamp)
    np.testing.assert_allclose(np.asarray(out_nb), np.asarray(ref_nb),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Pallas upfirdn2d (separable passes) vs the XLA twin
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('up,down,padding', [
    (1, 1, 1),                  # filter2d-style
    (2, 1, (2, 1)),             # upsample2d geometry (fw=4, up=2)
    (1, 2, (1, 1)),             # downsample2d geometry
    (2, 2, (2, 1, 1, 2)),       # mixed, asymmetric pad
    (1, 1, (-1, 2, 2, -1)),     # negative padding (crop)
])
def test_upfirdn2d_pallas_matches_xla(up, down, padding):
    from montage_gan_tpu.ops.pallas.upfirdn2d_kernel import upfirdn2d_pallas
    from montage_gan_tpu.ops.filters import setup_filter
    from montage_gan_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 16, 8).astype(np.float32)
    f = setup_filter([1, 3, 3, 1], separable=True)
    assert f.ndim == 1  # separable

    ref = upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=padding,
                    gain=2.0)
    with _interpret_pallas():
        out = upfirdn2d_pallas(jnp.asarray(x), f, up=up, down=down,
                               padding=padding, gain=2.0)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('flip', [False, True])
def test_upfirdn2d_pallas_flip_and_odd_taps(flip):
    from montage_gan_tpu.ops.pallas.upfirdn2d_kernel import upfirdn2d_pallas
    from montage_gan_tpu.ops.filters import setup_filter
    from montage_gan_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(1)
    x = rng.randn(1, 9, 11, 4).astype(np.float32)
    f = setup_filter([1, 2, 1], separable=True)  # odd tap count

    ref = upfirdn2d(jnp.asarray(x), f, up=2, down=1, padding=(2, 1),
                    flip_filter=flip)
    with _interpret_pallas():
        out = upfirdn2d_pallas(jnp.asarray(x), f, up=2, down=1,
                               padding=(2, 1), flip_filter=flip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upfirdn2d_pallas_grads_match_xla():
    """1st and 2nd order grads via the linear-transpose VJP (the reference's
    backward-is-another-upfirdn2d identity, upfirdn2d.py:262-281)."""
    from montage_gan_tpu.ops.pallas.upfirdn2d_kernel import upfirdn2d_pallas
    from montage_gan_tpu.ops.filters import setup_filter
    from montage_gan_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    f = setup_filter([1, 3, 3, 1], separable=True)

    def loss_p(x):
        with _interpret_pallas():
            y = upfirdn2d_pallas(x, f, up=2, down=1, padding=(2, 1))
        return jnp.sum(jnp.sin(y) * y)

    def loss_x(x):
        y = upfirdn2d(x, f, up=2, down=1, padding=(2, 1))
        return jnp.sum(jnp.sin(y) * y)

    g_p = jax.grad(loss_p)(x)
    g_x = jax.grad(loss_x)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)

    # grad-of-grad (R1/PPL requirement, SURVEY.md §7.3.1)
    gg_p = jax.grad(lambda t: jnp.sum(jnp.square(jax.grad(loss_p)(t))))(x)
    gg_x = jax.grad(lambda t: jnp.sum(jnp.square(jax.grad(loss_x)(t))))(x)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x),
                               rtol=1e-4, atol=1e-4)


def test_upfirdn2d_pallas_nonseparable_fallback():
    from montage_gan_tpu.ops.pallas.upfirdn2d_kernel import upfirdn2d_pallas
    from montage_gan_tpu.ops.upfirdn2d import upfirdn2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    f2d = np.outer([1., 2., 1.], [1., 2., 1.]).astype(np.float32) / 16.0
    ref = upfirdn2d(x, f2d, padding=1)
    out = upfirdn2d_pallas(x, f2d, padding=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
