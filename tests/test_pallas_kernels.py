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
