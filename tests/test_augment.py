"""ADA augmentation pipeline parity vs the reference AugmentPipe.

Uses the reference's own deterministic ``debug_percentile`` mode
(reference: training/augment.py:225-226) so both pipelines apply identical
fixed transforms; random-draw stages (noise) are excluded from exact
comparisons and checked statistically instead.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.training.augment import (AUGPIPE_SPECS, AugmentConfig,
                                              augment_pipe, make_augment_config)

torch = pytest.importorskip("torch")


def run_ref(x_nchw, spec_kwargs, p, dp):
    from training.augment import AugmentPipe
    pipe = AugmentPipe(**spec_kwargs)
    pipe.p.copy_(torch.as_tensor(float(p)))
    with torch.no_grad():
        y = pipe(torch.from_numpy(x_nchw), debug_percentile=dp)
    return y.numpy()


@pytest.mark.reference
@pytest.mark.parametrize("spec", ["blit", "geom", "color", "filter", "cutout",
                                  "bgcf"])
@pytest.mark.parametrize("dp", [0.35, 0.62])
def test_augment_parity_debug_mode(spec, dp):
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, size=(2, 64, 64, 4)).astype(np.float32)

    cfg = make_augment_config(spec)
    y = augment_pipe(jnp.asarray(x), jnp.asarray(0.5), jax.random.PRNGKey(0),
                     cfg, debug_percentile=dp)

    y_ref = run_ref(np.ascontiguousarray(x.transpose(0, 3, 1, 2)),
                    AUGPIPE_SPECS[spec], 0.5, dp)
    y_ref = y_ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=2e-3)


@pytest.mark.reference
def test_augment_rgb3_parity():
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    cfg = make_augment_config("color")
    y = augment_pipe(jnp.asarray(x), jnp.asarray(0.8), jax.random.PRNGKey(0),
                     cfg, debug_percentile=0.7)
    y_ref = run_ref(np.ascontiguousarray(x.transpose(0, 3, 1, 2)),
                    AUGPIPE_SPECS["color"], 0.8, 0.7).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=2e-3)


def test_augment_alpha_passthrough():
    """RGBA color transforms must not touch alpha
    (MontageGAN modification, reference training/augment.py:403-406)."""
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, size=(4, 16, 16, 4)).astype(np.float32)
    cfg = make_augment_config("color")
    y = augment_pipe(jnp.asarray(x), jnp.asarray(1.0), jax.random.PRNGKey(3), cfg)
    np.testing.assert_allclose(np.asarray(y)[..., 3], x[..., 3], atol=1e-6)
    assert float(np.abs(np.asarray(y)[..., :3] - x[..., :3]).max()) > 1e-3


def test_augment_p_zero_is_identity_in_distribution():
    """With p=0 every stage must gate off (up to geometric resampling noise)."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 4)).astype(np.float32)
    cfg = make_augment_config("bgcfnc")
    y = augment_pipe(jnp.asarray(x), jnp.asarray(0.0), jax.random.PRNGKey(4), cfg)
    # identity transform still passes through the up/down filter pair; allow
    # small resampling error at borders
    err = np.abs(np.asarray(y) - x)
    assert err.mean() < 5e-3, err.mean()


def test_augment_concat_fusion_is_per_sample():
    """Dmain fuses fake+real through ONE augment invocation
    (losses.local_dmain_loss / _global_d_forward_pair): valid iff every
    pipe stage draws per-sample.  Under ``debug_percentile`` all parameter
    draws are fixed quantiles (key-independent), so
    ``augment(concat(a, b)) == concat(augment(a), augment(b))`` must hold
    exactly — with DIFFERENT keys on the separate calls to prove
    key-independence.  (The noise stage's field is random even in debug
    mode, matching the reference, so it is excluded here.)"""
    rng = np.random.RandomState(5)
    a = rng.uniform(-1, 1, size=(3, 32, 32, 4)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(3, 32, 32, 4)).astype(np.float32)
    for spec_cfg in (make_augment_config("bgcf"), AugmentConfig(cutout=1.0)):
        fused = augment_pipe(
            jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0),
            jnp.asarray(0.7), jax.random.PRNGKey(7), spec_cfg,
            debug_percentile=0.41)
        ya = augment_pipe(jnp.asarray(a), jnp.asarray(0.7),
                          jax.random.PRNGKey(8), spec_cfg,
                          debug_percentile=0.41)
        yb = augment_pipe(jnp.asarray(b), jnp.asarray(0.7),
                          jax.random.PRNGKey(9), spec_cfg,
                          debug_percentile=0.41)
        np.testing.assert_allclose(np.asarray(fused),
                                   np.concatenate([np.asarray(ya),
                                                   np.asarray(yb)], axis=0),
                                   rtol=1e-5, atol=1e-5)


def test_augment_noise_and_cutout_stats():
    rng = np.random.RandomState(4)
    x = np.zeros((8, 32, 32, 4), dtype=np.float32)
    cfg = AugmentConfig(noise=1.0)
    y = np.asarray(augment_pipe(jnp.asarray(x), jnp.asarray(1.0),
                                jax.random.PRNGKey(5), cfg))
    assert y.std() > 0  # noise applied

    cfg = AugmentConfig(cutout=1.0)
    x = np.ones((8, 32, 32, 4), dtype=np.float32)
    y = np.asarray(augment_pipe(jnp.asarray(x), jnp.asarray(1.0),
                                jax.random.PRNGKey(6), cfg))
    frac_zero = (y == 0).mean()
    assert 0.1 < frac_zero < 0.4  # ~25% cutout area
