"""Parity pins for the r5 banded-matmul rewrites: the ADA imgfilter and
post-warp downsample stages (training/augment.py) and the FIR-fold in
conv2d_resample must equal their conv-lowering references exactly (same
linear operators; only float reassociation differs).

Reference contracts: ADA per-sample filtering training/augment.py:420-451,
downsample training/augment.py:331-342, resample conv composition
torch_utils/ops/conv2d_resample.py:109-160 (all in /root/reference).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montage_gan_tpu.training.augment import augment_pipe, make_augment_config


def _env(key, val):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get(key)
            os.environ[key] = val

        def __exit__(self, *a):
            if self.old is None:
                del os.environ[key]
            else:
                os.environ[key] = self.old

    return _Ctx()


@pytest.mark.quick
@pytest.mark.parametrize('hw', [(64, 96), (64, 64)])
def test_augment_matmul_stages_match_conv(hw):
    h, w = hw
    cfg = make_augment_config('bgcfnc')
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (4, h, w, 4)), jnp.float32)
    p = jnp.float32(0.6)
    key = jax.random.PRNGKey(7)

    def run():
        return jax.jit(lambda xx: augment_pipe(xx, p, key, cfg))(x)

    def grad():
        return jax.jit(jax.grad(
            lambda xx: jnp.sum(jnp.tanh(augment_pipe(xx, p, key, cfg)))))(x)

    new_v, new_g = run(), grad()
    with _env('MGT_AUG_FILTER_IMPL', 'conv'), _env('MGT_AUG_DOWN_IMPL',
                                                   'conv'):
        old_v, old_g = run(), grad()
    np.testing.assert_allclose(np.asarray(new_v), np.asarray(old_v),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_g), np.asarray(old_g),
                               atol=2e-5)


@pytest.mark.quick
@pytest.mark.parametrize(
    'up,down,k,flip_weight,flip_filter,groups',
    [(1, 2, 3, True, False, 1), (1, 2, 1, True, False, 1),
     (2, 1, 3, False, False, 1), (2, 1, 3, True, False, 1),
     (1, 2, 3, True, True, 2)])
def test_fir_fold_matches_unfolded(up, down, k, flip_weight, flip_filter,
                                   groups):
    import importlib
    cr = importlib.import_module('montage_gan_tpu.ops.conv2d_resample')
    from montage_gan_tpu.ops.filters import setup_filter
    rng = np.random.RandomState(1)
    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(rng.randn(2, 32, 24, 8), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, 8 // groups, 12), jnp.float32)
    kw = dict(f=f, up=up, down=down, padding=(k // 2) if up == 1 else 1,
              groups=groups, flip_weight=flip_weight,
              flip_filter=flip_filter)

    def runval():
        return jax.jit(lambda a, b: cr.conv2d_resample(a, b, **kw))(x, w)

    def rungrad():
        def loss(a, b):
            return jnp.sum(jnp.square(cr.conv2d_resample(a, b, **kw)))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)

    with _env('MGT_FIR_FOLD', '1'):
        v1, (gx1, gw1) = runval(), rungrad()
    with _env('MGT_FIR_FOLD', '0'):
        v0, (gx0, gw0) = runval(), rungrad()
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=5e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=5e-4, atol=2e-4)
    # weight grads sum over every pixel — reassociation noise scales with
    # the summand count, so the relative gate is looser here
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                               rtol=2e-3, atol=2e-4)
