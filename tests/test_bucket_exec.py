"""Bucket mode (merge_locals='bucket', the production default): k
same-geometry layers vmapped over stacked params in one program per phase
kind (SURVEY §7.1 "vectorize the layer axis").

Pinned here:
  * the closed-form sequential w_avg EMA equals the literal sequential loop
    exactly (unit);
  * a 2-layer bucket matches per_layer mode within the documented
    staleness tolerance over multiple steps (the ONLY deviation is that
    G-phase grads are computed at the bucket-entry mapping params —
    phase_exec.PhaseExecutor.__init__ docstring) — RNG streams, per-layer
    Adam moments, pl_mean, ADA sign stats, and stat names all match;
  * singleton buckets reuse the split per-layer programs (bit-identical
    path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.training.phase_exec import PhaseExecutor
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

BATCH = 4


def setup(augment=False):
    from montage_gan_tpu.training.augment import AugmentConfig
    cfg = MontageConfig(
        layer_names=('a', 'b', 'c'),
        layer_targets=((32, 32), (16, 8), (32, 32)),  # a+c form a bucket
        base_resolution=32, conv_config_index=2,
        z_dim=32, w_dim=32, mapping_num_layers=2,
        channel_base=512, channel_max=32, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=2, renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    aug = AugmentConfig(xflip=1, brightness=1, noise=1, cutout=1) \
        if augment else None
    hyper = TrainHyper(batch_size=BATCH, augment=aug,
                       ada_target=0.6 if augment else None,
                       g_reg_interval=2, d_reg_interval=2)
    trainer = MontageTrainer(ens, hyper)
    return ens, trainer


def batch_for(ens, key):
    cfg = ens.cfg
    k1, k2 = jax.random.split(key)
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, 32, 32, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))
    return stack, crops


@pytest.mark.quick
def test_seq_moving_stats_closed_form_equals_loop():
    """β^k·old + Σ β^(k-1-j)(new_j − β·old) == the literal k-step EMA
    sequence over the same means (exact, not a tolerance statement)."""
    ens, trainer = setup()
    exe = PhaseExecutor(trainer)
    beta = float(ens.mapping.w_avg_beta)
    k = 4
    rng = np.random.RandomState(0)
    old = jnp.asarray(rng.randn(7), jnp.float32)
    means = jnp.asarray(rng.randn(k, 7), jnp.float32)

    # literal sequential loop
    seq = old
    for j in range(k):
        seq = beta * seq + (1 - beta) * means[j]

    # what the vmapped lanes hand the closed form: each new_j from OLD
    news = beta * old[None] + (1 - beta) * means
    got = exe._seq_moving_stats({'w_avg': old}, {'w_avg': news}, k)['w_avg']
    np.testing.assert_allclose(np.asarray(got), np.asarray(seq), rtol=1e-6,
                               atol=1e-7)


def _params_of(state):
    return jax.device_get({'v': state.variables, 'pl': state.pl_mean,
                           'ss': state.ada_sign_sum,
                           'sc': state.ada_sign_count,
                           'p': state.aug_p})


def test_bucket_matches_per_layer_within_staleness_tolerance():
    """2 steps of bucket mode vs per_layer mode from identical state: every
    parameter matches within the documented staleness bound.  The mapping
    lr is lrate × lr_multiplier = 2.5e-5 per step, so intra-step staleness
    perturbs gradients by O(1e-5) relative; Adam sign-normalizes, so the
    bound is a small multiple of the per-step update, not machine eps."""
    ens, trainer = setup(augment=True)
    host0 = jax.device_get(trainer.init_state(jax.random.PRNGKey(0),
                                              batch=BATCH))
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))

    exe_b = PhaseExecutor(trainer, merge_locals='bucket')
    exe_p = PhaseExecutor(trainer, merge_locals='per_layer')
    assert [len(idxs) for _, idxs in exe_b._buckets] == [2, 1]

    s_b, s_p = jax.device_put(host0), jax.device_put(host0)
    for t in range(2):
        s_b, st_b = exe_b.step(s_b, stack, crops, jax.random.PRNGKey(5 + t),
                               step_idx=t)
        s_p, st_p = exe_p.step(s_p, stack, crops, jax.random.PRNGKey(5 + t),
                               step_idx=t)
    assert set(st_b) == set(st_p)

    a, b = _params_of(s_b), _params_of(s_p)
    # ADA/pl bookkeeping must agree tightly (identical draws)
    np.testing.assert_allclose(a['ss'], b['ss'], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(a['sc'], b['sc'])
    np.testing.assert_allclose(a['pl'], b['pl'], rtol=2e-3, atol=1e-5)
    # params: staleness bound — a few per-step Adam updates' worth
    # (measured 1.06e-2 = 4.3·lr after 2 steps on this config)
    tol = 6.0 * trainer.hyper.lrate
    worst = 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(a['v']),
                      jax.tree_util.tree_leaves(b['v'])):
        la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
        if la.size:
            worst = max(worst, float(np.max(np.abs(la - lb))))
    assert worst <= tol, f'bucket vs per_layer max diff {worst:.2e} > {tol}'
    # and the stats must be numerically close, not just same-named.
    # Renderer/loss+psnr are excluded: at these untrained micro configs the
    # montage activations saturate conv_clamp, making the renderer MSE a
    # chaotic diagnostic (measured 129 vs 47k from ~1e-2 param diffs) —
    # bounding it says nothing about bucket correctness
    for k in st_b:
        if k.startswith('Timing/') or k.startswith('Renderer/'):
            continue
        np.testing.assert_allclose(np.asarray(st_b[k]), np.asarray(st_p[k]),
                                   rtol=0.08, atol=5e-3, err_msg=k)


def test_bucket_accumulation_rounds():
    """bucket_microbatch drives accumulation inside the bucket programs;
    results stay finite and the state advances (semantics pinned by the
    linearity contract, accum_value_and_grad docstring)."""
    ens0, _ = setup()
    cfg = ens0.cfg
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH, augment=None, ada_target=None,
                       g_reg_interval=2, d_reg_interval=2,
                       bucket_microbatch=BATCH // 2)
    trainer = MontageTrainer(ens, hyper)
    assert trainer.hyper.bucket_accum_rounds == 2
    exe = PhaseExecutor(trainer, merge_locals='bucket')
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0),
                                              batch=BATCH))
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))
    for t in range(2):
        state, stats = exe.step(state, stack, crops,
                                jax.random.PRNGKey(3 + t), step_idx=t)
    assert int(state.step) == 2
    for leaf in jax.tree_util.tree_leaves(state.variables):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(stats['a/Loss/G/loss']))
    assert np.isfinite(np.asarray(stats['c/Loss/D/loss']))
