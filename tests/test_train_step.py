"""Integration test: the single jitted AIO train step on a tiny ensemble.

Covers the phase schedule semantics (SURVEY.md §2.7): sequential local G/D
updates with the shared mapping, lazy-reg interval masks, global phases,
renderer phase, EMA, and the ADA controller — all inside one compiled step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.training.augment import AugmentConfig
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

BATCH = 2


def tiny_setup(train_global=True, train_renderer=True, augment=True):
    cfg = MontageConfig(
        layer_names=('a', 'b'),
        layer_targets=((32, 32), (16, 8)),
        base_resolution=32,
        conv_config_index=2,
        z_dim=32, w_dim=32, mapping_num_layers=2,
        channel_base=512, channel_max=32, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=2,
        train_global=train_global,
        renderer_type='tanh' if train_renderer else 'none')
    ens = MontageEnsemble(cfg)
    aug = AugmentConfig(xflip=1, brightness=1, noise=1, cutout=1) if augment else None
    hyper = TrainHyper(batch_size=BATCH, augment=aug, ada_target=0.6,
                       ada_interval=2, g_reg_interval=2, d_reg_interval=2,
                       pl_batch_shrink=2,
                       train_global=train_global,
                       train_renderer=train_renderer,
                       bypass_renderer=not train_renderer)
    trainer = MontageTrainer(ens, hyper)
    return ens, trainer


def fake_batch(ens, key):
    cfg = ens.cfg
    k1, k2 = jax.random.split(key)
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, cfg.base_resolution,
                                    cfg.base_resolution, cfg.img_channels),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (cfg.img_channels,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))
    return stack, crops


@pytest.fixture(scope="module")
def stepped():
    ens, trainer = tiny_setup()
    state = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    step = jax.jit(trainer.train_step)
    stack, crops = fake_batch(ens, jax.random.PRNGKey(1))
    states = [state]
    all_stats = []
    for t in range(3):
        state, stats = step(state, stack, crops, jax.random.PRNGKey(10 + t))
        states.append(state)
        all_stats.append(stats)
    return ens, trainer, states, all_stats


def test_step_runs_and_updates_params(stepped):
    ens, trainer, states, all_stats = stepped
    s0, s1 = states[0], states[1]
    assert int(s1.step) == 1

    def changed(a, b):
        return any(bool(jnp.any(x != y))
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert changed(s0.variables['mapping']['params'],
                   s1.variables['mapping']['params'])
    for i in range(ens.cfg.num_layers):
        assert changed(s0.variables['local_g'][i]['params'],
                       s1.variables['local_g'][i]['params'])
        assert changed(s0.variables['local_d'][i]['params'],
                       s1.variables['local_d'][i]['params'])
    assert changed(s0.variables['stn']['params'], s1.variables['stn']['params'])
    assert changed(s0.variables['global_d']['params'],
                   s1.variables['global_d']['params'])
    assert changed(s0.variables['renderer']['params'],
                   s1.variables['renderer']['params'])


def test_stats_are_finite(stepped):
    ens, trainer, states, all_stats = stepped
    for stats in all_stats:
        for k, v in stats.items():
            assert np.isfinite(np.asarray(v)).all(), k


def test_params_stay_finite(stepped):
    ens, trainer, states, all_stats = stepped
    for leaf in jax.tree_util.tree_leaves(states[-1].variables):
        assert np.isfinite(np.asarray(leaf)).all()


def test_ema_tracks_params(stepped):
    ens, trainer, states, all_stats = stepped
    s = states[-1]
    # EMA should differ from both init and current params but stay finite
    ema_leaf = jax.tree_util.tree_leaves(s.ema['mapping']['params'])[0]
    cur_leaf = jax.tree_util.tree_leaves(s.variables['mapping']['params'])[0]
    init_leaf = jax.tree_util.tree_leaves(
        states[0].variables['mapping']['params'])[0]
    assert bool(jnp.any(ema_leaf != cur_leaf))
    assert bool(jnp.any(ema_leaf != init_leaf))


def test_pl_mean_updates_on_reg_steps(stepped):
    ens, trainer, states, all_stats = stepped
    # g_reg_interval=2: reg at steps 0 and 2 → pl_mean changes
    assert bool(jnp.any(states[1].pl_mean != 0))


def test_w_avg_updates(stepped):
    ens, trainer, states, all_stats = stepped
    w0 = states[0].variables['mapping']['moving_stats']['w_avg']
    w1 = states[1].variables['mapping']['moving_stats']['w_avg']
    assert bool(jnp.any(w0 != w1))


def test_local_only_mode():
    """train_global=False ⇒ step 1 (pretrain local GANs) still works
    (reference config switch: custom/training_loop_aio.py:61-86)."""
    ens, trainer = tiny_setup(train_global=False, train_renderer=False,
                              augment=False)
    state = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    stack, crops = fake_batch(ens, jax.random.PRNGKey(1))
    state, stats = jax.jit(trainer.train_step)(state, stack, crops,
                                               jax.random.PRNGKey(2))
    assert int(state.step) == 1
    assert 'a/Loss/G/loss' in stats


def test_new_loss_stat_propagates_without_train_step_edit(monkeypatch):
    """A stat added to a global loss's aux flows through the gated phases
    (zero-init carries are derived from the loss aux via eval_shape, not a
    hard-coded key whitelist)."""
    from montage_gan_tpu.training import losses

    orig = losses.global_gmain_loss

    def patched(*args, **kwargs):
        loss, aux = orig(*args, **kwargs)
        aux['stats']['Loss/G/extra_stat'] = loss * 0 + 42.0
        return loss, aux

    monkeypatch.setattr(losses, 'global_gmain_loss', patched)
    ens, trainer = tiny_setup()
    state = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    stack, crops = fake_batch(ens, jax.random.PRNGKey(1))
    state, stats = jax.jit(trainer.train_step)(state, stack, crops,
                                               jax.random.PRNGKey(2))
    assert 'global/Loss/G/extra_stat' in stats
    np.testing.assert_allclose(np.asarray(stats['global/Loss/G/extra_stat']),
                               42.0, rtol=1e-6)


def test_global_phase_w_avg_sequential_updates():
    """_global_g_forward applies L SEQUENTIAL w_avg EMA updates (one per
    per-layer mapping call), matching the reference's run_global_G
    (custom/loss_aio.py:238-243): w_L = beta^L * w_0 + (1 - beta^L) * mean_w."""
    from montage_gan_tpu.training import losses

    ens, trainer = tiny_setup()
    variables = ens.init_variables(jax.random.PRNGKey(0), batch=BATCH)
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, ens.cfg.z_dim))

    diff = {'mapping': variables['mapping'],
            'local_g': tuple(variables['local_g']),
            'stn': variables['stn']}
    _, _, new_stats = losses._global_g_forward(ens, diff, z,
                                               jax.random.PRNGKey(2),
                                               style_mixing_prob=0.0)

    # one reference update to recover mean_w: w1 = b*w0 + (1-b)*m
    beta = ens.mapping.w_avg_beta
    w0 = np.asarray(variables['mapping']['moving_stats']['w_avg'])
    _, mut = ens.mapping.apply(variables['mapping'], z, update_w_avg=True,
                               mutable=['moving_stats'])
    w1 = np.asarray(mut['moving_stats']['w_avg'])
    mean_w = (w1 - beta * w0) / (1.0 - beta)

    n = ens.cfg.num_layers
    expected = beta ** n * w0 + (1.0 - beta ** n) * mean_w
    np.testing.assert_allclose(np.asarray(new_stats['w_avg']), expected,
                               rtol=1e-5, atol=1e-7)


def test_dmain_fused_augment_matches_separate_calls(monkeypatch):
    """Dmain runs fake‖real through ONE augment invocation then D per half
    (losses.local_dmain_loss, losses._global_d_forward_pair).  Under
    ``debug_percentile`` the pipe is key-independent, so the fused loss must
    EXACTLY equal the reference-shaped computation (separate augment per
    batch, separate D passes) — pinning the concat/split wiring, the
    conditioning plumbing, and that minibatch-std never sees mixed halves."""
    import functools

    from montage_gan_tpu.training import losses
    from montage_gan_tpu.training.augment import augment_pipe as real_pipe

    ens, trainer = tiny_setup()
    variables = ens.init_variables(jax.random.PRNGKey(0), batch=BATCH)
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, ens.cfg.z_dim))
    stack, crops = fake_batch(ens, jax.random.PRNGKey(2))
    aug = AugmentConfig(xflip=1, brightness=1, cutout=1)
    p = jnp.float32(0.8)
    rng = jax.random.PRNGKey(3)

    monkeypatch.setattr(losses, 'augment_pipe',
                        functools.partial(real_pipe, debug_percentile=0.37))

    # --- local layer 0
    loss, aux = losses.local_dmain_loss(
        variables['local_d'][0], ens, 0,
        {'mapping': variables['mapping'], 'g': variables['local_g'][0]},
        z, crops[0], rng, aug, p)

    k_g, _, _ = jax.random.split(rng, 3)
    gen_img, _, _ = losses.run_local_g(
        ens, 0, variables['mapping'], variables['local_g'][0], z, k_g, 0.9)
    gen_img = jax.lax.stop_gradient(gen_img)
    gen_ref = ens.local_ds[0].apply(
        variables['local_d'][0],
        real_pipe(gen_img, p, jax.random.PRNGKey(99), aug,
                  debug_percentile=0.37), None)
    real_ref = ens.local_ds[0].apply(
        variables['local_d'][0],
        real_pipe(crops[0], p, jax.random.PRNGKey(98), aug,
                  debug_percentile=0.37), None)
    expected = jnp.mean(jax.nn.softplus(gen_ref)) \
        + jnp.mean(jax.nn.softplus(-real_ref))
    np.testing.assert_allclose(np.asarray(loss), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)

    # --- global: fused pair path vs two separate forwards
    frozen = {'mapping': variables['mapping'],
              'local_g': tuple(variables['local_g']),
              'stn': variables['stn'],
              'renderer': variables.get('renderer'),
              'global_d': variables['global_d']}
    gloss, _ = losses.global_dmain_loss(
        variables['global_d'], ens, frozen, z, stack, rng, aug, p)

    k_fwd, _, _ = jax.random.split(rng, 3)
    placed, _, _ = losses._global_g_forward(
        ens, {'mapping': frozen['mapping'], 'local_g': frozen['local_g'],
              'stn': frozen['stn']}, z, k_fwd, 0.9)
    placed = jax.lax.stop_gradient(placed)
    gl = losses._global_d_forward(ens, variables['global_d'],
                                  frozen['renderer'], placed, aug, p,
                                  jax.random.PRNGKey(97), True)
    rl = losses._global_d_forward(ens, variables['global_d'],
                                  frozen['renderer'], stack, aug, p,
                                  jax.random.PRNGKey(96), True)
    gexpected = jnp.mean(jax.nn.softplus(gl)) + jnp.mean(jax.nn.softplus(-rl))
    np.testing.assert_allclose(np.asarray(gloss), np.asarray(gexpected),
                               rtol=1e-5, atol=1e-6)


def test_global_d_remat_switch_is_semantics_neutral(monkeypatch):
    """MGT_REMAT_GLOBAL_D=0 removes the jax.checkpoint around the renderer →
    augment → global-D chain (an HBM/FLOPs trade, losses._global_d_forward);
    loss values and gradients must be bit-identical either way."""
    from montage_gan_tpu.training import losses

    ens, trainer = tiny_setup()
    variables = ens.init_variables(jax.random.PRNGKey(0), batch=BATCH)
    z = jax.random.normal(jax.random.PRNGKey(1), (BATCH, ens.cfg.z_dim))
    stack, _ = fake_batch(ens, jax.random.PRNGKey(2))
    frozen = {'mapping': variables['mapping'],
              'local_g': tuple(variables['local_g']),
              'stn': variables['stn'],
              'renderer': variables.get('renderer')}
    aug = AugmentConfig(xflip=1, brightness=1)

    def dmain(d_vars):
        loss, _ = losses.global_dmain_loss(
            d_vars, ens, frozen, z, stack, jax.random.PRNGKey(3),
            aug, jnp.float32(0.5))
        return loss

    out = {}
    for flag in ('1', '0'):
        monkeypatch.setenv('MGT_REMAT_GLOBAL_D', flag)
        out[flag] = jax.value_and_grad(dmain)(variables['global_d'])

    np.testing.assert_array_equal(np.asarray(out['1'][0]),
                                  np.asarray(out['0'][0]))
    for a, b in zip(jax.tree_util.tree_leaves(out['1'][1]),
                    jax.tree_util.tree_leaves(out['0'][1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_accum_rounds_ema_aux_matches_full_batch():
    """Averaging per-round EMA outputs across accumulation rounds equals the
    single full-batch EMA update exactly (linearity — accum_value_and_grad
    docstring): microbatching must not slow or skew w_avg/pl_mean tracking
    relative to the reference's canonical 1-round config."""
    from montage_gan_tpu.training.train_step import accum_value_and_grad

    beta = 0.995
    w0 = jnp.asarray([2.0, -1.0, 0.5])

    def loss_fn(params, data, rng):
        m = jnp.mean(data, axis=0)
        aux = {'moving_stats': {'w_avg': beta * w0 + (1 - beta) * m},
               'pl_mean': w0[0] + 0.01 * (jnp.mean(data) - w0[0]),
               'stats': {'x': jnp.mean(data)}}
        return jnp.sum(params * m), aux

    params = jnp.ones(3)
    data = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
    (_, aux1), g1 = accum_value_and_grad(loss_fn, params, data,
                                         jax.random.PRNGKey(1), rounds=1)
    (_, aux4), g4 = accum_value_and_grad(loss_fn, params, data,
                                         jax.random.PRNGKey(1), rounds=4)
    np.testing.assert_allclose(np.asarray(aux4['moving_stats']['w_avg']),
                               np.asarray(aux1['moving_stats']['w_avg']),
                               rtol=1e-6)
    np.testing.assert_allclose(float(aux4['pl_mean']), float(aux1['pl_mean']),
                               rtol=1e-6)
    # gradients of a mean-of-means loss sum over rounds (reference contract)
    np.testing.assert_allclose(np.asarray(g4), np.asarray(g1) * 4, rtol=1e-5)
