"""PhaseExecutor integration: geometry-shared per-phase programs must train
the tiny ensemble end-to-end and update every component, like the monolithic
step does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.training.phase_exec import PhaseExecutor
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

BATCH = 2


def setup_exec():
    cfg = MontageConfig(
        layer_names=('a', 'b', 'c'),
        layer_targets=((32, 32), (16, 8), (32, 32)),  # a and c share geometry
        base_resolution=32, conv_config_index=2,
        z_dim=32, w_dim=32, mapping_num_layers=2,
        channel_base=512, channel_max=32, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=2, renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH, augment=None, ada_target=None,
                       g_reg_interval=2, d_reg_interval=2)
    trainer = MontageTrainer(ens, hyper)
    # per_layer: these tests pin the exact reference phase order; the
    # default 'bucket' mode is pinned against it in test_bucket_exec.py
    return ens, trainer, PhaseExecutor(trainer, merge_locals='per_layer')


def test_phase_executor_trains():
    ens, trainer, executor = setup_exec()
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0),
                                              batch=BATCH))
    cfg = ens.cfg
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, 32, 32, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))

    def params_only(variables):
        return {'mapping': variables['mapping']['params'],
                'local_g': tuple(v['params'] for v in variables['local_g']),
                'local_d': tuple(v['params'] for v in variables['local_d']),
                'stn': variables['stn']['params'],
                'global_d': variables['global_d']['params'],
                'renderer': variables['renderer']['params']}

    s0_leaves = jax.tree_util.tree_leaves(
        jax.device_get(params_only(state.variables)))

    # geometry sharing: layers 'a' and 'c' share one compiled gmain program
    for t in range(3):
        state, stats = executor.step(state, stack, crops,
                                     jax.random.PRNGKey(5 + t))
    assert int(state.step) == 3
    # split per-phase programs, cached once per (phase kind, geometry rep) —
    # no reg-combo variants (reg phases simply aren't dispatched off-interval)
    for kind in ('gmain', 'greg', 'dmain', 'dr1'):
        assert (kind, 0) in executor._fns
        assert (kind, 1) in executor._fns
    # 'c' reused 'a''s programs (same geometry)
    assert not any(k[1] == 2 for k in executor._fns
                   if k[0] in ('gmain', 'greg', 'dmain', 'dr1'))

    s1_leaves = jax.tree_util.tree_leaves(
        jax.device_get(params_only(state.variables)))
    changed = sum(bool(np.any(a != b)) for a, b in zip(s0_leaves, s1_leaves))
    # all trainable params updated (noise buffers etc. legitimately constant)
    assert changed >= len(s1_leaves) - 2, (changed, len(s1_leaves))

    for k, v in stats.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert bool(jnp.any(state.pl_mean != 0))
    # per-layer stats present for all three layers + global + renderer
    assert 'a/Loss/G/loss' in stats and 'c/Loss/G/loss' in stats
    assert 'global/Loss/G/loss' in stats
    assert 'global/Loss/D/loss' in stats
    assert 'Renderer/loss_gen' in stats


def test_global_phase_accumulation():
    """global_microbatch < batch ⇒ accumulation rounds inside the global
    G/D and renderer phases (the HBM high-water-mark phases)."""
    cfg = MontageConfig(
        layer_names=('a', 'b'), layer_targets=((16, 16), (16, 16)),
        base_resolution=16, conv_config_index=2,
        z_dim=16, w_dim=16, mapping_num_layers=2,
        channel_base=256, channel_max=16, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=1, renderer_type='tanh',
        train_global=True, use_global_mapping=True)
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=4, global_microbatch=2, augment=None,
                       ada_target=None, g_reg_interval=2, d_reg_interval=1,
                       train_global=True, train_renderer=True,
                       bypass_renderer=False, global_optimize_interval=1)
    trainer = MontageTrainer(ens, hyper)
    assert hyper.global_accum_rounds == 2 and hyper.accum_rounds == 1
    executor = PhaseExecutor(trainer)
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0), batch=4))
    stack = jax.random.uniform(jax.random.PRNGKey(1), (4, 2, 16, 16, 4),
                               minval=-1.0, maxval=1.0)
    crops = (stack[:, 0], stack[:, 1])
    for t in range(2):
        state, stats = executor.step(state, stack, crops,
                                     jax.random.PRNGKey(3 + t))
    for leaf in jax.tree_util.tree_leaves(state.variables):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(stats['global/Loss/G/loss']))
    assert np.isfinite(np.asarray(stats['global/Loss/D/loss']))
    assert np.isfinite(np.asarray(stats['Renderer/loss_gen']))


def test_phase_executor_with_accumulation():
    """microbatch < batch ⇒ gradient-accumulation rounds inside each local
    phase (reference rounds semantics, training_loop_aio.py:620-627)."""
    cfg = MontageConfig(
        layer_names=('a',), layer_targets=((16, 16),),
        base_resolution=16, conv_config_index=2,
        z_dim=16, w_dim=16, mapping_num_layers=2,
        channel_base=256, channel_max=16, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=1, renderer_type='none',
        train_global=False)
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=4, microbatch=2, augment=None,
                       ada_target=None, g_reg_interval=2, d_reg_interval=2,
                       train_global=False, train_renderer=False,
                       bypass_renderer=True)
    trainer = MontageTrainer(ens, hyper)
    executor = PhaseExecutor(trainer)
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0), batch=4))
    stack = jax.random.uniform(jax.random.PRNGKey(1), (4, 1, 16, 16, 4),
                               minval=-1.0, maxval=1.0)
    crops = (stack[:, 0],)
    for t in range(2):
        state, stats = executor.step(state, stack, crops,
                                     jax.random.PRNGKey(3 + t))
    assert int(state.step) == 2
    for leaf in jax.tree_util.tree_leaves(state.variables):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(stats['a/Loss/G/loss']))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_executor_on_mesh_matches_single_device():
    """The PRODUCTION path (PhaseExecutor.step) on an 8-device data mesh
    must match the single-device run on the same global batch — the
    executor-path analogue of test_parallel_matches_single_device (the
    reference DDP-wraps every module precisely so the production scheduler
    is the synchronized one, custom/training_loop_aio.py:409-429)."""
    from montage_gan_tpu.parallel.mesh import (assert_replicated, make_mesh,
                                               replicate, shard_batch)
    from montage_gan_tpu.training.augment import AugmentConfig

    batch = 8
    cfg = MontageConfig(layer_names=('a', 'b'),
                        layer_targets=((16, 16), (16, 8)),
                        base_resolution=16, conv_config_index=2,
                        z_dim=16, w_dim=16, mapping_num_layers=2,
                        channel_base=256, channel_max=16, num_fp16_res=0,
                        mbstd_group_size=2, stn_stages=1,
                        renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=batch, augment=None, ada_target=None,
                       g_reg_interval=2, d_reg_interval=2)
    trainer = MontageTrainer(ens, hyper)
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch=batch)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    stack = jax.random.uniform(k1, (batch, cfg.num_layers, 16, 16, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (batch,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))
    rng = jax.random.PRNGKey(2)

    host0 = jax.device_get(state0)

    # single device (separate executor: programs are cached per sharding
    # anyway, but state buffers get donated)
    exe1 = PhaseExecutor(trainer)
    s1 = jax.device_put(host0)
    s1, stats1 = exe1.step(s1, stack, crops, rng, step_idx=0)

    # 8-device mesh: replicated state, batch-sharded data
    mesh = make_mesh(8)
    exe8 = PhaseExecutor(trainer)
    s8 = replicate(mesh, host0)
    s8, stats8 = exe8.step(s8, shard_batch(mesh, stack),
                           shard_batch(mesh, crops),
                           replicate(mesh, rng), step_idx=0)

    assert_replicated(s8.variables, mesh)
    assert set(stats1) == set(stats8)

    l1 = jax.tree_util.tree_leaves(jax.device_get(s1.variables))
    l8 = jax.tree_util.tree_leaves(jax.device_get(s8.variables))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.pl_mean), np.asarray(s8.pl_mean),
                               rtol=1e-4, atol=1e-6)
    for k in stats1:
        np.testing.assert_allclose(np.asarray(stats1[k]),
                                   np.asarray(stats8[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


def test_merge_all_matches_per_layer():
    """'all' mode (single locals program) computes the same math as
    'per_layer' (identical phase order and RNG streams)."""
    ens, trainer, executor = setup_exec()
    executor_all = PhaseExecutor(trainer, merge_locals='all')
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    cfg = ens.cfg
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, 32, 32, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))

    # independent device copies (device_put of an on-device tree aliases
    # buffers, and the executors donate theirs)
    host0 = jax.device_get(state0)
    s_a = jax.device_put(host0)
    s_b = jax.device_put(host0)
    for t in range(2):
        s_a, st_a = executor.step(s_a, stack, crops, jax.random.PRNGKey(5 + t))
        s_b, st_b = executor_all.step(s_b, stack, crops,
                                      jax.random.PRNGKey(5 + t))
    assert set(st_a) == set(st_b)
    la = jax.tree_util.tree_leaves(jax.device_get(s_a.variables))
    lb = jax.tree_util.tree_leaves(jax.device_get(s_b.variables))
    # The two modes are DIFFERENT compiled programs (fusion orders differ),
    # so float rounding differs; early Adam sign-normalizes near-zero
    # gradients to ±lr per entry, so a rounding-level grad difference can
    # flip a RARE element's update sign — bounded by (applications)·2·lr
    # exactly like the bench warp-selftest's 5·lr bound (bench.py), here
    # 2 steps × ≤2 optimizer applications per param.  Observed: 21/9216
    # elements at ≤ 5.2e-3 with everything else at f32 noise.  A semantic
    # divergence (wrong RNG stream / phase order) flips ~half the
    # elements, which the fraction gate catches.
    # bound from the hyper the executors ACTUALLY run with (not TrainHyper
    # defaults — a custom lrate in setup_exec would silently skew the gate)
    lr_bound = 8.0 * trainer.hyper.lrate + 1e-6
    n_flipped = 0
    n_total = 0
    for a, b in zip(la, lb):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b)
        assert float(d.max(initial=0.0)) <= lr_bound, \
            (float(d.max()), lr_bound)
        if d.size:
            frac = float(np.mean(d > 2e-4))
            assert frac <= 0.01, frac
            n_flipped += int(np.sum(d > 2e-4))
            n_total += d.size
    # fraction gate repo-wide too: rounding-level flips measure ~0.5%
    # of all elements (observed healthy run: 395); a semantic divergence
    # (wrong RNG stream / phase order) flips ~half
    assert n_flipped <= 0.02 * n_total, (n_flipped, n_total)
    np.testing.assert_allclose(np.asarray(s_a.pl_mean),
                               np.asarray(s_b.pl_mean), rtol=1e-3,
                               atol=1e-5)


@pytest.mark.mid
def test_precompile_covers_production_programs():
    """precompile() must lower+compile the full steady-state program set
    ahead of the first step (cold-start lever, VERDICT r3 #4) and leave the
    executor fully functional; its argument specs must match the real
    dispatch types so the AOT artifacts are the ones the step uses."""
    ens, trainer, executor = setup_exec()
    cfg = ens.cfg
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0),
                                              batch=BATCH))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, 32, 32, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))
    logs = []
    n = executor.precompile(state, stack, crops, max_workers=2,
                            log=logs.append)
    # 2 geometry reps × 4 local phase kinds + Renderer + global_Gmain +
    # global_Dmain+ema + global_Dmain + global_Dreg+ema = 13
    assert n == 13, (n, logs)
    state, stats = executor.step(state, stack, crops, jax.random.PRNGKey(7),
                                 step_idx=0)
    assert np.isfinite(np.asarray(stats['global/Loss/G/loss']))
    # the AOT artifacts must actually be HIT by the step — a silent
    # argument-spec drift would fall back to the jit path and forfeit the
    # precompile win (ADVICE r4 #1).  Step 0 runs greg+dreg for both
    # geometry reps plus 3 tail programs (Renderer, global_Gmain,
    # global_Dmain / Dreg+ema variants per the interval schedule).
    assert sum(executor.aot_hits.values()) >= 10, executor.aot_hits
    assert not executor.aot_misses, executor.aot_misses

    # bucket mode: buckets of k>1 use the vmapped bucket programs
    ens2, trainer2, _ = setup_exec()
    bucket_exec = PhaseExecutor(trainer2, merge_locals='bucket')
    state2 = jax.device_put(trainer2.init_state(jax.random.PRNGKey(0),
                                                batch=BATCH))
    n2 = bucket_exec.precompile(state2, stack, crops, max_workers=2)
    # bucket a+c (4 programs) + singleton b (4) + same 5 tail = 13
    assert n2 == 13
    state2, stats2 = bucket_exec.step(state2, stack, crops,
                                      jax.random.PRNGKey(7), step_idx=0)
    assert np.isfinite(np.asarray(stats2['global/Loss/G/loss']))
    assert sum(bucket_exec.aot_hits.values()) >= 10, bucket_exec.aot_hits
    assert not bucket_exec.aot_misses, bucket_exec.aot_misses

    # 'all' mode: the fused locals program (the largest compile) must be
    # in the plan too, one variant per reachable reg combo (ADVICE r4 #2)
    ens3, trainer3, _ = setup_exec()
    all_exec = PhaseExecutor(trainer3, merge_locals='all')
    state3 = jax.device_put(trainer3.init_state(jax.random.PRNGKey(0),
                                                batch=BATCH))
    n3 = all_exec.precompile(state3, stack, crops, max_workers=2)
    # g_reg=d_reg=2 → reachable combos {(T,T),(F,F)} = 2 locals + 5 tail
    assert n3 == 7, n3
    state3, stats3 = all_exec.step(state3, stack, crops,
                                   jax.random.PRNGKey(7), step_idx=0)
    assert np.isfinite(np.asarray(stats3['global/Loss/G/loss']))
    assert any(k[0] == ('locals', True, True) for k in all_exec.aot_hits), \
        all_exec.aot_hits
    assert not all_exec.aot_misses, all_exec.aot_misses
