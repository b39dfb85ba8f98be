"""Data-parallel correctness over the virtual 8-device CPU mesh.

The pjit step over N devices must produce the SAME new parameters as the
single-device step on the same global batch — the structural replacement for
the reference's DDP + check_ddp_consistency story (SURVEY.md §2.10, §5.2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.parallel.mesh import (assert_replicated, make_mesh,
                                           make_parallel_train_step,
                                           replicate, shard_batch)
from montage_gan_tpu.training.augment import AugmentConfig
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

BATCH = 8


def tiny():
    cfg = MontageConfig(layer_names=('a', 'b'),
                        layer_targets=((16, 16), (16, 8)),
                        base_resolution=16, conv_config_index=2,
                        z_dim=16, w_dim=16, mapping_num_layers=2,
                        channel_base=256, channel_max=16, num_fp16_res=0,
                        mbstd_group_size=2, stn_stages=1,
                        renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH, augment=None, ada_target=None,
                       g_reg_interval=2, d_reg_interval=2)
    return ens, MontageTrainer(ens, hyper)


def batch_for(ens, key):
    cfg = ens.cfg
    k1, k2 = jax.random.split(key)
    stack = jax.random.uniform(k1, (BATCH, cfg.num_layers, cfg.base_resolution,
                                    cfg.base_resolution, 4),
                               minval=-1.0, maxval=1.0)
    crops = tuple(
        jax.random.uniform(jax.random.fold_in(k2, i),
                           (BATCH,) + cfg.layer_targets[i] + (4,),
                           minval=-1.0, maxval=1.0)
        for i in range(cfg.num_layers))
    return stack, crops


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parallel_matches_single_device():
    ens, trainer = tiny()
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)

    # single-device
    s1, stats1 = jax.jit(trainer.train_step)(state0, stack, crops, rng)

    # 8-device mesh
    mesh = make_mesh(8)
    pstep = make_parallel_train_step(trainer, mesh, donate_state=False)
    state_r = replicate(mesh, state0)
    stack_s = shard_batch(mesh, stack)
    crops_s = shard_batch(mesh, crops)
    s8, stats8 = pstep(state_r, stack_s, crops_s, replicate(mesh, rng))

    assert_replicated(s8.variables, mesh)

    l1 = jax.tree_util.tree_leaves(s1.variables)
    l8 = jax.tree_util.tree_leaves(s8.variables)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    for k in stats1:
        np.testing.assert_allclose(np.asarray(stats1[k]),
                                   np.asarray(stats8[k]),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_parallel_runs_multiple_steps():
    ens, trainer = tiny()
    mesh = make_mesh(4)
    pstep = make_parallel_train_step(trainer, mesh)
    state = replicate(mesh, trainer.init_state(jax.random.PRNGKey(0),
                                               batch=BATCH))
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))
    stack = shard_batch(mesh, stack)
    crops = shard_batch(mesh, crops)
    for t in range(2):
        state, stats = pstep(state, stack, crops,
                             replicate(mesh, jax.random.PRNGKey(5 + t)))
    assert int(state.step) == 2
    for leaf in jax.tree_util.tree_leaves(state.variables):
        assert np.isfinite(np.asarray(leaf)).all()
