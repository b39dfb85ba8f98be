"""Conditional (c_dim > 0) training support.

Parity of the conditional mapping embed + D projection head vs the reference
networks, and a smoke test of the full conditional train step (the
reference's train.py --cond path; reference: training/networks.py mapping
embed / DiscriminatorEpilogue projection, training/loss.py gen_c plumbing).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu import models
from montage_gan_tpu.utils import torch_import

torch = pytest.importorskip("torch")


@pytest.mark.reference
def test_conditional_mapping_parity():
    from custom.networks_aio import MappingNetwork as RefMapping
    torch.manual_seed(1)
    ref = RefMapping(z_dim=32, c_dim=10, w_dim=32, num_ws=6, num_layers=3)
    ref.eval()
    ours = models.MappingNetwork(z_dim=32, c_dim=10, w_dim=32, num_ws=6,
                                 num_layers=3)
    variables = torch_import.mapping_params_from_torch(ref.state_dict())

    rng = np.random.RandomState(0)
    z = rng.randn(4, 32).astype(np.float32)
    c = np.eye(10, dtype=np.float32)[rng.randint(10, size=4)]
    with torch.no_grad():
        ws_ref = ref(torch.from_numpy(z), torch.from_numpy(c))
    ws = ours.apply(variables, jnp.asarray(z), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(ws), ws_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.reference
def test_conditional_discriminator_parity():
    from custom.networks_aio import Discriminator as RefD
    torch.manual_seed(2)
    kw = dict(img_resolution=32, img_channels=3, c_dim=10,
              channel_base=2048, channel_max=64)
    ref = RefD(init_res=[4, 4], conv_config_index=2,
               epilogue_kwargs=dict(mbstd_group_size=2), **kw)
    ref.eval()
    ours = models.Discriminator(init_res=(4, 4), conv_config_index=2,
                                mbstd_group_size=2, **kw)
    variables = {'params': torch_import.discriminator_params_from_torch(
        ref.state_dict(), init_res=(4, 4))['params']}

    rng = np.random.RandomState(1)
    img = rng.randn(4, 32, 32, 3).astype(np.float32)
    c = np.eye(10, dtype=np.float32)[rng.randint(10, size=4)]
    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(
            np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            torch.from_numpy(c), force_fp32=True)
    logits = ours.apply(variables, jnp.asarray(img), jnp.asarray(c),
                        force_fp32=True)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_freeze_d_layers_zero_grad():
    """--freezed semantics (reference: train.py freezed → D trainable_gen,
    custom/networks_aio.py:706-713): frozen leading D layers get zero
    gradients."""
    d = models.Discriminator(img_resolution=16, img_channels=3,
                             conv_config_index=2, channel_base=512,
                             channel_max=32, mbstd_group_size=2,
                             freeze_layers=2)
    img = jnp.asarray(np.random.RandomState(0)
                      .randn(2, 16, 16, 3).astype(np.float32))
    variables = d.init({'params': jax.random.PRNGKey(0)}, img)

    grads = jax.grad(
        lambda p: jnp.sum(d.apply({'params': p}, img)))(variables['params'])
    b16 = grads['b16']
    # first 2 layers of the top block (fromrgb + conv0) are frozen
    assert float(jnp.abs(b16['fromrgb']['weight']).max()) == 0.0
    assert float(jnp.abs(b16['conv0']['weight']).max()) == 0.0
    # later layers still learn
    assert float(jnp.abs(b16['conv1']['weight']).max()) > 0.0


def test_conditional_train_step_smoke():
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

    cfg = MontageConfig(layer_names=('image',), layer_targets=((16, 16),),
                        base_resolution=16, img_channels=3,
                        conv_config_index=2, z_dim=16, w_dim=16, c_dim=4,
                        mapping_num_layers=2, channel_base=256,
                        channel_max=32, num_fp16_res=0, conv_clamp=None,
                        mbstd_group_size=2, use_global_mapping=False,
                        train_global=False, renderer_type='none')
    hyper = TrainHyper(batch_size=4, train_global=False,
                       train_renderer=False, bypass_renderer=True,
                       augment=None, ada_target=None)
    ens = MontageEnsemble(cfg)
    trainer = MontageTrainer(ens, hyper)
    state = trainer.init_state(jax.random.PRNGKey(0), batch=4)

    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32))
    c = jnp.asarray(np.eye(4, dtype=np.float32))

    step = jax.jit(lambda s, stack, crops, k, rc, gc: trainer.train_step(
        s, stack, crops, k, real_c=rc, gen_c=gc))
    state2, stats = step(state, real[:, None], (real,),
                         jax.random.PRNGKey(1), c, c)
    assert np.isfinite(float(stats['image/Loss/G/loss']))
    assert np.isfinite(float(stats['image/Loss/D/loss']))
    # the label-embed params must receive updates
    before = state.variables['mapping']['params']['embed']['weight']
    after = state2.variables['mapping']['params']['embed']['weight']
    assert not np.allclose(np.asarray(before), np.asarray(after))
