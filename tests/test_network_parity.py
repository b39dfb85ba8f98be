"""Full-network numerical parity vs the reference implementation.

Constructs reference torch networks with random init, imports their
state_dicts through utils/torch_import, and compares complete forward passes.
This exercises every op, padding rule, gain, and w-slicing decision in the
synthesis/discriminator stacks at once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu import models
from montage_gan_tpu.utils import torch_import

torch = pytest.importorskip("torch")


def setup_module(module):
    np.random.seed(0)
    torch.manual_seed(0)


@pytest.mark.reference
@pytest.mark.parametrize("target,cci", [((64, 32), 3), ((64, 64), 2)])
def test_synthesis_network_parity(target, cci):
    from custom.networks_aio import SynthesisNetwork as RefSynthesis
    from montage_gan_tpu.utils.calc_res import calc_init_res

    init_res, res, _ = calc_init_res(list(target), conv_config_index=cci)
    kw = dict(img_resolution=res, img_channels=4, init_res=list(init_res),
              conv_config_index=cci, channel_base=2048, channel_max=64)
    ref = RefSynthesis(w_dim=64, **kw)
    ref.eval()

    ours = models.SynthesisNetwork(w_dim=64, **{**kw,
                                                'init_res': tuple(init_res)})
    variables = torch_import.synthesis_params_from_torch(ref.state_dict())

    ws = np.random.randn(2, ours.num_ws, 64).astype(np.float32)
    with torch.no_grad():
        img_ref = ref(torch.from_numpy(ws), noise_mode='const',
                      force_fp32=True)
    img = ours.apply(variables, jnp.asarray(ws), noise_mode='const',
                     force_fp32=True)
    np.testing.assert_allclose(np.asarray(img),
                               img_ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.reference
@pytest.mark.parametrize("target,cci", [((64, 32), 3), ((64, 64), 2)])
def test_discriminator_parity(target, cci):
    from custom.networks_aio import Discriminator as RefD
    from montage_gan_tpu.utils.calc_res import calc_init_res

    init_res, res, _ = calc_init_res(list(target), conv_config_index=cci)
    kw = dict(img_resolution=res, img_channels=4, init_res=list(init_res),
              conv_config_index=cci, channel_base=2048, channel_max=64)
    ref = RefD(**kw, epilogue_kwargs=dict(mbstd_group_size=2))
    ref.eval()

    ours = models.Discriminator(**{**kw, 'init_res': tuple(init_res)},
                                mbstd_group_size=2)
    variables = {'params': torch_import.discriminator_params_from_torch(
        ref.state_dict(), init_res=init_res)['params']}

    img = np.random.randn(4, target[0], target[1], 4).astype(np.float32)
    with torch.no_grad():
        logits_ref = ref(torch.from_numpy(
            np.ascontiguousarray(img.transpose(0, 3, 1, 2))), force_fp32=True)
    logits = ours.apply(variables, jnp.asarray(img), force_fp32=True)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.reference
def test_mapping_network_parity():
    from custom.networks_aio import MappingNetwork as RefMapping

    ref = RefMapping(z_dim=32, w_dim=32, num_ws=6, num_layers=3)
    ref.eval()
    ours = models.MappingNetwork(z_dim=32, w_dim=32, num_ws=6, num_layers=3)
    variables = torch_import.mapping_params_from_torch(ref.state_dict())

    z = np.random.randn(4, 32).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref(torch.from_numpy(z))
    ws = ours.apply(variables, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ws), ws_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.reference
def test_global_mapping_network_parity():
    from custom.networks_aio import GlobalMappingNetwork as RefGM

    ref = RefGM(z_dim=32, w_dim=32, num_ws=6, num_layers=3, num_splits=5)
    ref.eval()
    ours = models.GlobalMappingNetwork(z_dim=32, w_dim=32, num_ws=6,
                                       num_layers=3, num_splits=5)
    variables = torch_import.mapping_params_from_torch(ref.state_dict())

    z = np.random.randn(4, 32).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref(torch.from_numpy(z))  # [B, L, num_ws, w]
    ws = ours.apply(variables, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ws), ws_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.reference
def test_stn_parity():
    from conftest import stub_torchvision
    stub_torchvision()
    from fukuwarai.networks import STNv2c as RefSTN

    ref5 = RefSTN(img_resolution=256, img_channels=4, img_layers=3)
    ref5.eval()
    ours5 = models.STN(img_resolution=256, img_channels=4, img_layers=3,
                       num_stages=5, pad_value=-1.0)
    variables = torch_import.stn_params_from_torch(ref5.state_dict())

    x = np.random.uniform(-1, 1, (2, 3, 256, 256, 4)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 1, 4, 2, 3)))
        y_ref, theta_ref = ref5(xt)
    y, theta = ours5.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(theta), theta_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y),
                               y_ref.numpy().transpose(0, 1, 3, 4, 2),
                               rtol=1e-3, atol=2e-3)
