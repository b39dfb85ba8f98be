"""Reference-compatible checkpoint EXPORT (utils/torch_export.py).

Closes the round-2 one-way interop door: the framework could import
reference checkpoints but not write them.  Tests here prove the inverse
direction three ways:

  1. import→export round-trips every module's reference state_dict
     bit-for-bit (same keys, same order, same values);
  2. a full AIO snapshot written by ``export_aio_snapshot`` loads into
     freshly-built reference modules through the reference's own resume
     logic (strict ``load_state_dict`` / GlobalMapping zip rule,
     custom/training_loop_aio.py:314-342) and reproduces our forward;
  3. an exported SG2 ``.pkl`` loads through the reference's
     ``legacy.load_network_pkl`` (legacy.py:21-61) and its ``G_ema``
     matches our generator to PSNR > 40 dB (the BASELINE.md parity bar).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import HAS_REFERENCE, REFERENCE_PATH, stub_torchvision
from montage_gan_tpu import models
from montage_gan_tpu.utils import torch_export, torch_import

if HAS_REFERENCE:
    stub_torchvision()

torch = pytest.importorskip("torch")

quick = pytest.mark.quick


def setup_module(module):
    np.random.seed(0)
    torch.manual_seed(0)


def assert_state_dicts_equal(got, want, atol=0.0):
    assert list(got.keys()) == list(want.keys())
    for k in want:
        np.testing.assert_allclose(
            got[k].numpy(), want[k].numpy(), atol=atol, rtol=0,
            err_msg=f'key {k}')


# ---------------------------------------------------------------------------
# 1. import → export bit-round-trips
# ---------------------------------------------------------------------------

@pytest.mark.reference
def test_mapping_roundtrip():
    from custom.networks_aio import GlobalMappingNetwork, MappingNetwork
    for ref in (MappingNetwork(z_dim=32, w_dim=32, num_ws=6, num_layers=3),
                GlobalMappingNetwork(z_dim=32, w_dim=32, num_ws=6,
                                     num_layers=3, num_splits=5)):
        sd = ref.state_dict()
        back = torch_export.mapping_state_dict(
            torch_import.mapping_params_from_torch(sd))
        assert_state_dicts_equal(back, sd)


@pytest.mark.reference
def test_synthesis_roundtrip():
    from custom.networks_aio import SynthesisNetwork
    ref = SynthesisNetwork(w_dim=32, img_resolution=32, img_channels=4,
                           init_res=[4, 8], conv_config_index=2,
                           channel_base=2048, channel_max=64)
    sd = ref.state_dict()
    back = torch_export.synthesis_state_dict(
        torch_import.synthesis_params_from_torch(sd))
    assert_state_dicts_equal(back, sd)


@pytest.mark.reference
def test_discriminator_roundtrip():
    from custom.networks_aio import Discriminator
    ref = Discriminator(c_dim=0, img_resolution=32, img_channels=4,
                        init_res=[4, 8], conv_config_index=2,
                        channel_base=2048, channel_max=64,
                        epilogue_kwargs=dict(mbstd_group_size=2))
    sd = ref.state_dict()
    back = torch_export.discriminator_state_dict(
        torch_import.discriminator_params_from_torch(sd, init_res=(4, 8)),
        init_res=(4, 8))
    assert_state_dicts_equal(back, sd)


@pytest.mark.reference
def test_stn_roundtrip():
    from fukuwarai.networks import STNv2c
    ref = STNv2c(img_resolution=256, img_channels=4, img_layers=3)
    sd = ref.state_dict()
    back = torch_export.stn_state_dict(
        torch_import.stn_params_from_torch(sd))
    assert_state_dicts_equal(back, sd)


@pytest.mark.reference
@pytest.mark.parametrize('rtype,cls', [('tanh', 'RendererTanh'),
                                       ('sigmoid', 'Renderer'),
                                       ('subpixel', 'RendererSubPixelConv')])
def test_renderer_roundtrip(rtype, cls):
    import diff_rendering.networks as ref_nets
    ref = getattr(ref_nets, cls)(img_resolution=64, img_channels=4,
                                 img_layers=9)
    sd = ref.state_dict()
    back = torch_export.renderer_state_dict(
        torch_import.renderer_params_from_torch(sd, rtype), rtype)
    assert_state_dicts_equal(back, sd)


@pytest.mark.reference
def test_augment_pipe_state_dict_matches_reference():
    from training.augment import AugmentPipe
    ref = AugmentPipe(xflip=1, scale=1, rotate=1, imgfilter=1)
    sd = ref.state_dict()
    ours = torch_export.augment_pipe_state_dict(0.37)
    assert list(ours.keys()) == list(sd.keys())
    np.testing.assert_allclose(ours['Hz_geom'].numpy(),
                               sd['Hz_geom'].numpy(), atol=1e-7)
    np.testing.assert_allclose(ours['Hz_fbank'].numpy(),
                               sd['Hz_fbank'].numpy(), atol=1e-7)
    assert float(ours['p']) == pytest.approx(0.37)


# ---------------------------------------------------------------------------
# 2. full AIO snapshot → reference resume logic → forward parity
# ---------------------------------------------------------------------------

@pytest.mark.reference
def test_aio_snapshot_loads_into_reference_modules(tmp_path):
    from custom.networks_aio import (Discriminator, GlobalMappingNetwork,
                                     SynthesisNetwork)
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

    # base 256: the reference's fixed 5-stage VALID-padded STN localization
    # net (the exportable depth) needs the full 256-px canvas; channels are
    # kept tiny via channel_base/channel_max
    cfg = MontageConfig(
        layer_names=('a', 'b'), layer_targets=((256, 256), (64, 32)),
        base_resolution=256, conv_config_index=3,
        z_dim=32, w_dim=32, mapping_num_layers=2,
        channel_base=512, channel_max=32, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=5,
        train_global=True, renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    trainer = MontageTrainer(ens, TrainHyper(batch_size=2))
    state = trainer.init_state(jax.random.PRNGKey(0), batch=2)
    path = os.path.join(tmp_path, 'network-snapshot-000000.pth')
    torch_export.export_aio_snapshot(state, cfg, path,
                                     training_set_kwargs={'path': 'x'})

    data = torch.load(path, map_location='cpu', weights_only=False)
    assert set(data) >= {'training_set_kwargs', 'mapping_network',
                         'local_G_list', 'local_D_list', 'renderer',
                         'mapping_network_ema', 'local_G_ema',
                         'augment_pipe_list', 'pos_estimator',
                         'pos_estimator_ema', 'global_augment_pipe',
                         'global_D'}

    # --- the reference resume path: strict load_state_dict per module
    # (GlobalMapping sizes already match, so the zip rule is a no-op)
    ref_map = GlobalMappingNetwork(z_dim=32, w_dim=32,
                                   num_ws=ens.mapping.num_ws,
                                   num_layers=2, num_splits=2)
    ref_map.load_state_dict(data['mapping_network'])
    ref_map.eval()

    ref_gs, ref_ds = [], []
    for i in range(2):
        init_res, res = cfg.layer_geometry(i)
        ref_g = SynthesisNetwork(w_dim=32, img_resolution=res,
                                 img_channels=4, init_res=list(init_res),
                                 conv_config_index=3, channel_base=512,
                                 channel_max=32)
        ref_g.load_state_dict(data['local_G_list'][i])
        ref_gs.append(ref_g.eval())
        ref_d = Discriminator(c_dim=0, img_resolution=res, img_channels=4,
                              init_res=list(init_res), conv_config_index=3,
                              channel_base=512, channel_max=32,
                              epilogue_kwargs=dict(mbstd_group_size=2))
        ref_d.load_state_dict(data['local_D_list'][i])
        ref_ds.append(ref_d.eval())

    # --- forward parity through the loaded reference modules
    z = np.random.randn(2, 32).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref_map(torch.from_numpy(z)).numpy()  # [B, L, num_ws, w]
    ws = np.asarray(ens.mapping.apply(state.variables['mapping'],
                                      jnp.asarray(z)))
    np.testing.assert_allclose(ws, ws_ref, rtol=1e-4, atol=1e-5)

    for i in range(2):
        # each local G consumes its own num_ws prefix of the broadcast ws
        # (the reference loss slices likewise, custom/loss_aio.py:69-79)
        ws_i = ws[:, i, :ref_gs[i].num_ws]
        with torch.no_grad():
            img_ref = ref_gs[i](torch.from_numpy(ws_i), noise_mode='const',
                                force_fp32=True).numpy()
        img = np.asarray(ens.local_gs[i].apply(
            state.variables['local_g'][i], jnp.asarray(ws_i),
            noise_mode='const', force_fp32=True))
        img_ref = img_ref.transpose(0, 2, 3, 1)
        mse = float(np.mean((img - img_ref) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] → peak 2
        assert psnr > 40.0, psnr
        with torch.no_grad():
            logits_ref = ref_ds[i](torch.from_numpy(np.ascontiguousarray(
                img_ref.transpose(0, 3, 1, 2))), force_fp32=True).numpy()
        logits = np.asarray(ens.local_ds[i].apply(
            state.variables['local_d'][i], jnp.asarray(img_ref),
            force_fp32=True))
        np.testing.assert_allclose(logits, logits_ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# 3. SG2 .pkl → reference legacy loader → G_ema forward parity
# ---------------------------------------------------------------------------

@pytest.mark.reference
def test_network_pkl_loads_via_reference_legacy(tmp_path):
    import legacy as ref_legacy

    z_dim = w_dim = 32
    target, cci = (32, 32), 2
    from montage_gan_tpu.utils.calc_res import calc_init_res
    init_res, res, _ = calc_init_res(list(target), conv_config_index=cci)

    ours_map = models.MappingNetwork(z_dim=z_dim, w_dim=w_dim, num_ws=8,
                                     num_layers=2)
    ours_syn = models.SynthesisNetwork(
        w_dim=w_dim, img_resolution=res, img_channels=4,
        init_res=tuple(init_res), conv_config_index=cci,
        channel_base=512, channel_max=32)
    assert ours_syn.num_ws == 8
    key = jax.random.PRNGKey(1)
    m_vars = ours_map.init({'params': key}, jnp.zeros((1, z_dim)), None)
    s_vars = ours_syn.init(
        {'params': jax.random.fold_in(key, 1),
         'noise': jax.random.fold_in(key, 2)},
        jnp.zeros((1, 8, w_dim)), noise_mode='const')

    g_kwargs = dict(z_dim=z_dim, c_dim=0, w_dim=w_dim,
                    img_resolution=res, img_channels=4,
                    init_res=list(init_res),
                    mapping_kwargs=dict(num_layers=2),
                    synthesis_kwargs=dict(conv_config_index=cci,
                                          channel_base=512, channel_max=32))
    path = os.path.join(tmp_path, 'export.pkl')
    torch_export.export_network_pkl(
        path, g_kwargs=g_kwargs, mapping_vars=m_vars, synthesis_vars=s_vars)

    with open(path, 'rb') as f:
        data = ref_legacy.load_network_pkl(f)
    g_ema = data['G_ema'].eval()

    z = np.random.randn(2, z_dim).astype(np.float32)
    with torch.no_grad():
        img_ref = g_ema(torch.from_numpy(z), None, noise_mode='const',
                        force_fp32=True).numpy().transpose(0, 2, 3, 1)
    ws = ours_map.apply(m_vars, jnp.asarray(z))
    img = np.asarray(ours_syn.apply(s_vars, ws, noise_mode='const',
                                    force_fp32=True))
    mse = float(np.mean((img - img_ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 40.0, psnr


# ---------------------------------------------------------------------------
# 4. the export-torch CLI (cli/export_torch.py)
# ---------------------------------------------------------------------------

def _tiny_ema_snapshot(tmp_path, base):
    """A tiny 2-layer montage EMA snapshot pair on disk, plus its pieces."""
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.utils.checkpoint import save_ema_snapshot
    cfg = MontageConfig(
        layer_names=('a', 'b'), layer_targets=((base, base), (base // 2,
                                                              base // 4)),
        base_resolution=base, conv_config_index=2,
        z_dim=16, w_dim=16, mapping_num_layers=2,
        channel_base=512, channel_max=32, num_fp16_res=0,
        mbstd_group_size=2, stn_stages=5 if base >= 256 else 2,
        train_global=True, renderer_type='tanh')
    ens = MontageEnsemble(cfg)
    variables = ens.init_variables(jax.random.PRNGKey(7), batch=1)
    tree = {'mapping': variables['mapping'],
            'local_g': tuple(variables['local_g']),
            'stn': variables['stn'], 'renderer': variables['renderer']}
    snap = os.path.join(tmp_path, 'ema-snapshot-000001')
    save_ema_snapshot(snap, cfg, tree)
    return cfg, ens, tree, snap + '.msgpack'


def test_export_torch_cli_pth(tmp_path):
    """export-torch --format pth: the written dict carries the EMA weights
    under both live and *_ema keys with reference state_dict layouts."""
    from click.testing import CliRunner

    from montage_gan_tpu.cli.export_torch import main as export_torch
    cfg, ens, tree, snap = _tiny_ema_snapshot(tmp_path, base=64)
    dest = os.path.join(tmp_path, 'out.pth')
    res = CliRunner().invoke(export_torch,
                             ['--network', snap, '--dest', dest])
    assert res.exit_code == 0, res.output
    data = torch.load(dest, map_location='cpu', weights_only=False)
    assert set(data) == {'training_set_kwargs', 'mapping_network',
                         'mapping_network_ema', 'local_G_list', 'local_G_ema',
                         'renderer', 'pos_estimator', 'pos_estimator_ema'}
    want = torch_export.synthesis_state_dict(tree['local_g'][1])
    assert_state_dicts_equal(data['local_G_ema'][1], want)
    assert_state_dicts_equal(data['local_G_list'][1], want)
    assert_state_dicts_equal(data['mapping_network'],
                             torch_export.mapping_state_dict(tree['mapping']))


@quick
def test_slice_global_mapping_inverts_widening():
    """slice_global_mapping is the exact inverse of the import-side widening
    (torch_import.widen_mapping_to_global, reference
    custom/training_loop_aio.py:321-334): widen a plain mapping to L splits,
    slice any lane back out, recover the original bit-for-bit."""
    from montage_gan_tpu.cli.export_torch import slice_global_mapping
    from montage_gan_tpu.models import MappingNetwork
    net = MappingNetwork(z_dim=16, w_dim=16, num_ws=4, num_layers=2)
    variables = net.init({'params': jax.random.PRNGKey(0)},
                         jnp.zeros((1, 16)), None)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # give w_avg a non-trivial value so the slice is observable
    variables['moving_stats']['w_avg'] = np.arange(16, dtype=np.float32)
    widened = torch_import.widen_mapping_to_global(variables, num_layers=3)
    for idx in range(3):
        back = slice_global_mapping(widened, 3, idx)
        got = jax.tree_util.tree_leaves(back)
        want = jax.tree_util.tree_leaves(variables)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.reference
def test_export_torch_cli_pkl_layer_forward_parity(tmp_path):
    """export-torch --format pkl --layer b: the written pickle loads through
    the reference's legacy loader and its G_ema reproduces OUR layer-b
    synthesis driven by the GlobalMapping's b-lane to PSNR > 40 dB."""
    import legacy as ref_legacy

    from click.testing import CliRunner

    from montage_gan_tpu.cli.export_torch import main as export_torch
    cfg, ens, tree, snap = _tiny_ema_snapshot(tmp_path, base=64)
    dest = os.path.join(tmp_path, 'layer_b.pkl')
    res = CliRunner().invoke(
        export_torch, ['--network', snap, '--dest', dest, '--format', 'pkl',
                       '--layer', 'b', '--reference-path', REFERENCE_PATH])
    assert res.exit_code == 0, res.output

    with open(dest, 'rb') as f:
        g_ema = ref_legacy.load_network_pkl(f)['G_ema'].eval()
    z = np.random.RandomState(3).randn(2, cfg.z_dim).astype(np.float32)
    with torch.no_grad():
        img_ref = g_ema(torch.from_numpy(z), None, noise_mode='const',
                        force_fp32=True).numpy().transpose(0, 2, 3, 1)
    ws = ens.mapping.apply(tree['mapping'], jnp.asarray(z))  # [B,L,num_ws,w]
    img = np.asarray(ens.local_gs[1].apply(
        tree['local_g'][1], ws[:, 1], noise_mode='const', force_fp32=True))
    mse = float(np.mean((img - img_ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 40.0, psnr
