"""Serving-artifact tests (utils/serving.py + cli/export_model.py).

The exported StableHLO artifact must reproduce direct execution exactly on
the same backend, serve ANY batch size from one export (symbolic batch
dim), and refuse foreign files.  This is the TPU-native replacement for
the reference's pickle-based deployment (generate.py:86-124).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.utils import checkpoint as ckpt
from montage_gan_tpu.utils import serving

# The module-scope ensemble fixture costs ~30 s to build; every test that
# uses it is slow-tier so `pytest -m quick` never pays that setup. The
# fixture-free format check stays quick.
quick = pytest.mark.quick
slow = pytest.mark.slow


@pytest.fixture(scope='module')
def tiny(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('serve')
    cfg = MontageConfig(layer_names=('a', 'b'),
                        layer_targets=((16, 16), (16, 16)),
                        base_resolution=16, img_channels=4,
                        conv_config_index=2, z_dim=8, w_dim=8,
                        mapping_num_layers=2, channel_base=256,
                        channel_max=32, num_fp16_res=0, conv_clamp=None,
                        mbstd_group_size=2, use_global_mapping=True,
                        train_global=True, renderer_type='tanh',
                        stn_stages=1)
    ens = MontageEnsemble(cfg)
    variables = ens.init_variables(jax.random.PRNGKey(0), batch=1)
    ema = {'mapping': variables['mapping'],
           'local_g': tuple(variables['local_g']),
           'stn': variables['stn'],
           'renderer': variables['renderer']}
    path = str(tmp / 'ema-snapshot-000000')
    ckpt.save_ema_snapshot(path, cfg, ema)
    cfg2, ens2, tree = ckpt.load_ema_snapshot(path)
    return cfg2, ens2, tree, path


@slow
def test_roundtrip_matches_direct_execution(tiny):
    cfg, ens, tree, _ = tiny
    blob = serving.export_generator(cfg, ens, tree, platforms=('cpu',),
                                    noise_mode='const')
    meta, call = serving.load_exported(blob)
    assert meta['z_dim'] == cfg.z_dim
    fn = serving.build_inference_fn(cfg, ens, tree, noise_mode='const')
    z = np.random.RandomState(1).randn(3, cfg.z_dim).astype(np.float32)
    placed_a, img_a = jax.jit(call)(z, np.uint32(5))
    placed_b, img_b = jax.jit(fn)(z, jnp.uint32(5))
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(placed_a), np.asarray(placed_b),
                               rtol=1e-5, atol=1e-6)


@slow
def test_symbolic_batch_serves_multiple_sizes(tiny):
    cfg, ens, tree, _ = tiny
    blob = serving.export_generator(cfg, ens, tree, platforms=('cpu',))
    _, call = serving.load_exported(blob)
    for b in (1, 4):
        z = np.zeros((b, cfg.z_dim), np.float32)
        placed, img = jax.jit(call)(z, np.uint32(0))
        assert placed.shape == (b, cfg.num_layers, 16, 16, 4)
        assert img.shape == (b, 16, 16, 4)


@slow
def test_renderer_composite_differs_from_alpha(tiny):
    cfg, ens, tree, _ = tiny
    z = np.random.RandomState(2).randn(2, cfg.z_dim).astype(np.float32)
    outs = {}
    for comp in ('alpha', 'renderer'):
        fn = serving.build_inference_fn(cfg, ens, tree, composite=comp)
        outs[comp] = np.asarray(jax.jit(fn)(z, jnp.uint32(0))[1])
    assert not np.allclose(outs['alpha'], outs['renderer'])


@quick
def test_rejects_foreign_file():
    with pytest.raises(ValueError, match='magic'):
        serving.load_exported(b'\x00' * 64)


@slow
def test_export_model_cli(tiny, tmp_path):
    from click.testing import CliRunner

    from montage_gan_tpu.cli.export_model import main as export_main

    _, _, _, snap = tiny
    out = str(tmp_path / 'model.mgtserve')
    res = CliRunner().invoke(
        export_main, ['--network', snap, '--out', out,
                      '--platforms', 'cpu', '--verify'])
    assert res.exit_code == 0, res.output
    assert os.path.getsize(out) > 0
    meta, call = serving.load_file(out)
    assert meta['platforms'] == ['cpu']
    z = np.zeros((2, meta['z_dim']), np.float32)
    _, img = jax.jit(call)(z, np.uint32(0))
    assert img.shape[0] == 2


@pytest.mark.parametrize('comp', ['alpha', 'renderer'])
@slow
def test_generate_cli_msgpack_path(tiny, tmp_path, comp):
    """generate.py's snapshot path now routes through the same
    build_inference_fn the exporter freezes — pin the CLI end-to-end
    (RGBA montage + per-layer PNGs)."""
    from click.testing import CliRunner

    from montage_gan_tpu.cli.generate import main as gen_main

    _, _, _, snap = tiny
    outdir = str(tmp_path / f'gen_{comp}')
    res = CliRunner().invoke(
        gen_main, ['--network', snap, '--seeds', '0-1', '--outdir', outdir,
                   '--save-layers', '--composite', comp])
    assert res.exit_code == 0, res.output
    files = sorted(os.listdir(outdir))
    assert 'seed0000.png' in files and 'seed0001.png' in files
    assert any('-0_a' in f for f in files) and any('-1_b' in f
                                                   for f in files)
