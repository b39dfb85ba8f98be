"""Projector (latent inversion) smoke tests.

Covers the reference projector contract (reference: projector.py:26-132):
w initialized at the mapping average, Adam with ramped lr, optional noise
buffer co-optimization with multi-scale decorrelation regularization and
per-step renormalization, outputs proj.png + projected_w.npz.
"""

import os

import numpy as np
import pytest

import jax

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope='module')
def tiny_snapshot(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('proj')
    cfg = MontageConfig(layer_names=('a', 'b'),
                        layer_targets=((16, 16), (16, 16)),
                        base_resolution=16, img_channels=4,
                        conv_config_index=2, z_dim=8, w_dim=8,
                        mapping_num_layers=2, channel_base=256,
                        channel_max=32, num_fp16_res=0, conv_clamp=None,
                        mbstd_group_size=2, use_global_mapping=True,
                        train_global=True, renderer_type='none',
                        stn_stages=1)
    ens = MontageEnsemble(cfg)
    variables = ens.init_variables(jax.random.PRNGKey(0), batch=1)
    ema = {'mapping': variables['mapping'],
           'local_g': tuple(variables['local_g']),
           'stn': variables['stn']}
    path = str(tmp / 'ema-snapshot-000000')
    ckpt.save_ema_snapshot(path, cfg, ema)

    from PIL import Image
    rng = np.random.RandomState(0)
    target = (rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    target_path = str(tmp / 'target.png')
    Image.fromarray(target, 'RGBA').save(target_path)
    return path, target_path


@pytest.mark.parametrize('noise_flag', ['--optimize-noise',
                                        '--no-optimize-noise'])
def test_projector_cli(tiny_snapshot, tmp_path, noise_flag):
    from click.testing import CliRunner
    from montage_gan_tpu.cli.projector import main as proj_main

    path, target_path = tiny_snapshot
    outdir = str(tmp_path / ('out' + noise_flag.replace('-', '')))
    res = CliRunner().invoke(
        proj_main, ['--network', path, '--target', target_path,
                    '--num-steps', '4', '--outdir', outdir, noise_flag,
                    '--save-video'])
    assert res.exit_code == 0, res.output
    assert os.path.exists(os.path.join(outdir, 'proj.png'))
    w = np.load(os.path.join(outdir, 'projected_w.npz'))['w']
    assert np.all(np.isfinite(w))
    # animated progress video (reference projector.py:191-199; GIF here)
    from PIL import Image
    gif = Image.open(os.path.join(outdir, 'proj.gif'))
    assert getattr(gif, 'is_animated', False) or gif.n_frames >= 1
    # side-by-side target|synth layout → width is 2x the target's
    assert gif.size[0] == 2 * gif.size[1]


def test_generate_replays_projected_w(tiny_snapshot, tmp_path):
    """The inversion → regenerate loop (reference: generate.py:92-103 replays
    projector.py's projected_w.npz): project a target, then
    ``generate --projected-w`` must reproduce the projector's own final
    render through the ensemble path.  With --no-optimize-noise the replay
    uses the same const noise buffers, so the match is near-exact."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.generate import main as gen_main
    from montage_gan_tpu.cli.projector import main as proj_main
    from PIL import Image

    path, target_path = tiny_snapshot
    proj_dir = str(tmp_path / 'proj')
    res = CliRunner().invoke(
        proj_main, ['--network', path, '--target', target_path,
                    '--num-steps', '3', '--outdir', proj_dir,
                    '--no-optimize-noise'])
    assert res.exit_code == 0, res.output

    gen_dir = str(tmp_path / 'replay')
    res = CliRunner().invoke(
        gen_main, ['--network', path, '--outdir', gen_dir, '--save-layers',
                   '--projected-w', os.path.join(proj_dir,
                                                 'projected_w.npz')])
    assert res.exit_code == 0, res.output
    replay = np.asarray(Image.open(os.path.join(gen_dir, 'proj00.png')),
                        np.float32) / 255.0
    ref = np.asarray(Image.open(os.path.join(proj_dir, 'proj.png')),
                     np.float32) / 255.0
    mse = float(np.mean(np.square(replay - ref)))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 40.0, f'replay PSNR {psnr:.1f} dB'
    # per-layer dumps ride along
    assert os.path.exists(os.path.join(gen_dir, 'proj00-0_a.png'))

    # seeds become optional only when --projected-w is given
    res = CliRunner().invoke(gen_main, ['--network', path,
                                        '--outdir', gen_dir])
    assert res.exit_code != 0
