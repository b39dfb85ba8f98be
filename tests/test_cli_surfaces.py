"""End-to-end tests for the remaining CLI surfaces (reference §2.9 entry
points): dataset_tool, train (single-GAN SG2-ADA path), style_mixing,
pretrain_renderer (diff_rendering/main_united), pretrain_stn
(fukuwarai/main_*).  Tiny configs on the CPU backend."""

import json
import os
import zipfile

import numpy as np
import pytest

import jax


@pytest.fixture(scope='module')
def image_folder(tmp_path_factory):
    """Flat 16x16 RGB image folder with labels (reference
    training/dataset.py:235-247 layout)."""
    from PIL import Image
    path = tmp_path_factory.mktemp('imgs')
    rng = np.random.RandomState(0)
    labels = []
    for i in range(8):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        name = f'img{i:04d}.png'
        Image.fromarray(img, 'RGB').save(path / name)
        labels.append([name, i % 2])
    with open(path / 'dataset.json', 'w') as f:
        json.dump({'labels': labels}, f)
    return str(path)


@pytest.fixture(scope='module')
def layer_dataset(tmp_path_factory):
    from montage_gan_tpu.data.synthetic import make_synthetic_layer_dataset
    path = str(tmp_path_factory.mktemp('ds') / 'layers')
    spec = (('#1_a', (8, 7), (5, 6)), ('#2_b', (8, 10), (6, 4)))
    make_synthetic_layer_dataset(path, num_samples=6, size=32, spec=spec)
    return path


def test_dataset_tool_folder_to_zip(image_folder, tmp_path):
    """Folder source → zip dest, readable by ImageFolderDataset
    (reference dataset_tool.py:57,288-334)."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.dataset_tool import main
    from montage_gan_tpu.data.dataset import ImageFolderDataset

    dest = str(tmp_path / 'out.zip')
    res = CliRunner().invoke(main, ['--source', image_folder, '--dest', dest],
                             catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert zipfile.is_zipfile(dest)
    ds = ImageFolderDataset(dest, use_labels=True)
    assert len(ds) == 8
    assert ds.resolution == 16
    img, label = ds[0]
    assert img.shape[-1] in (1, 3) and img.dtype == np.uint8  # reference uint8 loader


def test_train_cli_end_to_end(image_folder, tmp_path):
    """The reference train.py path: vanilla SG2-ADA on a flat folder
    (reference train.py:24-399)."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.train import main

    outdir = str(tmp_path / 'runs')
    res = CliRunner().invoke(main, [
        '--outdir', outdir, '--data', image_folder, '--gpus', '1',
        '--kimg', '1', '--batch', '4', '--cfg', 'auto', '--aug', 'noaug',
        '--fp32', 'true', '--channel-base', '256', '--channel-max', '32',
        '--snap', '1', '--metrics', 'fid2k',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    run_dirs = os.listdir(outdir)
    assert len(run_dirs) == 1
    files = set(os.listdir(os.path.join(outdir, run_dirs[0])))
    assert 'stats.jsonl' in files
    assert any('snapshot' in f for f in files), files
    # metric eval at snapshots (reference training/training_loop.py:428-443)
    assert 'metric-fid2k.jsonl' in files, files
    with open(os.path.join(outdir, run_dirs[0], 'metric-fid2k.jsonl')) as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec['results']['fid2k'])


@pytest.fixture(scope='module')
def tiny_ema_snapshot(tmp_path_factory):
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.utils import checkpoint as ckpt
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
    path = str(tmp_path_factory.mktemp('snap') / 'ema-snapshot-000000')
    ckpt.save_ema_snapshot(path, cfg, ema)
    return path


def test_style_mixing_cli(tiny_ema_snapshot, tmp_path):
    """Reference style_mixing.py:72-113 contract: W-space row/col grid."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.style_mixing import main

    outdir = str(tmp_path / 'mix')
    res = CliRunner().invoke(main, [
        '--network', tiny_ema_snapshot, '--rows', '0-1', '--cols', '2-3',
        '--styles', '0-1', '--outdir', outdir,
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert os.path.exists(os.path.join(outdir, 'grid.png'))


def test_pretrain_renderer_and_stn_cli(layer_dataset, tmp_path):
    """Stage-0 pipelines (reference diff_rendering/main_united.py:108-156
    and fukuwarai/main_tanh.py:84-181), chained: renderer ckpt feeds STN."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.pretrain_renderer import main as r_main
    from montage_gan_tpu.cli.pretrain_stn import main as s_main

    r_out = str(tmp_path / 'renderer')
    res = CliRunner().invoke(r_main, [
        '--data', layer_dataset, '--outdir', r_out, '--batch', '2',
        '--steps', '2', '--snap-every', '1',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    ckpts = [f for f in os.listdir(r_out) if f.endswith('.msgpack')]
    assert ckpts, os.listdir(r_out)

    s_out = str(tmp_path / 'stn')
    res = CliRunner().invoke(s_main, [
        '--data', layer_dataset, '--outdir', s_out,
        '--renderer-ckpt', os.path.join(r_out, sorted(ckpts)[-1]),
        '--batch', '2', '--steps', '2', '--snap-every', '1',
        '--discriminator', 'simple',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert any(f.endswith('.msgpack') for f in os.listdir(s_out)), \
        os.listdir(s_out)


def test_run_recipe_dry_run(layer_dataset, tmp_path):
    """run-recipe launcher (reference main.py:27-58): canonical flag set +
    per-recipe extras, overridable, resolved through train_aio --dry-run."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.run_recipe import main

    outdir = str(tmp_path / 'runs')
    res = CliRunner().invoke(main, [
        'step1', '--data', layer_dataset, '--outdir', outdir, '--dry-run',
        '--kimg', '5', '--batch', '4', '--gpus', '1',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert '--augpipe bgcfnc' in res.output  # canonical set applied
    assert '--kimg 5' in res.output          # override took effect
    assert 'Dry run' in res.output

    # step2 refuses to run without --resume (reference main.py semantics)
    res = CliRunner().invoke(main, ['step2', '--data', layer_dataset,
                                    '--outdir', outdir, '--dry-run'])
    assert res.exit_code != 0
    assert 'resume' in res.output

    # metrics recipe wires the metric list through
    res = CliRunner().invoke(main, [
        'metrics', '--data', layer_dataset, '--outdir', outdir,
        '--resume', 'noresume', '--dry-run', '--batch', '4', '--gpus', '1',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert '--metrics fid50k_full,is50k' in res.output
    assert '--run-once' in res.output
