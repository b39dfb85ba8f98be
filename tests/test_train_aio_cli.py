"""End-to-end train_aio CLI run on a tiny synthetic layer dataset.

Exercises the full stack the reference's train_aio.py exercises
(reference: train_aio.py:481-577 → custom/training_loop_aio.py:131): click
config assembly, DatasetAIO probing, ensemble construction, the phase
executor, tick/stat sinks, and snapshot writing — on the virtual CPU
backend with a 2-layer 32px config.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    from montage_gan_tpu.data.synthetic import make_synthetic_layer_dataset
    path = str(tmp_path_factory.mktemp('ds') / 'layers')
    spec = (('#1_a', (8, 7), (5, 6)), ('#2_b', (8, 10), (6, 4)))
    make_synthetic_layer_dataset(path, num_samples=8, size=32, spec=spec)
    return path


def test_train_aio_cli_end_to_end(tiny_dataset, tmp_path):
    from click.testing import CliRunner
    from montage_gan_tpu.cli.train_aio import main

    outdir = str(tmp_path / 'runs')
    res = CliRunner().invoke(main, [
        '--outdir', outdir, '--data', tiny_dataset, '--gpus', '1',
        '--kimg', '1', '--batch', '4', '--kimg-per-tick', '1',
        '--snap', '1', '--net-snap', '1', '--cfg', 'auto', '--aug', 'noaug',
        '--fp32', 'true', '--conv-config-index', '2',
        '--channel-base', '256', '--channel-max', '32', '--run-once',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output

    run_dirs = os.listdir(outdir)
    assert len(run_dirs) == 1
    run_dir = os.path.join(outdir, run_dirs[0])
    files = set(os.listdir(run_dir))
    # reference sinks: training_options.json, log.txt, stats.jsonl, reals/
    # fakes grids (training_loop_aio.py:521-550, 871-880)
    assert 'training_options.json' in files
    assert 'log.txt' in files
    with open(os.path.join(run_dir, 'training_options.json')) as f:
        opts = json.load(f)
    assert opts['batch'] == 4
    assert any(f.startswith('reals') for f in files), files
    assert any(f.startswith('fakes') for f in files), files
    assert 'stats.jsonl' in files
    with open(os.path.join(run_dir, 'stats.jsonl')) as f:
        rec = json.loads(f.readline())
    assert any(k.endswith('Loss/G/loss') for k in rec), rec.keys()
    for k, v in rec.items():
        if isinstance(v, dict) and 'mean' in v:
            assert np.isfinite(v['mean']), (k, v)


def test_train_aio_cli_dry_run(tiny_dataset, tmp_path):
    """--dry-run prints the resolved config and exits without training
    (reference train_aio.py:452,559-562)."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.train_aio import main

    res = CliRunner().invoke(main, [
        '--outdir', str(tmp_path / 'runs'), '--data', tiny_dataset, '--gpus', '1',
        '--kimg', '1', '--batch', '4', '--cfg', 'auto', '--dry-run',
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    assert 'batch' in res.output
    assert not os.path.exists(str(tmp_path / 'runs')) or \
        os.listdir(str(tmp_path / 'runs')) == []
