"""All-in-one MontageGAN trainer CLI.

CLI parity with the reference's train_aio.py (reference: train_aio.py:428-585
flags; cfg preset table :164-197; augpipe presets :307-323), with the
reference's tier-3 source-edited config dicts
(custom/training_loop_aio.py:37-81) promoted to first-class flags.
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import click

from ..data.dataset import DatasetAIO
from ..models.ensemble import MontageConfig
from ..training.augment import AUGPIPE_SPECS, make_augment_config
from ..training.loop_aio import config_from_dataset, training_loop
from ..training.train_step import TrainHyper
from ..utils.config import EasyDict
from ..utils.logging_utils import Logger

# cfg presets (reference: train_aio.py:164-197).  'auto' is resolved at
# runtime from resolution/device count.
CFG_SPECS = {
    'auto':      dict(ref_gpus=-1, kimg=25000, mb=-1, mbstd=-1, fmaps=-1,
                      lrate=-1, gamma=-1, ema=-1, ramp=0.05, map=2),
    'stylegan2': dict(ref_gpus=8, kimg=25000, mb=32, mbstd=4, fmaps=1,
                      lrate=0.002, gamma=10, ema=10, ramp=None, map=8),
    'paper256':  dict(ref_gpus=8, kimg=25000, mb=64, mbstd=8, fmaps=0.5,
                      lrate=0.0025, gamma=1, ema=20, ramp=None, map=8),
    'paper512':  dict(ref_gpus=8, kimg=25000, mb=64, mbstd=8, fmaps=1,
                      lrate=0.0025, gamma=0.5, ema=20, ramp=None, map=8),
    'paper1024': dict(ref_gpus=8, kimg=25000, mb=32, mbstd=4, fmaps=1,
                      lrate=0.002, gamma=2, ema=10, ramp=None, map=8),
    'cifar':     dict(ref_gpus=2, kimg=100000, mb=64, mbstd=32, fmaps=1,
                      lrate=0.0025, gamma=0.01, ema=500, ramp=0.05, map=2),
    'aio':       dict(ref_gpus=8, kimg=25000, mb=32, mbstd=4, fmaps=0.5,
                      lrate=0.0025, gamma=10, ema=10, ramp=None, map=8),
}


def resolve_auto_spec(spec: EasyDict, res: int, num_devices: int) -> EasyDict:
    """'auto' heuristics (reference: train_aio.py:188-197)."""
    spec = EasyDict(spec)
    spec.ref_gpus = num_devices
    spec.mb = max(min(num_devices * min(4096 // res, 32), 64), num_devices)
    spec.mbstd = min(spec.mb // num_devices, 4)
    spec.fmaps = 1 if res >= 512 else 0.5
    spec.lrate = 0.002 if res >= 1024 else 0.0025
    spec.gamma = 0.0002 * (res ** 2) / spec.mb
    spec.ema = spec.mb * 10 / 32
    return spec


def next_run_dir(outdir: str, desc: str) -> str:
    """{id:05d}-{desc} auto-numbering (reference: train_aio.py:535-542)."""
    os.makedirs(outdir, exist_ok=True)
    ids = [int(m.group(1)) for d in os.listdir(outdir)
           if (m := re.match(r'^(\d+)-', d))]
    return os.path.join(outdir, f'{(max(ids) + 1 if ids else 0):05d}-{desc}')


@click.command()
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--data', required=True, metavar='PATH',
              help='Directory-of-directories of layer PNGs')
@click.option('--gpus', 'num_devices', type=int, default=None,
              help='Devices to use (default: all)')
@click.option('--snap', 'img_snap', type=int, default=1)
@click.option('--net-snap', type=int, default=50)
@click.option('--seed', type=int, default=0)
@click.option('--metrics', default='none', help='Comma-separated or "none"')
@click.option('--mirror', type=bool, default=False)
@click.option('--cfg', type=click.Choice(list(CFG_SPECS)), default='aio')
@click.option('--gamma', type=float, default=None)
@click.option('--kimg', type=int, default=None)
@click.option('--batch', type=int, default=None)
@click.option('--aug', type=click.Choice(['ada', 'noaug', 'fixed']),
              default='ada')
@click.option('--p', type=float, default=None)
@click.option('--target', type=float, default=None)
@click.option('--augpipe', type=click.Choice(list(AUGPIPE_SPECS)),
              default='bgcfnc')
@click.option('--resume', default=None, metavar='PATH')
@click.option('--fp32', type=bool, default=False)
@click.option('--conv-config-index', type=int, default=3,
              help='Pyramid start exponent (reference training_loop_aio.py:58)')
@click.option('--train-local/--no-train-local', default=True)
@click.option('--train-global/--no-train-global', default=True)
@click.option('--train-renderer/--no-train-renderer', default=True)
@click.option('--bypass-renderer', is_flag=True, default=False)
@click.option('--renderer-type', type=click.Choice(['tanh', 'subpixel']),
              default='tanh')
@click.option('--renderer-import', default=None, metavar='PTH',
              help='Import a reference renderer .pth.tar checkpoint')
@click.option('--global-optimize-interval', type=int, default=1)
@click.option('--aug-p-max', type=float, default=0.6)
@click.option('--dry-run', is_flag=True, default=False)
@click.option('--run-once', is_flag=True, default=False)
@click.option('--channel-base', type=int, default=None,
              help='Override channel_base (testing/small runs)')
@click.option('--channel-max', type=int, default=None)
@click.option('--kimg-per-tick', type=int, default=4)
@click.option('--batch-gpu', 'batch_gpu', type=int, default=None,
              help='Microbatch per accumulation round for local phases '
                   '(reference --batch-gpu)')
@click.option('--global-batch-gpu', type=int, default=None,
              help='Microbatch for the global/renderer phases (HBM '
                   'high-water mark); defaults to --batch-gpu')
@click.option('--merge-locals', type=click.Choice(['per_layer', 'bucket', 'all']),
              default='per_layer',
              help='Local-phase program granularity: one program per phase '
                   'kind per layer geometry, dispatched per layer (default; '
                   'exact reference phase order, fastest measured), '
                   'same-geometry layers vmapped per bucket (measured '
                   'slower on v5e — docs/PERF.md), or ALL layers in one '
                   'program (fewest dispatches; needs >16G HBM)')
@click.option('--precompile/--no-precompile', default=True,
              help='AOT-compile every phase program before the first step '
                   'with concurrent backend compilations (cold-start '
                   'lever; default on)')
@click.option('--trace', 'trace_dir', default=None, metavar='DIR',
              help='Write a profiler trace of a few post-warmup steps')
@click.option('--save-all-layers', is_flag=True, default=False)
@click.option('--run-latent-interpolation', is_flag=True, default=False)
@click.option('--coordinator', default=None, metavar='HOST:PORT',
              help='Multi-host: jax.distributed coordinator (or set '
                   'JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / '
                   'JAX_PROCESS_ID); one process per host, each sees the '
                   'global mesh')
def main(**kwargs):
    """Train MontageGAN all-in-one on TPU."""
    opts = EasyDict(kwargs)
    from ..utils.platform import select_platform
    select_platform()
    from ..parallel.distributed import maybe_initialize
    maybe_initialize(opts.pop('coordinator'))  # before any device query
    import jax

    n_dev = opts.num_devices or len(jax.devices())

    dataset = DatasetAIO(opts.data, xflip=opts.mirror,
                         conv_config_index=opts.conv_config_index)
    res = dataset.resolution

    spec = EasyDict(CFG_SPECS[opts.cfg])
    if opts.cfg == 'auto':
        spec = resolve_auto_spec(spec, res, n_dev)
    batch = opts.batch or spec.mb
    if batch % n_dev != 0:
        raise click.UsageError(f'--batch {batch} must divide {n_dev} devices')

    if not opts.train_global:
        # step-1 semantics (reference: custom/training_loop_aio.py:83-86)
        opts.train_renderer = False
        opts.bypass_renderer = True

    cfg = config_from_dataset(
        dataset,
        channel_base=opts.channel_base or int(spec.fmaps * 32768),
        channel_max=opts.channel_max or 512,
        num_fp16_res=0 if opts.fp32 else 4,
        conv_clamp=None if opts.fp32 else 256,
        mbstd_group_size=spec.mbstd,
        mapping_num_layers=spec.map,
        train_global=opts.train_global,
        renderer_type='none' if opts.bypass_renderer else opts.renderer_type)

    augment = None
    if opts.aug != 'noaug':
        augment = make_augment_config(opts.augpipe)
    ada_target = (opts.target or 0.6) if opts.aug == 'ada' else None
    augment_p = opts.p or 0.0

    # --resume: None | 'noresume' | alias | path | URL
    # (reference: train_aio.py:341-355 — aliases resolve through the
    # retrying/caching opener; resume re-tunes ADA and disables EMA rampup)
    from ..utils.url_util import resolve_resume
    _, resume_desc = resolve_resume(opts.resume, fetch=False, verbose=False)
    is_resume = opts.resume is not None and opts.resume != 'noresume'

    hyper = TrainHyper(
        lrate=spec.lrate, batch_size=batch,
        r1_gamma=opts.gamma if opts.gamma is not None else spec.gamma,
        global_r1_gamma=opts.gamma if opts.gamma is not None else spec.gamma,
        ema_kimg=spec.ema, ema_rampup=None if is_resume else spec.ramp,
        augment=augment, ada_target=ada_target, augment_p_init=augment_p,
        aug_p_max=opts.aug_p_max,
        ada_kimg=100 if is_resume else 500,
        train_local=opts.train_local, train_global=opts.train_global,
        train_renderer=opts.train_renderer,
        bypass_renderer=opts.bypass_renderer,
        global_optimize_interval=opts.global_optimize_interval,
        microbatch=opts.batch_gpu,
        global_microbatch=opts.global_batch_gpu)

    desc = f'{dataset.name}-{opts.cfg}'
    if opts.mirror:
        desc += '-mirror'
    desc += resume_desc
    run_dir = next_run_dir(opts.outdir, desc)

    print(json.dumps({'run_dir': run_dir, 'batch': batch,
                      'devices': n_dev, 'resolution': res,
                      'layers': dataset.layer_names}, indent=2))
    if opts.dry_run:
        print('Dry run; exiting.')
        return

    os.makedirs(run_dir, exist_ok=True)
    logger = Logger(os.path.join(run_dir, 'log.txt'))
    with open(os.path.join(run_dir, 'training_options.json'), 'w') as f:
        json.dump({k: (v if isinstance(v, (int, float, bool, str,
                                           type(None))) else str(v))
                   for k, v in opts.items()}, f, indent=2)

    resume_path, _ = resolve_resume(opts.resume)
    metrics = [] if opts.metrics == 'none' else opts.metrics.split(',')
    try:
        training_loop(
            run_dir=run_dir, dataset=dataset, cfg=cfg, hyper=hyper,
            total_kimg=opts.kimg or spec.kimg,
            kimg_per_tick=opts.kimg_per_tick,
            image_snapshot_ticks=opts.img_snap,
            network_snapshot_ticks=opts.net_snap,
            random_seed=opts.seed, resume_path=resume_path,
            num_devices=opts.num_devices,
            merge_locals=opts.merge_locals,
            precompile=opts.precompile,
            metrics=metrics, run_once=opts.run_once,
            save_all_layers=opts.save_all_layers,
            run_latent_interpolation=opts.run_latent_interpolation,
            trace_dir=opts.trace_dir)
    finally:
        logger.close()


if __name__ == '__main__':
    main()
