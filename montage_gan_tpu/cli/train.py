"""Single-GAN StyleGAN2-ADA trainer.

CLI parity with the reference's train.py (reference: train.py:24-555): one
generator/discriminator pair on a flat image folder/zip, ADA augmentation,
R1 + path-length lazy regularization, EMA, snapshots.

Implementation: this is the 1-layer / no-global special case of the AIO
trainer — the ensemble degenerates to (MappingNetwork, one SynthesisNetwork,
one Discriminator), which shares every kernel and the whole train step with
the MontageGAN path.
"""

from __future__ import annotations

import json
import os
import time

import click
import numpy as np

from .train_aio import CFG_SPECS, next_run_dir, resolve_auto_spec
from ..training.augment import AUGPIPE_SPECS, make_augment_config
from ..utils.config import EasyDict
from ..utils.logging_utils import Logger


@click.command()
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--data', required=True, metavar='PATH')
@click.option('--gpus', 'num_devices', type=int, default=None)
@click.option('--snap', type=int, default=50)
@click.option('--seed', type=int, default=0)
@click.option('--cond', type=bool, default=False)
@click.option('--mirror', type=bool, default=False)
@click.option('--cfg', type=click.Choice(list(CFG_SPECS)), default='auto')
@click.option('--gamma', type=float, default=None)
@click.option('--kimg', type=int, default=None)
@click.option('--batch', type=int, default=None)
@click.option('--aug', type=click.Choice(['ada', 'noaug', 'fixed']),
              default='ada')
@click.option('--p', type=float, default=None)
@click.option('--target', type=float, default=None)
@click.option('--augpipe', type=click.Choice(list(AUGPIPE_SPECS)),
              default='bgc')
@click.option('--resume', default=None)
@click.option('--freezed', type=int, default=0)
@click.option('--fp32', type=bool, default=False)
@click.option('--channel-base', type=int, default=None,
              help='Override channel_base (testing/small runs)')
@click.option('--channel-max', type=int, default=None)
@click.option('--metrics', default='none',
              help='Comma-separated metric names evaluated at snapshots '
                   '(reference: train.py --metrics, default fid50k_full), '
                   'or "none"')
@click.option('--dry-run', is_flag=True, default=False)
def main(**kwargs):
    """Train a single StyleGAN2-ADA GAN on TPU."""
    opts = EasyDict(kwargs)
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp

    from ..data.dataset import ImageFolderDataset
    from ..data.sampler import InfiniteSampler
    from ..models.ensemble import MontageConfig, MontageEnsemble
    from ..parallel.mesh import (make_mesh, make_parallel_train_step,
                                 replicate, shard_batch)
    from ..training.train_step import MontageTrainer, TrainHyper
    from ..utils import checkpoint as ckpt
    from ..utils.grid import save_image_grid
    from ..utils.training_stats import Collector, JsonlWriter, StatsAccumulator

    dataset = ImageFolderDataset(opts.data, xflip=opts.mirror,
                                 use_labels=opts.cond)
    if opts.cond and not dataset.has_labels:
        raise click.UsageError(
            '--cond=True requires labels in dataset.json '
            '(reference contract: train.py --cond)')
    res = dataset.resolution
    nch = dataset.num_channels
    n_dev = opts.num_devices or len(jax.devices())

    spec = EasyDict(CFG_SPECS[opts.cfg])
    if opts.cfg == 'auto':
        spec = resolve_auto_spec(spec, res, n_dev)
    batch = opts.batch or spec.mb

    cfg = MontageConfig(
        layer_names=('image',), layer_targets=((res, res),),
        base_resolution=res, img_channels=nch, conv_config_index=2,
        c_dim=dataset.label_dim if opts.cond else 0,
        freeze_d_layers=opts.freezed,
        mapping_num_layers=spec.map,
        channel_base=opts.channel_base or int(spec.fmaps * 32768),
        channel_max=opts.channel_max or 512,
        num_fp16_res=0 if opts.fp32 else 4,
        conv_clamp=None if opts.fp32 else 256,
        mbstd_group_size=spec.mbstd,
        use_global_mapping=False, train_global=False, renderer_type='none')

    augment = make_augment_config(opts.augpipe) if opts.aug != 'noaug' else None
    hyper = TrainHyper(
        lrate=spec.lrate, batch_size=batch,
        r1_gamma=opts.gamma if opts.gamma is not None else spec.gamma,
        ema_kimg=spec.ema, ema_rampup=spec.ramp,
        augment=augment,
        ada_target=(opts.target or 0.6) if opts.aug == 'ada' else None,
        augment_p_init=opts.p or 0.0, aug_p_max=1.0,
        train_global=False, train_renderer=False, bypass_renderer=True)
    if opts.cfg == 'cifar':
        hyper = TrainHyper(**{**hyper.__dict__, 'pl_weight': 0.0,
                              'style_mixing_prob': 0.0})

    run_dir = next_run_dir(opts.outdir, f'{dataset.name}-{opts.cfg}')
    print(json.dumps({'run_dir': run_dir, 'batch': batch, 'res': res,
                      'channels': nch, 'devices': n_dev}, indent=2))
    if opts.dry_run:
        print('Dry run; exiting.')
        return
    os.makedirs(run_dir, exist_ok=True)
    logger = Logger(os.path.join(run_dir, 'log.txt'))

    ens = MontageEnsemble(cfg)
    trainer = MontageTrainer(ens, hyper)
    mesh = make_mesh(opts.num_devices)
    state = trainer.init_state(jax.random.PRNGKey(opts.seed), batch=batch)
    if opts.resume and opts.resume != 'noresume':
        # alias | path | URL → local file (reference train.py resume_specs
        # + dnnlib.util.open_url retry/cache, train_aio.py:333-339)
        from ..utils.url_util import resolve_resume
        resume_path, _ = resolve_resume(opts.resume)
        if resume_path.endswith('.pkl'):
            # transfer learning from an SG2-ADA snapshot pickle
            # (reference: training/training_loop.py:166-172)
            from ..utils.pkl_import import transfer_into_train_state
            state = transfer_into_train_state(state, resume_path)
        else:
            state = ckpt.restore_train_state(resume_path, state)
    state = replicate(mesh, state)
    step_fn = make_parallel_train_step(trainer, mesh,
                                       with_labels=opts.cond)

    metric_list = ([] if opts.metrics in ('none', '', None)
                   else opts.metrics.split(','))
    if metric_list:
        from ..metrics import metric_main
        for m in metric_list:
            if not metric_main.is_valid_metric(m):
                raise click.UsageError(
                    f'unknown metric {m}; valid: '
                    f'{metric_main.list_valid_metrics()}')
    _metric_cache: dict = {}

    def eval_metrics(host_state, snapshot_path):
        """Metric eval at snapshots (reference: training/training_loop.py:
        428-443 — same metric_main path the AIO loop uses)."""
        from ..metrics import metric_main
        from ..metrics.features import build_extractor
        ema_vars = dict(host_state.ema)
        if _metric_cache.get('synth') is None:
            @jax.jit
            def _synth(vars_, z):
                ws = ens.mapping.apply(vars_['mapping'], z)
                img = ens.local_gs[0].apply(vars_['local_g'][0],
                                            ens.ws_for_layer(ws, 0),
                                            noise_mode='const')
                return jnp.clip(img * 0.5 + 0.5, 0, 1)

            @jax.jit
            def _map(vars_, z):
                return ens.mapping.apply(vars_['mapping'], z)

            @jax.jit
            def _synth_ws(vars_, ws):
                img = ens.local_gs[0].apply(vars_['local_g'][0],
                                            ens.ws_for_layer(ws, 0),
                                            noise_mode='const')
                return jnp.clip(img * 0.5 + 0.5, 0, 1)
            _metric_cache['synth'] = _synth
            _metric_cache['map'] = _map
            _metric_cache['synth_ws'] = _synth_ws
            _metric_cache['extractor'] = build_extractor('auto')
        for m in metric_list:
            result = metric_main.calc_metric(
                m, dataset=dataset,
                sample_fn=lambda z: _metric_cache['synth'](ema_vars, z),
                map_fn=lambda z: _metric_cache['map'](ema_vars, z),
                synth_fn=lambda ws: _metric_cache['synth_ws'](ema_vars, ws),
                ppl_samples=2000, z_dim=cfg.z_dim,
                extractor=_metric_cache['extractor'],
                cache_dir=os.path.join(run_dir, 'metric-cache'),
                mesh=mesh)  # fan eval over the training mesh
            metric_main.report_metric(result, run_dir=run_dir,
                                      snapshot_pkl=snapshot_path)
            for k, v in result.results.items():
                acc.report(f'Metrics/{k}', v)

    sampler = iter(InfiniteSampler(len(dataset), seed=opts.seed))
    label_rng = np.random.RandomState(opts.seed + 2)
    acc = StatsAccumulator()
    collector = Collector(acc)
    jsonl = JsonlWriter(os.path.join(run_dir, 'stats.jsonl'))

    def fetch_batch():
        idx = [next(sampler) for _ in range(batch)]
        imgs = np.stack([dataset[i][0] for i in idx])
        imgs = imgs.astype(np.float32) / 127.5 - 1.0  # [-1, 1] NHWC
        if not opts.cond:
            return imgs, None, None
        real_c = np.stack([dataset.get_label(i) for i in idx])
        # gen label pool drawn from the dataset label distribution
        # (reference: training_loop.py all_gen_c sampling)
        gen_c = np.stack([dataset.get_label(
            label_rng.randint(len(dataset))) for _ in range(batch)])
        return imgs, real_c.astype(np.float32), gen_c.astype(np.float32)

    total_kimg = opts.kimg or spec.kimg
    cur_nimg, cur_tick = 0, 0
    tick_start, t0 = 0, time.time()
    print(f'Training for {total_kimg} kimg...')
    while cur_nimg < total_kimg * 1000:
        real_np, real_c, gen_c = fetch_batch()
        real = jnp.asarray(real_np)
        # single-layer "stack" view of the same batch
        stack = shard_batch(mesh, real[:, None])
        crops = shard_batch(mesh, (real,))
        rng = jax.random.fold_in(jax.random.PRNGKey(opts.seed + 1), cur_nimg)
        if opts.cond:
            state, stats = step_fn(state, stack, crops, replicate(mesh, rng),
                                   shard_batch(mesh, jnp.asarray(real_c)),
                                   shard_batch(mesh, jnp.asarray(gen_c)))
        else:
            state, stats = step_fn(state, stack, crops, replicate(mesh, rng))
        cur_nimg += batch
        acc.report_dict({k: np.asarray(v) for k, v in stats.items()})

        if cur_nimg - tick_start >= 4000 or cur_nimg >= total_kimg * 1000:
            dt = time.time() - t0
            print(f'tick {cur_tick:<4d} kimg {cur_nimg / 1e3:<8.1f} '
                  f'time {dt:<8.0f}s '
                  f'sec/kimg {dt / max(cur_nimg, 1) * 1e3:<6.2f}')
            collector.update()
            jsonl.write(collector.as_dict(), timestamp=time.time())
            if cur_tick % opts.snap == 0 or cur_nimg >= total_kimg * 1000:
                host = jax.device_get(state)
                snap_path = ckpt.save_train_state(run_dir, cur_nimg // 1000,
                                                  host)
                ckpt.save_ema_snapshot(
                    os.path.join(run_dir, f'ema-snapshot-{cur_nimg // 1000:06d}'),
                    cfg, dict(host.ema))
                if metric_list:
                    eval_metrics(host, snap_path)
                z = jax.random.normal(jax.random.PRNGKey(0), (16, cfg.z_dim))
                grid_c = (jnp.asarray(np.stack(
                    [dataset.get_label(i % len(dataset)) for i in range(16)],
                ).astype(np.float32)) if opts.cond else None)
                ws = ens.mapping.apply(host.ema['mapping'], z, grid_c)
                imgs = ens.local_gs[0].apply(host.ema['local_g'][0],
                                             ens.ws_for_layer(ws, 0),
                                             noise_mode='const')
                save_image_grid((np.asarray(imgs) + 1) / 2,
                                os.path.join(run_dir,
                                             f'fakes{cur_nimg // 1000:06d}.png'),
                                nrow=4)
            cur_tick += 1
            tick_start = cur_nimg
    jsonl.close()
    logger.close()
    print('Exiting...')


if __name__ == '__main__':
    main()
