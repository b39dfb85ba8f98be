"""Standalone metric runner on a snapshot.

CLI parity with the reference's calc_metrics.py
(reference: calc_metrics.py:29-191), over msgpack EMA snapshots instead of
pickles, single-program instead of spawn/DDP.
"""

from __future__ import annotations

import os

import click


@click.command()
@click.option('--network', 'network_path', required=True, metavar='PATH')
@click.option('--metrics', default='fid2k', help='Comma-separated metric names')
@click.option('--data', required=True, metavar='DIR')
@click.option('--mirror', type=bool, default=False)
@click.option('--extractor', type=click.Choice(['auto', 'random', 'inception']),
              default='auto')
@click.option('--cache-dir', default='/tmp/mgt-metric-cache')
@click.option('--batch', type=int, default=16)
@click.option('--seed', type=int, default=0)
@click.option('--ppl-samples', type=int, default=None,
              help='PPL sample budget (default: the reference 50k)')
@click.option('--gpus', 'num_devices', type=int, default=1,
              help='Devices to fan metric eval out over (reference '
                   'calc_metrics.py --gpus; here a batch-sharded mesh '
                   'instead of DDP ranks)')
def main(network_path, metrics, data, mirror, extractor, cache_dir, batch,
         seed, ppl_samples, num_devices):
    """Calculate quality metrics for a trained snapshot."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp

    from ..data.dataset import DatasetAIO
    from ..metrics import metric_main
    from ..metrics.features import build_extractor
    from ..ops.composite import alpha_composite
    from ..utils.checkpoint import load_ema_snapshot
    from ..utils.image_utils import normalize_zero1

    mesh = None
    if num_devices > 1:
        from ..parallel.mesh import make_mesh
        mesh = make_mesh(num_devices)

    metric_list = metrics.split(',')
    for m in metric_list:
        if not metric_main.is_valid_metric(m):
            raise click.UsageError(
                f'unknown metric {m}; valid: {metric_main.list_valid_metrics()}')

    if network_path.endswith('.pkl'):
        # Reference SG2-ADA snapshot: monolithic generator on a flat dataset
        # (reference: calc_metrics.py --network pkl path).
        from ..data.dataset import ImageFolderDataset
        from ..utils.pkl_import import generator_from_pkl
        mapping, map_vars, synthesis, syn_vars, kw = \
            generator_from_pkl(network_path)
        z_dim = kw['z_dim']
        dataset = ImageFolderDataset(data, xflip=mirror)

        @jax.jit
        def sample_fn(z):
            ws = mapping.apply(map_vars, z)
            img = synthesis.apply(syn_vars, ws, noise_mode='const')
            return jnp.clip(img * 0.5 + 0.5, 0, 1)

        map_fn = jax.jit(lambda z: mapping.apply(map_vars, z))

        @jax.jit
        def synth_ws_fn(ws):
            img = synthesis.apply(syn_vars, ws, noise_mode='const')
            return jnp.clip(img * 0.5 + 0.5, 0, 1)
    else:
        cfg, ens, tree = load_ema_snapshot(network_path)
        z_dim = cfg.z_dim
        dataset = DatasetAIO(data, xflip=mirror,
                             conv_config_index=cfg.conv_config_index)

        @jax.jit
        def sample_fn(z):
            """z → composited RGBA [0, 1] (the reference's run_generator
            contract, metrics/metric_utils.py:265-280)."""
            placed, _ = ens.run_global_g(tree, z, noise_mode='const')
            return alpha_composite(normalize_zero1(jnp.clip(placed, -1, 1)))

        map_fn = jax.jit(lambda z: ens.mapping.apply(tree['mapping'], z))

        @jax.jit
        def synth_ws_fn(ws):
            placed, _ = ens.run_global_g_from_ws(tree, ws, noise_mode='const')
            return alpha_composite(normalize_zero1(jnp.clip(placed, -1, 1)))

    ext = build_extractor(extractor)
    run_dir = os.path.dirname(network_path) or '.'
    for m in metric_list:
        result = metric_main.calc_metric(
            m, dataset=dataset, sample_fn=sample_fn, z_dim=z_dim,
            map_fn=map_fn, synth_fn=synth_ws_fn, ppl_samples=ppl_samples,
            extractor=ext, cache_dir=cache_dir, batch_size=batch, seed=seed,
            mesh=mesh)
        metric_main.report_metric(result, run_dir=run_dir,
                                  snapshot_pkl=network_path)


if __name__ == '__main__':
    main()
