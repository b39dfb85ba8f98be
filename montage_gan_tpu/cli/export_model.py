"""Export a trained snapshot as a portable StableHLO serving artifact.

TPU-native deployment surface with no reference analogue (the reference
ships Python pickles that require the model source to load,
generate.py:86-124): the full inference composition is ahead-of-time
lowered with ``jax.export`` and serialized, so serving hosts need no model
code — see utils/serving.py.

    python -m montage_gan_tpu.cli.export_model \\
        --network runs/.../ema-snapshot-000100.msgpack \\
        --out montage.mgtserve --platforms tpu,cpu --verify
"""

from __future__ import annotations

import click


@click.command()
@click.option('--network', 'network_path', required=True, metavar='PATH',
              help='EMA snapshot (.msgpack with sibling .json)')
@click.option('--out', 'out_path', required=True, metavar='FILE')
@click.option('--platforms', default='tpu,cpu', show_default=True,
              help='Comma-separated lowering targets')
@click.option('--batch', type=int, default=None,
              help='Pin the batch dimension; default: symbolic (any batch)')
@click.option('--trunc', 'truncation_psi', type=float, default=1.0,
              show_default=True)
@click.option('--noise-mode', type=click.Choice(['const', 'random', 'none']),
              default='const', show_default=True)
@click.option('--composite', type=click.Choice(['alpha', 'renderer']),
              default='alpha', show_default=True)
@click.option('--verify', is_flag=True, default=False,
              help='Reload the artifact and check it matches direct '
                   'execution on this host')
def main(network_path, out_path, platforms, batch, truncation_psi,
         noise_mode, composite, verify):
    """Freeze a generator snapshot into a serving artifact."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import numpy as np

    from ..utils.checkpoint import load_ema_snapshot
    from ..utils.serving import (build_inference_fn, export_file, load_file)

    cfg, ens, tree = load_ema_snapshot(network_path)
    plats = tuple(p.strip() for p in platforms.split(',') if p.strip())
    # verification runs on this host's backend — it must be a target
    host = jax.devices()[0].platform
    if verify and host not in plats:
        raise click.UsageError(
            f'--verify runs on this host ({host}), which is not in '
            f'--platforms {plats}')
    meta = export_file(out_path, cfg, ens, tree,
                       truncation_psi=truncation_psi,
                       noise_mode=noise_mode, composite=composite,
                       platforms=plats, batch=batch)
    import os
    print(f'exported {out_path} ({os.path.getsize(out_path) / 1e6:.1f} MB): '
          f'{meta}')

    if verify:
        meta2, call = load_file(out_path)
        b = batch or 2
        z = np.random.RandomState(0).randn(b, cfg.z_dim).astype(np.float32)
        seed = np.uint32(7)
        placed_a, img_a = jax.jit(call)(z, seed)
        fn = build_inference_fn(cfg, ens, tree,
                                truncation_psi=truncation_psi,
                                noise_mode=noise_mode, composite=composite)
        placed_b, img_b = jax.jit(fn)(z, seed)
        np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(placed_a),
                                   np.asarray(placed_b),
                                   rtol=2e-4, atol=2e-5)
        print(f'verify OK: artifact matches direct execution at batch {b}')


if __name__ == '__main__':
    main()
