"""Renderer checkpoint evaluation: average PSNR over a layered dataset.

Capability parity with the reference's diff_rendering/compare.py
(reference: diff_rendering/compare.py:30-64, which iterates the dataset,
renders each sample through each checkpoint, and prints the average PSNR vs
the alpha-composite target) plus diff_rendering/load_tanh.py:20-65 /
load_sigmoid.py (single-checkpoint eval loaders).  Accepts both native
.msgpack checkpoints (from cli/pretrain_renderer.py) and the reference's
.pth.tar checkpoints through the torch importer.
"""

from __future__ import annotations

import os

import click
import numpy as np


def _load_renderer_params(path: str, renderer_type: str):
    """Load renderer params from a native .msgpack or reference .pth.tar."""
    from ..utils.torch_import import load_reference_renderer

    if path.endswith(('.pth', '.pth.tar')):
        return load_reference_renderer(path, renderer_type)
    # native msgpack: stored as {'global_step', 'renderer': {'params': ...}, ...}
    import flax.serialization
    with open(path, 'rb') as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and 'renderer' in raw:
        return raw['renderer']
    return raw


@click.command()
@click.option('--data', required=True, metavar='DIR',
              help='Layered dataset directory (directory of per-sample dirs).')
@click.option('--ckpt', 'ckpts', required=True, multiple=True, metavar='PATH',
              help='Renderer checkpoint(s): .msgpack or reference .pth.tar. '
                   'Repeatable — each is evaluated and reported.')
@click.option('--renderer-type', type=click.Choice(['tanh', 'sigmoid',
                                                    'subpixel']),
              default='tanh')
@click.option('--batch', type=int, default=16)
@click.option('--random-place/--no-random-place', default=True,
              help='Randomly translate layers before compositing (the '
                   'reference compares on randomly-placed stacks, '
                   'diff_rendering/compare.py:44-49).')
@click.option('--seed', type=int, default=0)
@click.option('--max-samples', type=int, default=None,
              help='Cap the number of dataset samples (default: all).')
def main(data, ckpts, renderer_type, batch, random_place, seed, max_samples):
    """Average-PSNR comparison of renderer checkpoints over a dataset."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp

    from ..data.dataset import DatasetAIO
    from ..models.renderer import build_renderer
    from ..ops.composite import alpha_composite
    from ..utils.image_utils import (calc_psnr, normalize_minus11,
                                     random_position)

    dataset = DatasetAIO(data)
    n = len(dataset) if max_samples is None else min(max_samples, len(dataset))

    renderer = build_renderer(renderer_type, img_resolution=dataset.resolution,
                              img_channels=dataset.num_channels,
                              img_layers=dataset.num_layers)
    sigmoid_range = renderer_type == 'sigmoid'

    @jax.jit
    def eval_batch(params, stack01, key):
        placed01 = (random_position(stack01, key, pad_value=0.0)
                    if random_place else stack01)
        target = alpha_composite(placed01)
        model_in = placed01 if sigmoid_range else normalize_minus11(placed01)
        out = renderer.apply(params, model_in)
        out01 = out if sigmoid_range else (out + 1.0) / 2.0
        # per-sample PSNR, averaged by the caller (matches the reference's
        # per-image accumulation, compare.py:52-58)
        mse = jnp.mean(jnp.square(out01 - target), axis=(1, 2, 3))
        return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))

    results = {}
    for path in ckpts:
        params = _load_renderer_params(path, renderer_type)
        psnrs = []
        for start in range(0, n, batch):
            idxs = range(start, min(start + batch, n))
            stack01 = jnp.asarray(np.stack([dataset[i] for i in idxs]))
            key = jax.random.fold_in(jax.random.PRNGKey(seed), start)
            psnrs.append(np.asarray(eval_batch(params, stack01, key)))
        avg = float(np.mean(np.concatenate(psnrs)))
        results[path] = avg
        print(f'{os.path.basename(path):40s} avg PSNR {avg:7.2f} dB '
              f'({n} samples)')

    if len(results) > 1:
        best = max(results, key=results.get)
        print(f'best: {best} ({results[best]:.2f} dB)')


if __name__ == '__main__':
    main()
