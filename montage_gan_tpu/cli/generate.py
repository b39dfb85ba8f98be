"""Sample images from a trained snapshot.

CLI parity with the reference's generate.py (reference: generate.py:49-132):
seed list → z → ensemble → RGBA PNGs, with truncation and noise-mode control;
also saves the composited montage and (optionally) per-layer images.
"""

from __future__ import annotations

import os
import re
from typing import List

import click
import numpy as np


def parse_range(s: str) -> List[int]:
    """'1,2,5-10' → [1, 2, 5, …, 10] (reference: generate.py:24-36)."""
    out: List[int] = []
    for part in s.split(','):
        m = re.match(r'^(\d+)-(\d+)$', part)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(part))
    return out


@click.command()
@click.option('--network', 'network_path', required=True, metavar='PATH',
              help='EMA snapshot (.msgpack, with sibling .json) or a '
                   'reference SG2-ADA .pkl (loaded safely, no source exec)')
@click.option('--seeds', type=parse_range, required=True)
@click.option('--trunc', 'truncation_psi', type=float, default=1.0)
@click.option('--noise-mode', type=click.Choice(['const', 'random', 'none']),
              default='const')
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--save-layers', is_flag=True, default=False)
@click.option('--composite', type=click.Choice(['alpha', 'renderer']),
              default='alpha')
def main(network_path, seeds, truncation_psi, noise_mode, outdir,
         save_layers, composite):
    """Generate montage images (RGBA) from a snapshot."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.checkpoint import load_ema_snapshot

    os.makedirs(outdir, exist_ok=True)

    if network_path.endswith('.pkl'):
        # Reference SG2-ADA snapshot: single monolithic generator
        # (reference flow: generate.py:86-124 — z → G → RGBA PNG).
        from ..utils.pkl_import import generator_from_pkl
        mapping, map_vars, synthesis, syn_vars, kw = \
            generator_from_pkl(network_path)

        @jax.jit
        def sample_pkl(z):
            ws = mapping.apply(map_vars, z, truncation_psi=truncation_psi)
            img = synthesis.apply(syn_vars, ws, noise_mode=noise_mode)
            return jnp.clip(img * 0.5 + 0.5, 0, 1)  # [-1,1] → [0,1]

        for seed in seeds:
            print(f'Generating image for seed {seed} ...')
            z = jnp.asarray(np.random.RandomState(seed).randn(1, kw['z_dim']),
                            dtype=jnp.float32)
            img = np.asarray(sample_pkl(z)[0])
            u8 = (img * 255 + 0.5).astype(np.uint8)
            mode = 'RGBA' if u8.shape[-1] == 4 else 'RGB'
            Image.fromarray(u8, mode).save(f'{outdir}/seed{seed:04d}.png')
        return

    cfg, ens, tree = load_ema_snapshot(network_path)

    # the same composition the serving exporter freezes (utils/serving.py)
    from ..utils.serving import build_inference_fn
    sample = jax.jit(build_inference_fn(
        cfg, ens, tree, truncation_psi=truncation_psi,
        noise_mode=noise_mode, composite=composite))

    for seed in seeds:
        print(f'Generating image for seed {seed} ...')
        z = jnp.asarray(np.random.RandomState(seed).randn(1, cfg.z_dim),
                        dtype=jnp.float32)
        placed, img = sample(z, jnp.uint32(seed))
        rgba = (np.clip(np.asarray(img[0]), 0, 1) * 255 + 0.5).astype(np.uint8)
        Image.fromarray(rgba, 'RGBA').save(f'{outdir}/seed{seed:04d}.png')
        if save_layers:
            layers01 = (np.clip(np.asarray(placed[0]), -1, 1) + 1) / 2
            for li, name in enumerate(cfg.layer_names):
                l8 = (layers01[li] * 255 + 0.5).astype(np.uint8)
                Image.fromarray(l8, 'RGBA').save(
                    f'{outdir}/seed{seed:04d}-{li}_{name}.png')


if __name__ == '__main__':
    main()
