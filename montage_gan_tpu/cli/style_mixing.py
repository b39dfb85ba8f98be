"""W-space style-mixing grid.

CLI parity with the reference's style_mixing.py
(reference: style_mixing.py:72-113): a row-seeds × col-seeds grid where the
styles in ``col_styles`` come from the column seed and the rest from the row
seed, rendered through the full ensemble and composited.
"""

from __future__ import annotations

import os
import re
from typing import List

import click
import numpy as np


def parse_range(s: str) -> List[int]:
    out: List[int] = []
    for part in s.split(','):
        m = re.match(r'^(\d+)-(\d+)$', part)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(part))
    return out


@click.command()
@click.option('--network', 'network_path', required=True, metavar='PATH')
@click.option('--rows', 'row_seeds', type=parse_range, required=True)
@click.option('--cols', 'col_seeds', type=parse_range, required=True)
@click.option('--styles', 'col_styles', type=parse_range, default='0-6')
@click.option('--trunc', 'truncation_psi', type=float, default=1.0)
@click.option('--noise-mode', type=click.Choice(['const', 'random', 'none']),
              default='const')
@click.option('--outdir', required=True)
def main(network_path, row_seeds, col_seeds, col_styles, truncation_psi,
         noise_mode, outdir):
    """Generate a style-mixing grid image."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..ops.composite import alpha_composite
    from ..utils.checkpoint import load_ema_snapshot
    from ..utils.grid import make_grid, to_uint8
    from ..utils.image_utils import normalize_zero1

    os.makedirs(outdir, exist_ok=True)
    cfg, ens, tree = load_ema_snapshot(network_path)

    all_seeds = list(dict.fromkeys(row_seeds + col_seeds))
    z = jnp.asarray(np.stack([np.random.RandomState(s).randn(cfg.z_dim)
                              for s in all_seeds]), dtype=jnp.float32)

    print('Computing W vectors...')
    ws = ens.mapping.apply(tree['mapping'], z,
                           truncation_psi=truncation_psi)  # [N,(L),num_ws,w]
    w_by_seed = {seed: ws[i] for i, seed in enumerate(all_seeds)}

    @jax.jit
    def synth(ws_batch, rng):
        stack = ens.synthesize_layers(tree, ws_batch, noise_rng=rng,
                                      noise_mode=noise_mode)
        if ens.stn is not None:
            stack, _ = ens.stn.apply(tree['stn'], stack)
        return alpha_composite(normalize_zero1(jnp.clip(stack, -1, 1)))

    print('Generating mixed images...')
    images = {}
    style_axis = -2  # num_ws axis
    for rs in row_seeds:
        for cs in col_seeds:
            w = w_by_seed[rs]
            w_col = w_by_seed[cs]
            idx = jnp.asarray(col_styles)
            w_mixed = w.at[..., idx, :].set(w_col[..., idx, :])
            img = synth(w_mixed[None], jax.random.PRNGKey(rs * 10007 + cs))
            images[(rs, cs)] = np.asarray(img[0])

    print('Saving grid...')
    grid_rows = []
    for rs in row_seeds:
        grid_rows.extend(images[(rs, cs)] for cs in col_seeds)
    grid = to_uint8(make_grid(np.stack(grid_rows), nrow=len(col_seeds)))
    Image.fromarray(grid, 'RGBA').save(os.path.join(outdir, 'grid.png'))
    for (rs, cs), img in images.items():
        Image.fromarray(to_uint8(img), 'RGBA').save(
            os.path.join(outdir, f'{rs}-{cs}.png'))


if __name__ == '__main__':
    main()
