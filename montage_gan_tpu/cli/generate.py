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
@click.option('--seeds', type=parse_range, default=None)
@click.option('--projected-w', 'projected_w', metavar='FILE', default=None,
              help='Replay a projector result (projected_w.npz) through '
                   'synthesis instead of sampling seeds '
                   '(reference: generate.py:92-103)')
@click.option('--trunc', 'truncation_psi', type=float, default=1.0)
@click.option('--class', 'class_idx', type=int, default=None,
              help='Class label index for conditional networks '
                   '(unconditional if not specified; reference: '
                   'generate.py:44,111-118)')
@click.option('--noise-mode', type=click.Choice(['const', 'random', 'none']),
              default='const')
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--save-layers', is_flag=True, default=False)
@click.option('--composite', type=click.Choice(['alpha', 'renderer']),
              default='alpha')
def main(network_path, seeds, truncation_psi, noise_mode, outdir,
         save_layers, composite, projected_w, class_idx):
    """Generate montage images (RGBA) from a snapshot."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..utils.checkpoint import load_ema_snapshot

    os.makedirs(outdir, exist_ok=True)

    if projected_w is None and seeds is None:
        raise click.UsageError('--seeds is required when --projected-w '
                               'is not given')

    if projected_w is not None:
        # Replay a projector inversion through synthesis — closes the
        # project→regenerate loop (reference: generate.py:92-103 replays
        # projector.py:205-214's saved npz; here the ensemble path replays
        # AIO snapshots and the monolithic path replays imported .pkl).
        ws_all = np.load(projected_w)['w']
        if network_path.endswith('.pkl'):
            from ..utils.pkl_import import generator_from_pkl
            _, _, synthesis, syn_vars, kw = generator_from_pkl(network_path)
            assert ws_all.ndim == 3 and ws_all.shape[1:] == (
                synthesis.num_ws, kw['w_dim']), \
                f'projected_w shape {ws_all.shape} does not match the ' \
                f'generator ({synthesis.num_ws}, {kw["w_dim"]})'

            @jax.jit
            def replay_pkl(ws):
                img = synthesis.apply(syn_vars, ws, noise_mode=noise_mode)
                return jnp.clip(img * 0.5 + 0.5, 0, 1)

            for idx in range(ws_all.shape[0]):
                print(f'Replaying projected w {idx} ...')
                img = np.asarray(replay_pkl(
                    jnp.asarray(ws_all[idx:idx + 1], jnp.float32))[0])
                u8 = (img * 255 + 0.5).astype(np.uint8)
                mode = 'RGBA' if u8.shape[-1] == 4 else 'RGB'
                Image.fromarray(u8, mode).save(f'{outdir}/proj{idx:02d}.png')
            return

        from ..ops.composite import alpha_composite
        from ..utils.image_utils import normalize_zero1
        cfg, ens, tree = load_ema_snapshot(network_path)

        @jax.jit
        def replay(ws):
            if ens.stn is not None:
                placed, _ = ens.run_global_g_from_ws(tree, ws,
                                                     noise_mode='const')
            else:
                placed = ens.synthesize_layers(tree, ws, noise_mode='const')
            if composite == 'renderer' and ens.renderer is not None:
                img = normalize_zero1(ens.blend(tree, placed,
                                                use_renderer=True))
            else:
                img = alpha_composite(
                    normalize_zero1(jnp.clip(placed, -1, 1)))
            return placed, jnp.clip(img, 0, 1)

        for idx in range(ws_all.shape[0]):
            print(f'Replaying projected w {idx} ...')
            placed, img = replay(jnp.asarray(ws_all[idx:idx + 1],
                                             jnp.float32))
            rgba = (np.clip(np.asarray(img[0]), 0, 1) * 255
                    + 0.5).astype(np.uint8)
            Image.fromarray(rgba, 'RGBA').save(f'{outdir}/proj{idx:02d}.png')
            if save_layers:
                layers01 = (np.clip(np.asarray(placed[0]), -1, 1) + 1) / 2
                for li, name in enumerate(cfg.layer_names):
                    l8 = (layers01[li] * 255 + 0.5).astype(np.uint8)
                    Image.fromarray(l8, 'RGBA').save(
                        f'{outdir}/proj{idx:02d}-{li}_{name}.png')
        return

    if network_path.endswith('.pkl'):
        # Reference SG2-ADA snapshot: single monolithic generator
        # (reference flow: generate.py:86-124 — z → G → RGBA PNG).
        from ..utils.pkl_import import generator_from_pkl
        mapping, map_vars, synthesis, syn_vars, kw = \
            generator_from_pkl(network_path)

        # Labels (reference contract: generate.py:110-118 — a conditional
        # network refuses to sample without --class; --class on an
        # unconditional network is ignored with a warning).
        c_dim = int(kw.get('c_dim', 0) or 0)
        label = None
        if c_dim != 0:
            if class_idx is None:
                raise click.UsageError(
                    'Must specify class label with --class when using '
                    'a conditional network')
            if not 0 <= class_idx < c_dim:
                raise click.UsageError(
                    f'--class={class_idx} out of range for c_dim={c_dim}')
            label = jnp.zeros([1, c_dim], jnp.float32).at[0, class_idx].set(1)
        elif class_idx is not None:
            print('warn: --class=lbl ignored when running on '
                  'an unconditional network')

        @jax.jit
        def sample_pkl(z):
            ws = mapping.apply(map_vars, z, c=label,
                               truncation_psi=truncation_psi)
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
    if class_idx is not None:
        print('warn: --class=lbl ignored when running on '
              'an unconditional network')

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
