"""export-torch — write reference-consumable checkpoints from EMA snapshots.

The inverse CLI of ``convert-pickle`` (import): takes this framework's EMA
inference snapshot pair (``ema-snapshot-*.msgpack`` + ``.json``, written at
every network-snapshot tick by both trainers) and emits either

  * ``--format pth`` — a reference AIO ``network-snapshot-*.pth`` dict of
    state_dicts (reference: custom/training_loop_aio.py:808-835).  The EMA
    weights are written under BOTH the live and ``*_ema`` keys (the standard
    inference-checkpoint convention); the reference's resume loader applies
    each entry it finds and tolerates absent ones (:314-342, 360-367), so
    discriminator/optimizer-free exports resume cleanly for transfer
    learning and drive its sampling/metric tooling directly.
  * ``--format pkl [--layer NAME]`` — an SG2-ADA persistence pickle of a
    monolithic reference Generator (legacy.py:21-61, generate.py:86-87).
    For montage snapshots, ``--layer`` picks the local synthesis network
    and slices that layer's lane out of the GlobalMappingNetwork (the exact
    inverse of the import-side widening, torch_import.widen_mapping_to_
    global / reference custom/training_loop_aio.py:321-334): last-FC
    columns, bias segment, and w_avg segment ``[i*w_dim:(i+1)*w_dim]``.
    Building the pickle requires the reference repo importable
    (``--reference-path``); the written file is self-contained afterwards.
"""

from __future__ import annotations

import sys

import click

from ..utils.platform import select_platform


def slice_global_mapping(mapping_vars, num_splits: int, idx: int):
    """GlobalMappingNetwork variables → plain MappingNetwork variables for
    split ``idx`` (inverse of torch_import.widen_mapping_to_global)."""
    import numpy as np
    params = dict(mapping_vars['params'])
    fcs = sorted((k for k in params if k.startswith('fc')),
                 key=lambda s: int(s[2:]))
    last = dict(params[fcs[-1]])
    w = np.asarray(last['weight'])           # [in, w_dim * num_splits]
    b = np.asarray(last['bias'])
    w_dim = w.shape[1] // num_splits
    last['weight'] = w[:, idx * w_dim:(idx + 1) * w_dim]
    last['bias'] = b[idx * w_dim:(idx + 1) * w_dim]
    params[fcs[-1]] = last
    out = {'params': params}
    stats = mapping_vars.get('moving_stats')
    if stats and 'w_avg' in stats:
        w_avg = np.asarray(stats['w_avg'])   # [w_dim * num_splits]
        out['moving_stats'] = {
            'w_avg': w_avg[idx * w_dim:(idx + 1) * w_dim]}
    return out


@click.command(name='export-torch')
@click.option('--network', 'network_path', required=True, metavar='PATH',
              help='EMA snapshot (ema-snapshot-*.msgpack or its basename).')
@click.option('--dest', required=True, metavar='PATH',
              help='Output .pth / .pkl file.')
@click.option('--format', 'fmt', type=click.Choice(['pth', 'pkl']),
              default='pth', show_default=True)
@click.option('--layer', default=None, metavar='NAME',
              help='pkl only: layer to export from a montage snapshot '
                   '(defaults to the sole layer of single-GAN snapshots).')
@click.option('--reference-path', default=None, metavar='DIR',
              help='pkl only: reference montage_gan checkout to import the '
                   'persistence modules from (e.g. '
                   '/root/reference/montage_gan).')
def main(network_path, dest, fmt, layer, reference_path):
    """Export an EMA snapshot as a reference-consumable checkpoint."""
    select_platform()
    from ..utils import torch_export
    from ..utils.checkpoint import load_ema_snapshot

    cfg, ens, tree = load_ema_snapshot(network_path)

    if fmt == 'pth':
        import torch
        data = {'training_set_kwargs': {}}
        data['mapping_network'] = torch_export.mapping_state_dict(
            tree['mapping'])
        data['mapping_network_ema'] = torch_export.mapping_state_dict(
            tree['mapping'])
        data['local_G_list'] = [
            torch_export.synthesis_state_dict(tree['local_g'][i])
            for i in range(cfg.num_layers)]
        data['local_G_ema'] = [
            torch_export.synthesis_state_dict(tree['local_g'][i])
            for i in range(cfg.num_layers)]
        if tree.get('renderer') is not None:
            data['renderer'] = torch_export.renderer_state_dict(
                tree['renderer'], cfg.renderer_type or 'tanh')
        if tree.get('stn') is not None:
            sd = torch_export.stn_state_dict(tree['stn'])
            data['pos_estimator'] = sd
            data['pos_estimator_ema'] = sd
        torch.save(data, dest)
        click.echo(f'wrote AIO snapshot {dest} '
                   f'({len(data)} entries, {cfg.num_layers} layers)')
        return

    # ---- pkl
    if reference_path:
        sys.path.insert(0, reference_path)
    names = list(cfg.layer_names)
    if layer is None:
        if cfg.num_layers != 1:
            raise click.UsageError(
                f'--layer required for montage snapshots (choices: {names})')
        idx = 0
    elif layer in names:
        idx = names.index(layer)
    else:
        raise click.UsageError(f'unknown layer {layer!r} (choices: {names})')

    mapping_vars = tree['mapping']
    if cfg.num_layers > 1 or getattr(ens.mapping, 'num_splits', 1) > 1:
        mapping_vars = slice_global_mapping(mapping_vars, cfg.num_layers,
                                            idx)
    init_res, res = cfg.layer_geometry(idx)
    g_kwargs = dict(
        z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
        img_resolution=res, img_channels=cfg.img_channels,
        init_res=list(init_res),
        mapping_kwargs=dict(num_layers=cfg.mapping_num_layers),
        synthesis_kwargs=dict(conv_config_index=cfg.conv_config_index,
                              channel_base=cfg.channel_base,
                              channel_max=cfg.channel_max,
                              num_fp16_res=cfg.num_fp16_res,
                              conv_clamp=cfg.conv_clamp))
    torch_export.export_network_pkl(
        dest, g_kwargs=g_kwargs, mapping_vars=mapping_vars,
        synthesis_vars=tree['local_g'][idx])
    click.echo(f'wrote SG2 pickle {dest} (layer {names[idx]!r}, '
               f'res {res}, init_res {tuple(init_res)})')


if __name__ == '__main__':
    main()
