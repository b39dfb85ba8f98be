"""Convert a reference SG2-ADA ``.pkl`` snapshot into a native snapshot.

The reference's ``legacy.py convert_network_pickle`` rewrites old pickles into
its current format (reference: legacy.py:329+).  The analogue here converts a
reference persistence pickle (loaded SAFELY — no embedded-source execution,
see utils/pkl_import.py) into this framework's msgpack EMA snapshot as a
1-layer ensemble, after which every native CLI (generate, projector,
style_mixing, calc_metrics) accepts it.
"""

from __future__ import annotations

import click


@click.command()
@click.option('--source', required=True, metavar='PKL',
              help='Reference SG2-ADA .pkl snapshot')
@click.option('--dest', required=True, metavar='PATH',
              help='Output snapshot base path (writes .msgpack + .json)')
@click.option('--key', default='G_ema', show_default=True,
              help='Which network to convert (G | G_ema)')
def main(source, dest, key):
    """Convert a reference .pkl into a native EMA snapshot."""
    from ..utils.platform import select_platform
    select_platform()
    import jax

    from ..models.ensemble import MontageConfig, MontageEnsemble
    from ..utils import checkpoint as ckpt
    from ..utils.pkl_import import generator_from_pkl

    mapping, map_vars, synthesis, syn_vars, kw = generator_from_pkl(source,
                                                                    key)
    res = kw['img_resolution']
    syn_kw = dict(kw.get('synthesis_kwargs') or {})
    map_kw = dict(kw.get('mapping_kwargs') or {})
    cfg = MontageConfig(
        layer_names=('image',), layer_targets=((res, res),),
        base_resolution=res, img_channels=kw['img_channels'],
        conv_config_index=syn_kw.get('conv_config_index', 2),
        z_dim=kw['z_dim'], w_dim=kw['w_dim'], c_dim=kw.get('c_dim', 0),
        mapping_num_layers=map_kw.get('num_layers', 8),
        channel_base=syn_kw.get('channel_base', 32768),
        channel_max=syn_kw.get('channel_max', 512),
        num_fp16_res=syn_kw.get('num_fp16_res', 0),
        conv_clamp=syn_kw.get('conv_clamp'),
        use_global_mapping=False, train_global=False, renderer_type='none')

    # template init gives complete variable structure (noise buffers etc.);
    # imported collections overwrite it
    ens = MontageEnsemble(cfg)
    template = ens.init_variables(jax.random.PRNGKey(0), batch=1)

    def merged(tpl, imp):
        out = dict(tpl)
        out.update(imp)
        return out

    ema = {'mapping': merged(template['mapping'], map_vars),
           'local_g': (merged(template['local_g'][0], syn_vars),)}
    ckpt.save_ema_snapshot(dest, cfg, ema)
    print(f'wrote {dest}.msgpack + {dest}.json '
          f'(res {res}, z_dim {kw["z_dim"]})')


if __name__ == '__main__':
    main()
