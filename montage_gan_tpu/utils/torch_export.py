"""PyTorch checkpoint exporter — the inverse of utils/torch_import.py.

Writes this framework's parameter pytrees as *reference-consumable*
checkpoints, closing the round-2 one-way interop door:

  * ``export_aio_snapshot`` — the AIO ``network-snapshot-*.pth`` dict of
    state_dicts the reference trainer saves and resumes from
    (format + key set: custom/training_loop_aio.py:808-835; loaded with
    strict ``load_state_dict`` at :314-342, so every buffer the reference
    modules register — resample_filter, noise_const, Hz_geom/Hz_fbank —
    is emitted with the exact names, ordering and values).
  * ``generator_state_dict`` / ``discriminator_state_dict`` — monolithic
    SG2 ``G``/``D`` state_dicts (``mapping.`` + ``synthesis.`` prefixes)
    for the train.py-path networks.
  * ``export_network_pkl`` — an SG2-ADA-style ``.pkl`` of persistence-
    pickled reference modules carrying our weights, loadable by the
    reference's ``legacy.load_network_pkl`` (legacy.py:21-61) and thus by
    ``generate.py`` / ``style_mixing.py`` / ``projector.py``.  Requires a
    reference checkout on ``sys.path`` (the pickled stream itself is
    self-contained afterwards — persistence embeds the module source).

Key orders replicate ``Module.state_dict()`` traversal (buffers of a
module precede its children): e.g. MappingNetwork yields ``w_avg`` first,
SynthesisBlock yields ``const``/``resample_filter`` before its layers.
Torch is required only when calling these functions.

Layout conversions (inverse of torch_import):
  * conv kernel  [kh, kw, I, O]  →  [O, I, kh, kw]
  * linear weight [I, O]         →  [O, I]
  * epilogue/STN first fc: our HWC-major flatten input axis is permuted
    back to the torch C-major flatten.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Optional

import numpy as np

from ..ops.filters import setup_filter


def _t(v):
    import torch
    # copy=True: jax arrays expose read-only buffers, which torch tensors
    # must not alias
    return torch.as_tensor(np.array(v, dtype=np.float32, copy=True))


def conv_w_t(v):
    """[kh, kw, I, O] → torch [O, I, kh, kw]."""
    return _t(np.asarray(v).transpose(3, 2, 0, 1))


def linear_w_t(v):
    """[I, O] → torch [O, I]."""
    return _t(np.asarray(v).transpose(1, 0))


def _resample_filter():
    """The [4,4] buffer every reference Conv2dLayer/SynthesisLayer registers
    (setup_filter([1,3,3,1]), networks_aio.py Conv2dLayer ctor)."""
    return _t(setup_filter([1, 3, 3, 1]))


# ---------------------------------------------------------------------------
# Mapping
# ---------------------------------------------------------------------------

def mapping_state_dict(variables: Dict[str, Any],
                       prefix: str = '') -> 'OrderedDict':
    """Our (Global)MappingNetwork variables → reference state_dict
    (key order: w_avg buffer first, then fc layers — torch traversal)."""
    params = variables['params']
    out: 'OrderedDict' = OrderedDict()
    w_avg = variables.get('moving_stats', {}).get('w_avg')
    if w_avg is None:
        # strict load needs the buffer; a fresh network's w_avg is zeros
        # (sized like the final fc's output = w_dim[, ·num_splits])
        last_fc = params[sorted((k for k in params if k.startswith('fc')),
                                key=lambda s: int(s[2:]))[-1]]
        w_avg = np.zeros_like(np.asarray(last_fc['bias']))
    out[f'{prefix}w_avg'] = _t(w_avg)
    if 'embed' in params:
        out[f'{prefix}embed.weight'] = linear_w_t(params['embed']['weight'])
        out[f'{prefix}embed.bias'] = _t(params['embed']['bias'])
    fcs = sorted((k for k in params if k.startswith('fc')),
                 key=lambda s: int(s[2:]))
    for k in fcs:
        out[f'{prefix}{k}.weight'] = linear_w_t(params[k]['weight'])
        out[f'{prefix}{k}.bias'] = _t(params[k]['bias'])
    return out


# ---------------------------------------------------------------------------
# Synthesis
# ---------------------------------------------------------------------------

def synthesis_state_dict(variables: Dict[str, Any],
                         prefix: str = '') -> 'OrderedDict':
    """Our SynthesisNetwork variables (params + noise collection) →
    reference state_dict incl. every resample_filter buffer."""
    params = variables['params']
    noise = variables.get('noise', {})
    blocks = sorted(params.keys(), key=lambda b: int(b[1:]))
    rf = _resample_filter()
    out: 'OrderedDict' = OrderedDict()

    def put_layer(block: str, layer: str):
        p = params[block][layer]
        key = f'{prefix}{block}.{layer}'
        out[f'{key}.weight'] = conv_w_t(p['weight'])
        if 'noise_strength' in p:  # SynthesisLayer (conv0/conv1)
            out[f'{key}.noise_strength'] = _t(p['noise_strength'])
            out[f'{key}.bias'] = _t(p['bias'])
            out[f'{key}.resample_filter'] = rf.clone()
            nc = noise.get(block, {}).get(layer, {}).get('noise_const')
            if nc is not None:
                out[f'{key}.noise_const'] = _t(nc)
        else:  # ToRGBLayer: no resample_filter / noise buffers
            out[f'{key}.bias'] = _t(p['bias'])
        out[f'{key}.affine.weight'] = linear_w_t(p['affine']['weight'])
        out[f'{key}.affine.bias'] = _t(p['affine']['bias'])

    for i, block in enumerate(blocks):
        if i == 0:
            # [H, W, C] → [C, H, W]
            out[f'{prefix}{block}.const'] = _t(
                np.asarray(params[block]['const']).transpose(2, 0, 1))
        out[f'{prefix}{block}.resample_filter'] = rf.clone()
        if 'conv0' in params[block]:
            put_layer(block, 'conv0')
        put_layer(block, 'conv1')
        put_layer(block, 'torgb')
    return out


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------

def discriminator_state_dict(variables: Dict[str, Any],
                             init_res=(4, 4),
                             prefix: str = '') -> 'OrderedDict':
    """Our Discriminator params → reference state_dict (blocks top-down,
    epilogue fc permuted back to the torch C-major flatten)."""
    params = variables['params']
    h0, w0 = init_res
    rf = _resample_filter()
    blocks = sorted((b for b in params if b.startswith('b')),
                    key=lambda b: -int(b[1:]))
    out: 'OrderedDict' = OrderedDict()
    if 'mapping' in params:  # conditional projection head
        out.update(mapping_state_dict({'params': params['mapping']},
                                      prefix=f'{prefix}mapping.'))
    for i, block in enumerate(blocks):
        p = params[block]
        is_epilogue = 'fc' in p
        if not is_epilogue:
            out[f'{prefix}{block}.resample_filter'] = rf.clone()
        if 'fromrgb' in p:
            out[f'{prefix}{block}.fromrgb.weight'] = conv_w_t(
                p['fromrgb']['weight'])
            out[f'{prefix}{block}.fromrgb.bias'] = _t(p['fromrgb']['bias'])
            out[f'{prefix}{block}.fromrgb.resample_filter'] = rf.clone()
        if is_epilogue:
            out[f'{prefix}{block}.conv.weight'] = conv_w_t(p['conv']['weight'])
            out[f'{prefix}{block}.conv.bias'] = _t(p['conv']['bias'])
            out[f'{prefix}{block}.conv.resample_filter'] = rf.clone()
            # [h0*w0*cin, out] HWC-major → [out, cin*h0*w0] C-major
            w = np.asarray(p['fc']['weight'])
            cin = w.shape[0] // (h0 * w0)
            w = w.reshape(h0, w0, cin, -1).transpose(2, 0, 1, 3)
            out[f'{prefix}{block}.fc.weight'] = _t(
                w.reshape(cin * h0 * w0, -1).transpose(1, 0))
            out[f'{prefix}{block}.fc.bias'] = _t(p['fc']['bias'])
            out[f'{prefix}{block}.out.weight'] = linear_w_t(p['out']['weight'])
            out[f'{prefix}{block}.out.bias'] = _t(p['out']['bias'])
        else:
            for layer in ('conv0', 'conv1'):
                out[f'{prefix}{block}.{layer}.weight'] = conv_w_t(
                    p[layer]['weight'])
                out[f'{prefix}{block}.{layer}.bias'] = _t(p[layer]['bias'])
                out[f'{prefix}{block}.{layer}.resample_filter'] = rf.clone()
            if 'skip' in p:
                out[f'{prefix}{block}.skip.weight'] = conv_w_t(
                    p['skip']['weight'])
                out[f'{prefix}{block}.skip.resample_filter'] = rf.clone()
    return out


# ---------------------------------------------------------------------------
# STN / renderer / augment pipe
# ---------------------------------------------------------------------------

def stn_state_dict(variables: Dict[str, Any]) -> 'OrderedDict':
    """Our STN params → reference STNv2b/c state_dict
    (fukuwarai/networks.py:148-258 layout)."""
    params = variables['params']
    out: 'OrderedDict' = OrderedDict()
    conv_ids = [0, 3, 6, 9, 12]
    convs = sorted((k for k in params if k.startswith('Conv_')),
                   key=lambda s: int(s.split('_')[1]))
    for i, k in enumerate(convs):
        out[f'localization.{conv_ids[i]}.weight'] = conv_w_t(
            params[k]['kernel'])
        out[f'localization.{conv_ids[i]}.bias'] = _t(params[k]['bias'])
    # first fc: our HWC-major input axis → torch C-major
    c_last = np.asarray(params[convs[-1]]['kernel']).shape[-1]
    w0 = np.asarray(params['Dense_0']['kernel'])  # [H*W*C, nf2]
    hw = w0.shape[0] // c_last
    side = int(round(hw ** 0.5))
    assert side * side * c_last == w0.shape[0]
    w0 = w0.transpose(1, 0).reshape(-1, side, side, c_last)
    out['fc_loc.0.weight'] = _t(
        w0.transpose(0, 3, 1, 2).reshape(w0.shape[0], -1))
    out['fc_loc.0.bias'] = _t(params['Dense_0']['bias'])
    out['fc_loc.2.weight'] = linear_w_t(params['Dense_1']['kernel'])
    out['fc_loc.2.bias'] = _t(params['Dense_1']['bias'])
    return out


def renderer_state_dict(variables: Dict[str, Any],
                        renderer_type: str = 'tanh') -> 'OrderedDict':
    """Our renderer params → reference state_dict.  The reference shares ONE
    mid block module at several positions in its ``cnn`` Sequential
    (diff_rendering/networks.py), so the shared tensor is emitted under
    every alias (state_dict does the same for shared modules)."""
    params = variables['params']
    if renderer_type in ('tanh', 'sigmoid'):
        alias = {'block': ['block.0', 'cnn.2.0', 'cnn.3.0', 'cnn.4.0'],
                 'conv_in': ['cnn.0'], 'conv_out': ['cnn.5']}
        order = ['block.0', 'cnn.0', 'cnn.2.0', 'cnn.3.0', 'cnn.4.0', 'cnn.5']
    elif renderer_type == 'subpixel':
        # the shared block sits at cnn.5 AND cnn.6 (*[self.block] * 2,
        # diff_rendering/networks.py:120)
        alias = {'block': ['block.0', 'cnn.5.0', 'cnn.6.0'],
                 'conv_down1': ['cnn.1'], 'conv_down2': ['cnn.3'],
                 'conv_out': ['cnn.7']}
        order = ['block.0', 'cnn.1', 'cnn.3', 'cnn.5.0', 'cnn.6.0', 'cnn.7']
    else:
        raise ValueError(renderer_type)
    flat = {}
    for ours, names in alias.items():
        for name in names:
            flat[f'{name}.weight'] = conv_w_t(params[ours]['kernel'])
            flat[f'{name}.bias'] = _t(params[ours]['bias'])
    out: 'OrderedDict' = OrderedDict()
    for name in order:
        out[f'{name}.weight'] = flat[f'{name}.weight']
        out[f'{name}.bias'] = flat[f'{name}.bias']
    return out


# sym6/sym2-derived constants matching the reference AugmentPipe buffers
def augment_pipe_state_dict(p: float) -> 'OrderedDict':
    from ..training.augment import _HZ_FBANK, _HZ_GEOM
    out: 'OrderedDict' = OrderedDict()
    out['p'] = _t(np.float32(p)).reshape(())
    out['Hz_geom'] = _t(_HZ_GEOM)
    out['Hz_fbank'] = _t(_HZ_FBANK)
    return out


# ---------------------------------------------------------------------------
# Whole-checkpoint exporters
# ---------------------------------------------------------------------------

def export_aio_snapshot(state, cfg, path: str,
                        training_set_kwargs: Optional[dict] = None,
                        renderer_type: Optional[str] = 'tanh') -> dict:
    """Write a reference-format AIO ``network-snapshot-*.pth``
    (custom/training_loop_aio.py:808-835) from a MontageTrainState.

    The reference resume path (:314-342) loads every entry with a strict
    ``load_state_dict`` — all buffers are included.  Returns the dict that
    was saved (tensors), for testing."""
    import torch
    variables = state.variables
    ema = state.ema
    num_layers = cfg.num_layers
    aug_p = np.asarray(state.aug_p)

    def d_init_res(i):
        init_res, _ = cfg.layer_geometry(i)
        return init_res

    data: Dict[str, Any] = dict(
        training_set_kwargs=dict(training_set_kwargs or {}))
    data['mapping_network'] = mapping_state_dict(variables['mapping'])
    data['local_G_list'] = [synthesis_state_dict(variables['local_g'][i])
                            for i in range(num_layers)]
    data['local_D_list'] = [
        discriminator_state_dict(variables['local_d'][i],
                                 init_res=d_init_res(i))
        for i in range(num_layers)]
    if variables.get('renderer') is not None and renderer_type:
        data['renderer'] = renderer_state_dict(variables['renderer'],
                                               renderer_type)
    data['mapping_network_ema'] = mapping_state_dict(ema['mapping'])
    data['local_G_ema'] = [synthesis_state_dict(ema['local_g'][i])
                           for i in range(num_layers)]
    data['augment_pipe_list'] = [augment_pipe_state_dict(float(aug_p[i]))
                                 for i in range(num_layers)]
    if variables.get('stn') is not None:
        data['pos_estimator'] = stn_state_dict(variables['stn'])
        if 'stn' in ema:
            data['pos_estimator_ema'] = stn_state_dict(ema['stn'])
        data['global_augment_pipe'] = augment_pipe_state_dict(
            float(aug_p[num_layers]))
        if variables.get('global_d') is not None:
            data['global_D'] = discriminator_state_dict(
                variables['global_d'], init_res=cfg.base_init_res)
    torch.save(data, path)
    return data


def generator_state_dict(mapping_vars: Dict[str, Any],
                         synthesis_vars: Dict[str, Any]) -> 'OrderedDict':
    """Monolithic SG2 Generator state_dict (``mapping.``/``synthesis.``
    prefixes, reference training/networks.py Generator)."""
    out: 'OrderedDict' = OrderedDict()
    out.update(synthesis_state_dict(synthesis_vars, prefix='synthesis.'))
    out.update(mapping_state_dict(mapping_vars, prefix='mapping.'))
    return out


def export_network_pkl(path: str, *, g_kwargs: dict,
                       mapping_vars, synthesis_vars,
                       d_kwargs: Optional[dict] = None,
                       d_vars: Optional[Dict[str, Any]] = None,
                       ema_mapping_vars=None, ema_synthesis_vars=None,
                       training_set_kwargs: Optional[dict] = None) -> None:
    """Write an SG2-ADA-style pickle {'G','D','G_ema',...} of reference
    modules carrying our weights — consumable by the reference's
    ``legacy.load_network_pkl`` / ``generate.py`` (legacy.py:21-61,
    generate.py:86-87).

    Needs the reference repo importable (``custom.networks_aio``); the
    written pickle is afterwards self-contained (torch_utils.persistence
    embeds the class source into the stream).

    ``g_kwargs``: reference Generator ctor kwargs (z_dim, c_dim, w_dim,
    img_resolution, img_channels, init_res, mapping_kwargs,
    synthesis_kwargs...).  ``d_kwargs`` likewise for Discriminator; when
    None, a geometry-matched D with untouched random init is written
    (``legacy.load_network_pkl`` validates D is a Module, legacy.py:40;
    generate.py only reads G_ema).
    """
    import pickle

    import torch
    try:
        from custom.networks_aio import Discriminator as RefD
        from custom.networks_aio import Generator as RefG
    except ImportError as e:
        raise ImportError(
            'export_network_pkl needs the reference repo on sys.path '
            '(e.g. /root/reference/montage_gan) to construct the '
            'persistence-pickled modules') from e

    def build_g(m_vars, s_vars):
        g = RefG(**g_kwargs)
        g.load_state_dict(generator_state_dict(m_vars, s_vars))
        return g.eval().requires_grad_(False)

    g = build_g(mapping_vars, synthesis_vars)
    g_ema = build_g(ema_mapping_vars if ema_mapping_vars is not None
                    else mapping_vars,
                    ema_synthesis_vars if ema_synthesis_vars is not None
                    else synthesis_vars)
    if d_kwargs is None:
        sk = dict(g_kwargs.get('synthesis_kwargs', {}))
        sk.pop('num_fp16_res', None)
        sk.pop('conv_clamp', None)
        d_kwargs = dict(c_dim=g_kwargs.get('c_dim', 0),
                        img_resolution=g_kwargs['img_resolution'],
                        img_channels=g_kwargs['img_channels'],
                        init_res=g_kwargs.get('init_res', [4, 4]),
                        **sk)
    d = RefD(**d_kwargs)
    if d_vars is not None:
        init_res = d_kwargs.get('init_res', (4, 4))
        d.load_state_dict(discriminator_state_dict(
            d_vars, init_res=tuple(init_res)))
    d = d.eval().requires_grad_(False)
    data = dict(G=g, D=d, G_ema=g_ema,
                training_set_kwargs=training_set_kwargs,
                augment_pipe=None)
    with open(path, 'wb') as f:
        pickle.dump(data, f)
