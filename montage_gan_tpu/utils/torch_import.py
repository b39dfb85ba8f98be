"""PyTorch checkpoint importer (the legacy.py analogue).

Maps reference checkpoint state_dicts onto our flax parameter pytrees for
parity testing and transfer learning:
  * stage-0 renderer ``.pth.tar`` files
    (reference format: diff_rendering/main_united.py:134-138),
  * AIO ``network-snapshot-*.pth`` dicts of state_dicts
    (reference format: custom/training_loop_aio.py:808-835),
  * SG2-ADA mapping/synthesis/discriminator state_dicts.

Torch is only required when calling these functions (parity tests / one-shot
conversion); the training/runtime path never imports torch.

Layout conversions:
  * conv weight  [O, I, kh, kw]  →  [kh, kw, I, O]
  * linear weight [O, I]         →  [I, O]
  * the torch ``DiscriminatorEpilogue.fc`` consumes a C-major flatten of
    [N, C, H, W]; ours consumes an HWC-major flatten of [N, H, W, C], so the
    fc weight's input axis is permuted accordingly.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t,
                      dtype=np.float32)


def conv_w(t) -> np.ndarray:
    """[O, I, kh, kw] → [kh, kw, I, O]."""
    return _np(t).transpose(2, 3, 1, 0)


def linear_w(t) -> np.ndarray:
    """[O, I] → [I, O]."""
    return _np(t).transpose(1, 0)


def load_torch_file(path: str) -> Dict[str, Any]:
    import torch
    data = torch.load(path, map_location='cpu', weights_only=False)
    return data


# ---------------------------------------------------------------------------
# Renderers
# ---------------------------------------------------------------------------

def renderer_params_from_torch(state_dict: Dict[str, Any],
                               renderer_type: str = 'tanh') -> Dict[str, Any]:
    """Reference renderer state_dict → flax params for models.renderer.*.

    Key maps (shared mid block, see models/renderer.py):
      tanh/sigmoid: cnn.0 → conv_in, cnn.2.0 → block, cnn.5 → conv_out
      subpixel:     cnn.1 → conv_down1, cnn.3 → conv_down2,
                    cnn.5.0 → block, cnn.7 → conv_out
    """
    sd = state_dict
    if renderer_type in ('tanh', 'sigmoid'):
        mapping = {'conv_in': 'cnn.0', 'block': 'cnn.2.0', 'conv_out': 'cnn.5'}
    elif renderer_type == 'subpixel':
        mapping = {'conv_down1': 'cnn.1', 'conv_down2': 'cnn.3',
                   'block': 'cnn.5.0', 'conv_out': 'cnn.7'}
    else:
        raise ValueError(renderer_type)
    params = {}
    for ours, theirs in mapping.items():
        params[ours] = {'kernel': conv_w(sd[f'{theirs}.weight']),
                        'bias': _np(sd[f'{theirs}.bias'])}
    return {'params': params}


def load_reference_renderer(path: str, renderer_type: str = 'tanh') -> Dict[str, Any]:
    data = load_torch_file(path)
    sd = data['renderer'] if isinstance(data, dict) and 'renderer' in data else data
    return renderer_params_from_torch(sd, renderer_type)


# ---------------------------------------------------------------------------
# STN
# ---------------------------------------------------------------------------

def stn_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference STNv2b/c state_dict → flax params for models.stn.STN.

    torch layout: localization.{0,3,6,9,12} convs; fc_loc.{0,2} linears.
    The first fc consumes a C-major flatten of the conv stack output
    [N, C', H', W']; ours flattens [N, H', W', C'], so its input axis is
    permuted from (C', H', W') order to (H', W', C') order.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    conv_ids = [0, 3, 6, 9, 12]
    for i, cid in enumerate(conv_ids):
        params[f'Conv_{i}'] = {'kernel': conv_w(sd[f'localization.{cid}.weight']),
                               'bias': _np(sd[f'localization.{cid}.bias'])}

    w0 = _np(sd['fc_loc.0.weight'])  # [nf2, len_loc]
    # infer (C', H', W') from the last conv: C' = its out channels; assume square
    c_last = _np(sd['localization.12.weight']).shape[0]
    hw = w0.shape[1] // c_last
    side = int(round(hw ** 0.5))
    assert side * side * c_last == w0.shape[1], "cannot infer conv output geometry"
    w0 = w0.reshape(-1, c_last, side, side).transpose(0, 2, 3, 1).reshape(w0.shape[0], -1)
    params['Dense_0'] = {'kernel': w0.transpose(1, 0), 'bias': _np(sd['fc_loc.0.bias'])}
    params['Dense_1'] = {'kernel': linear_w(sd['fc_loc.2.weight']),
                         'bias': _np(sd['fc_loc.2.bias'])}
    return {'params': params}


# ---------------------------------------------------------------------------
# StyleGAN2 networks
# ---------------------------------------------------------------------------

def mapping_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference (Global)MappingNetwork state_dict → flax variables."""
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for k in sd:
        if k == 'w_avg':
            stats['w_avg'] = _np(sd[k])
        elif k.startswith('embed.'):
            params.setdefault('embed', {})[
                'weight' if k.endswith('weight') else 'bias'] = (
                linear_w(sd[k]) if k.endswith('weight') else _np(sd[k]))
        elif '.weight' in k or '.bias' in k:
            layer, kind = k.rsplit('.', 1)
            params.setdefault(layer, {})[kind] = (
                linear_w(sd[k]) if kind == 'weight' else _np(sd[k]))
    out = {'params': params}
    if stats:
        out['moving_stats'] = stats
    return out


def widen_mapping_to_global(variables: Dict[str, Any],
                            num_layers: int) -> Dict[str, Any]:
    """MappingNetwork variables → GlobalMappingNetwork variables by repeating
    the final layer's output parameters per image layer
    (reference rule: custom/training_loop_aio.py:321-334).

    Works on OUR flax layout: the last fc weight [in, w] tiles to
    [in, w*num_layers]; its bias and w_avg tile along their only axis.
    """
    import copy
    out = copy.deepcopy({'params': variables['params'],
                         **({'moving_stats': variables['moving_stats']}
                            if 'moving_stats' in variables else {})})
    fc_names = sorted((k for k in out['params'] if k.startswith('fc')),
                      key=lambda s: int(s[2:]))
    last = fc_names[-1]
    w = out['params'][last]['weight']
    b = out['params'][last]['bias']
    out['params'][last]['weight'] = np.tile(np.asarray(w), (1, num_layers))
    out['params'][last]['bias'] = np.tile(np.asarray(b), num_layers)
    if 'moving_stats' in out:
        out['moving_stats']['w_avg'] = np.tile(
            np.asarray(out['moving_stats']['w_avg']), num_layers)
    return out


def synthesis_params_from_torch(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference SynthesisNetwork state_dict → flax variables
    (params + 'noise' collection)."""
    sd = state_dict
    params: Dict[str, Any] = {}
    noise: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for k, v in sd.items():
        parts = k.split('.')  # e.g. b8.conv1.affine.weight
        block = parts[0]
        if parts[-1] == 'resample_filter':
            continue  # compile-time constant in our build
        if parts[-1] == 'noise_const':
            put(noise, [block, parts[1]], {'noise_const': _np(v)})
            continue
        if parts[1] == 'const':
            # [C, H, W] → [H, W, C]
            put(params, [block, 'const'], _np(v).transpose(1, 2, 0))
            continue
        layer = parts[1]
        rest = parts[2:]
        if rest == ['weight']:  # conv weight
            put(params, [block, layer, 'weight'], conv_w(v))
        elif rest == ['bias']:
            put(params, [block, layer, 'bias'], _np(v))
        elif rest == ['noise_strength']:
            put(params, [block, layer, 'noise_strength'], _np(v))
        elif rest and rest[0] == 'affine':
            put(params, [block, layer, 'affine',
                         'weight' if rest[1] == 'weight' else 'bias'],
                linear_w(v) if rest[1] == 'weight' else _np(v))
        else:
            raise KeyError(f'unhandled synthesis key {k}')
    out = {'params': params}
    if noise:
        out['noise'] = noise
    return out


def discriminator_params_from_torch(state_dict: Dict[str, Any],
                                    init_res=(4, 4)) -> Dict[str, Any]:
    """Reference Discriminator state_dict → flax params."""
    sd = state_dict
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    h0, w0 = init_res
    mapping_sd = {k[len('mapping.'):]: v for k, v in sd.items()
                  if k.startswith('mapping.')}
    if mapping_sd:
        # conditional D: projection-head mapping (z_dim=0) lives under the
        # 'mapping' submodule in both layouts
        params['mapping'] = mapping_params_from_torch(mapping_sd)['params']
    for k, v in sd.items():
        parts = k.split('.')
        if parts[-1] == 'resample_filter' or parts[0] == 'mapping':
            continue
        block, layer, kind = parts[0], parts[1], parts[-1]
        if layer in ('fromrgb', 'conv0', 'conv1', 'skip', 'conv'):
            put([block, layer, kind], conv_w(v) if kind == 'weight' else _np(v))
        elif layer == 'fc':
            if kind == 'weight':
                w = linear_w(v)  # [C*H0*W0, out] in C-major order
                cin = w.shape[0] // (h0 * w0)
                w = w.reshape(cin, h0, w0, -1).transpose(1, 2, 0, 3)
                put([block, 'fc', 'weight'], w.reshape(h0 * w0 * cin, -1))
            else:
                put([block, 'fc', 'bias'], _np(v))
        elif layer == 'out':
            put([block, 'out', kind], linear_w(v) if kind == 'weight' else _np(v))
        else:
            raise KeyError(f'unhandled discriminator key {k}')
    return {'params': params}
