"""Safe SG2-ADA ``.pkl`` (persistence-pickle) importer.

The reference snapshots whole modules as "persistence pickles": each network
object pickles the *source code of its defining module* plus its state dict,
and unpickling re-executes that source (reference:
torch_utils/persistence.py:36-135, training/training_loop.py:383-395,
legacy.py:21-61).  Executing pickled source from an untrusted file is an
arbitrary-code-execution hazard, so this importer deliberately does NOT do
that.  Instead a restricted unpickler:

  * intercepts ``_reconstruct_persistent_obj`` and returns an inert
    ``ExtractedModule`` carrying the embedded state (``meta['state']`` is the
    module's ``__dict__``: ``_parameters`` / ``_buffers`` / ``_modules`` /
    construction kwargs) — the embedded ``module_src`` is never executed;
  * allowlists only the tensor/container rebuild callables (torch._utils,
    torch.storage, numpy, OrderedDict);
  * maps every other global to an inert placeholder that records its state.

From the extracted tree we rebuild the exact ``state_dict()`` name→tensor
mapping (the recursion mirrors ``nn.Module.state_dict`` naming) and the
``init_kwargs`` each persistent object was constructed with, which is enough
to re-instantiate the network in this framework via ``torch_import``.

Torch is required (storage decoding) but no reference code runs.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

_PERSISTENCE_FNS = {
    ('torch_utils.persistence', '_reconstruct_persistent_obj'),
}

# Tensor/container rebuild callables that are safe library internals.
_ALLOWED = {
    ('collections', 'OrderedDict'),
    ('torch._utils', '_rebuild_tensor'),
    ('torch._utils', '_rebuild_tensor_v2'),
    ('torch._utils', '_rebuild_parameter'),
    ('torch._utils', '_rebuild_wrapper_subclass'),
    ('torch.storage', '_load_from_bytes'),
    ('torch', 'Size'),
    ('torch', 'device'),
    ('torch.serialization', '_get_layout'),
    ('numpy.core.multiarray', '_reconstruct'),
    ('numpy._core.multiarray', '_reconstruct'),
    ('numpy.core.multiarray', 'scalar'),
    ('numpy._core.multiarray', 'scalar'),
    ('numpy', 'ndarray'),
    ('numpy', 'dtype'),
}


class ExtractedModule:
    """Inert stand-in for a persistence-pickled network module."""

    def __init__(self, meta: Dict[str, Any]):
        state = meta.get('state')
        if isinstance(state, dict):
            self.__dict__.update(state)
        self.__dict__['_persistent_class_name'] = meta.get('class_name')

    def __repr__(self):
        return f'<ExtractedModule {self._persistent_class_name}>'


class _Opaque:
    """Placeholder for any non-allowlisted global; records state only."""

    _pickle_origin = '?'

    def __init__(self, *args, **kwargs):
        pass

    # NEWOBJ protocol passes constructor args to __new__.
    def __new__(cls, *args, **kwargs):
        return object.__new__(cls)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__['_state'] = state

    def __call__(self, *args, **kwargs):  # REDUCE on a "function" global
        if len(args) == 1 and isinstance(args[0], dict) \
                and 'class_name' in args[0] and 'state' in args[0]:
            return ExtractedModule(args[0])
        obj = _Opaque()
        obj.__dict__['_reduce_args'] = args
        return obj


def _make_opaque(module: str, name: str):
    cls = type(name, (_Opaque,), {'_pickle_origin': f'{module}.{name}'})
    return cls


class _SafeUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _PERSISTENCE_FNS:
            return ExtractedModule
        if (module, name) in _ALLOWED:
            mod = __import__(module, fromlist=[name])
            return getattr(mod, name)
        # torch dtype/storage classes appear as bare globals in some formats;
        # resolving them is safe (classes, not called with attacker code).
        if module == 'torch' and (name.endswith('Storage')
                                  or name in ('float32', 'float16', 'float64',
                                              'int64', 'int32', 'uint8',
                                              'bfloat16', 'bool')):
            import torch
            return getattr(torch, name)
        return _make_opaque(module, name)


def safe_load(path: str) -> Any:
    """Unpickle ``path`` without executing embedded source/arbitrary globals."""
    with open(path, 'rb') as f:
        return _SafeUnpickler(f).load()


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, 'detach') else t)


def module_state_dict(obj: Any, prefix: str = '',
                      out: Optional[Dict[str, np.ndarray]] = None
                      ) -> Dict[str, np.ndarray]:
    """Rebuild the torch ``state_dict()`` name→array mapping from an
    extracted module tree (same naming recursion as nn.Module)."""
    if out is None:
        out = {}
    d = getattr(obj, '__dict__', {})
    for coll in ('_parameters', '_buffers'):
        for name, t in (d.get(coll) or {}).items():
            if t is not None:
                out[prefix + name] = _to_np(t)
    for name, child in (d.get('_modules') or {}).items():
        if child is not None:
            module_state_dict(child, prefix + name + '.', out)
    return out


def init_kwargs_of(obj: Any) -> Dict[str, Any]:
    """Construction kwargs recorded by the persistence decorator
    (reference: torch_utils/persistence.py init_args/init_kwargs)."""
    d = getattr(obj, '__dict__', {})
    kwargs = dict(d.get('_init_kwargs') or {})
    args = list(d.get('_init_args') or ())
    if args:
        kwargs['__init_args__'] = args
    return kwargs


def load_network_pkl(path: str) -> Dict[str, Any]:
    """Load a reference training snapshot ``.pkl`` → for each network key
    ('G', 'D', 'G_ema', 'augment_pipe'): {'state_dict', 'init_kwargs',
    'class_name'}; other keys pass through as plain values.

    This covers the PyTorch-pickle branch of the reference's
    ``legacy.load_network_pkl`` (legacy.py:21-61); TF1 pickles predate the
    reference's own training code and are out of scope (documented gap).
    """
    data = safe_load(path)
    if not isinstance(data, dict):
        raise ValueError(f'{path}: expected a dict snapshot pickle')
    out: Dict[str, Any] = {}
    for key, val in data.items():
        if isinstance(val, ExtractedModule):
            out[key] = dict(
                class_name=val._persistent_class_name,
                init_kwargs=init_kwargs_of(val),
                state_dict=module_state_dict(val))
        else:
            out[key] = val
    return out


def generator_from_pkl(path: str, key: str = 'G_ema'):
    """SG2-ADA pkl → ready-to-run (mapping_module, mapping_vars,
    synthesis_module, synthesis_vars, init_kwargs) rebuilt from the
    construction kwargs the persistence decorator recorded
    (reference loader contract: legacy.py:21-61, generate.py:86-87)."""
    from ..models import MappingNetwork, SynthesisNetwork
    mapping_vars, synthesis_vars, kw = generator_variables_from_pkl(path, key)
    syn_kw = dict(kw.get('synthesis_kwargs') or {})
    map_kw = dict(kw.get('mapping_kwargs') or {})
    syn_fields = {k: syn_kw[k] for k in
                  ('channel_base', 'channel_max', 'num_fp16_res',
                   'conv_clamp', 'architecture', 'conv_config_index')
                  if k in syn_kw}
    if 'init_res' in syn_kw:
        syn_fields['init_res'] = tuple(syn_kw['init_res'])
    synthesis = SynthesisNetwork(img_resolution=kw['img_resolution'],
                                 img_channels=kw['img_channels'],
                                 w_dim=kw['w_dim'], **syn_fields)
    mapping = MappingNetwork(z_dim=kw['z_dim'], c_dim=kw.get('c_dim', 0),
                             w_dim=kw['w_dim'], num_ws=synthesis.num_ws,
                             **{k: map_kw[k] for k in
                                ('num_layers', 'embed_features',
                                 'layer_features') if k in map_kw})
    return mapping, mapping_vars, synthesis, synthesis_vars, kw


def generator_variables_from_pkl(path: str, key: str = 'G_ema'
                                 ) -> Tuple[Dict[str, Any], Dict[str, Any],
                                            Dict[str, Any]]:
    """SG2-ADA pkl → (mapping variables, synthesis variables, init_kwargs)
    in this framework's flax layouts (via ``torch_import``)."""
    from . import torch_import
    net = load_network_pkl(path)[key]
    sd = net['state_dict']
    mapping_sd = {k[len('mapping.'):]: v for k, v in sd.items()
                  if k.startswith('mapping.')}
    synthesis_sd = {k[len('synthesis.'):]: v for k, v in sd.items()
                    if k.startswith('synthesis.')}
    return (torch_import.mapping_params_from_torch(mapping_sd),
            torch_import.synthesis_params_from_torch(synthesis_sd),
            net['init_kwargs'])
