"""InceptionV3 (FID variant, pool3/2048-d) as a pure-JAX feature network.

The reference computes FID/KID/IS with NVIDIA's Inception-2015-12-05
TorchScript detector downloaded at runtime (reference:
metrics/frechet_inception_distance.py:23, metrics/metric_utils.py:46-57).
That graph is the TF-slim InceptionV3 as used by the standard FID
implementations (pytorch-fid's ``pt_inception-2015-12-05-*.pth`` ships the
same weights in torchvision layout).  This module is a from-scratch JAX
implementation of that architecture, with the FID-specific details:

  * BasicConv2d = conv(bias-free) + batchnorm(eps=1e-3) + relu — batchnorm
    is folded into the conv weights at load time (inference only).
  * Average pools inside Inception blocks use ``count_include_pad=False``
    semantics (sum / valid-window-count).
  * Mixed_7c's pool branch uses a max pool (FIDInceptionE_2 detail).
  * Input: bilinear resize to 299×299 (half-pixel centers, i.e.
    ``align_corners=False``) and scaling [0,255] → [-1,1].

Weights are loaded from an ``.npz`` produced by
``montage_gan_tpu.utils.convert_inception`` from a torchvision-layout
state_dict.  With the standard FID weights this reproduces standard FID;
without weights the metrics layer falls back to the deterministic
random extractor (see ``features.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3

# Conv spec: name -> ((kh, kw), (sh, sw), (ph, pw)).  Names follow the
# torchvision ``inception_v3`` state_dict so conversion is mechanical.
_C = lambda k, s=(1, 1), p=(0, 0): (k, s, p)

STEM: List[Tuple[str, tuple]] = [
    ('Conv2d_1a_3x3', _C((3, 3), (2, 2))),
    ('Conv2d_2a_3x3', _C((3, 3))),
    ('Conv2d_2b_3x3', _C((3, 3), p=(1, 1))),
    ('maxpool', None),
    ('Conv2d_3b_1x1', _C((1, 1))),
    ('Conv2d_4a_3x3', _C((3, 3))),
    ('maxpool', None),
]

_A_SPEC = {
    'branch1x1': _C((1, 1)),
    'branch5x5_1': _C((1, 1)),
    'branch5x5_2': _C((5, 5), p=(2, 2)),
    'branch3x3dbl_1': _C((1, 1)),
    'branch3x3dbl_2': _C((3, 3), p=(1, 1)),
    'branch3x3dbl_3': _C((3, 3), p=(1, 1)),
    'branch_pool': _C((1, 1)),
}
_B_SPEC = {
    'branch3x3': _C((3, 3), (2, 2)),
    'branch3x3dbl_1': _C((1, 1)),
    'branch3x3dbl_2': _C((3, 3), p=(1, 1)),
    'branch3x3dbl_3': _C((3, 3), (2, 2)),
}
_C_SPEC = {
    'branch1x1': _C((1, 1)),
    'branch7x7_1': _C((1, 1)),
    'branch7x7_2': _C((1, 7), p=(0, 3)),
    'branch7x7_3': _C((7, 1), p=(3, 0)),
    'branch7x7dbl_1': _C((1, 1)),
    'branch7x7dbl_2': _C((7, 1), p=(3, 0)),
    'branch7x7dbl_3': _C((1, 7), p=(0, 3)),
    'branch7x7dbl_4': _C((7, 1), p=(3, 0)),
    'branch7x7dbl_5': _C((1, 7), p=(0, 3)),
    'branch_pool': _C((1, 1)),
}
_D_SPEC = {
    'branch3x3_1': _C((1, 1)),
    'branch3x3_2': _C((3, 3), (2, 2)),
    'branch7x7x3_1': _C((1, 1)),
    'branch7x7x3_2': _C((1, 7), p=(0, 3)),
    'branch7x7x3_3': _C((7, 1), p=(3, 0)),
    'branch7x7x3_4': _C((3, 3), (2, 2)),
}
_E_SPEC = {
    'branch1x1': _C((1, 1)),
    'branch3x3_1': _C((1, 1)),
    'branch3x3_2a': _C((1, 3), p=(0, 1)),
    'branch3x3_2b': _C((3, 1), p=(1, 0)),
    'branch3x3dbl_1': _C((1, 1)),
    'branch3x3dbl_2': _C((3, 3), p=(1, 1)),
    'branch3x3dbl_3a': _C((1, 3), p=(0, 1)),
    'branch3x3dbl_3b': _C((3, 1), p=(1, 0)),
    'branch_pool': _C((1, 1)),
}

# (block name, block kind).  Widths are implied by the weights.
BLOCKS: List[Tuple[str, str]] = [
    ('Mixed_5b', 'A'), ('Mixed_5c', 'A'), ('Mixed_5d', 'A'),
    ('Mixed_6a', 'B'),
    ('Mixed_6b', 'C'), ('Mixed_6c', 'C'), ('Mixed_6d', 'C'), ('Mixed_6e', 'C'),
    ('Mixed_7a', 'D'),
    ('Mixed_7b', 'E'), ('Mixed_7c', 'E'),
]
_SPECS = {'A': _A_SPEC, 'B': _B_SPEC, 'C': _C_SPEC, 'D': _D_SPEC, 'E': _E_SPEC}

# Channel plan (torchvision inception_v3), used only for random init/tests.
_CHANNELS = {
    'Conv2d_1a_3x3': (3, 32), 'Conv2d_2a_3x3': (32, 32),
    'Conv2d_2b_3x3': (32, 64), 'Conv2d_3b_1x1': (64, 80),
    'Conv2d_4a_3x3': (80, 192),
}


def _block_channels(name: str, kind: str, cin: int) -> Dict[str, Tuple[int, int]]:
    """in/out channels per conv of one block (torchvision widths)."""
    if kind == 'A':
        pf = {'Mixed_5b': 32, 'Mixed_5c': 64, 'Mixed_5d': 64}[name]
        return {'branch1x1': (cin, 64), 'branch5x5_1': (cin, 48),
                'branch5x5_2': (48, 64), 'branch3x3dbl_1': (cin, 64),
                'branch3x3dbl_2': (64, 96), 'branch3x3dbl_3': (96, 96),
                'branch_pool': (cin, pf)}
    if kind == 'B':
        return {'branch3x3': (cin, 384), 'branch3x3dbl_1': (cin, 64),
                'branch3x3dbl_2': (64, 96), 'branch3x3dbl_3': (96, 96)}
    if kind == 'C':
        c7 = {'Mixed_6b': 128, 'Mixed_6c': 160, 'Mixed_6d': 160,
              'Mixed_6e': 192}[name]
        return {'branch1x1': (cin, 192), 'branch7x7_1': (cin, c7),
                'branch7x7_2': (c7, c7), 'branch7x7_3': (c7, 192),
                'branch7x7dbl_1': (cin, c7), 'branch7x7dbl_2': (c7, c7),
                'branch7x7dbl_3': (c7, c7), 'branch7x7dbl_4': (c7, c7),
                'branch7x7dbl_5': (c7, 192), 'branch_pool': (cin, 192)}
    if kind == 'D':
        return {'branch3x3_1': (cin, 192), 'branch3x3_2': (192, 320),
                'branch7x7x3_1': (cin, 192), 'branch7x7x3_2': (192, 192),
                'branch7x7x3_3': (192, 192), 'branch7x7x3_4': (192, 192)}
    if kind == 'E':
        return {'branch1x1': (cin, 320), 'branch3x3_1': (cin, 384),
                'branch3x3_2a': (384, 384), 'branch3x3_2b': (384, 384),
                'branch3x3dbl_1': (cin, 448), 'branch3x3dbl_2': (448, 384),
                'branch3x3dbl_3a': (384, 384), 'branch3x3dbl_3b': (384, 384),
                'branch_pool': (cin, 192)}
    raise ValueError(kind)


_BLOCK_CIN = {'Mixed_5b': 192, 'Mixed_5c': 256, 'Mixed_5d': 288,
              'Mixed_6a': 288, 'Mixed_6b': 768, 'Mixed_6c': 768,
              'Mixed_6d': 768, 'Mixed_6e': 768, 'Mixed_7a': 768,
              'Mixed_7b': 1280, 'Mixed_7c': 2048}


def fold_bn(conv_w: np.ndarray, gamma: np.ndarray, beta: np.ndarray,
            mean: np.ndarray, var: np.ndarray, eps: float = BN_EPS):
    """Fold batchnorm into a bias-free conv.  conv_w is torch-layout
    [O, I, kh, kw]; returns (HWIO weight, bias)."""
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]
    b = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), b.astype(np.float32)


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision-layout inception_v3 state_dict (numpy values) → flat
    params {conv_name: w_hwio, conv_name + '/b': bias} with BN folded."""
    params: Dict[str, np.ndarray] = {}

    def grab(prefix: str, out_name: str):
        w, b = fold_bn(sd[f'{prefix}.conv.weight'],
                       sd[f'{prefix}.bn.weight'], sd[f'{prefix}.bn.bias'],
                       sd[f'{prefix}.bn.running_mean'],
                       sd[f'{prefix}.bn.running_var'])
        params[out_name] = w
        params[out_name + '/b'] = b

    for name, spec in STEM:
        if spec is None:
            continue
        grab(name, name)
    for bname, kind in BLOCKS:
        for cname in _SPECS[kind]:
            grab(f'{bname}.{cname}', f'{bname}.{cname}')
    return params


def init_random(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random parameters with the real shapes (for tests)."""
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {}

    def mk(name, cin, cout, k):
        params[name] = (rng.randn(k[0], k[1], cin, cout)
                        / np.sqrt(k[0] * k[1] * cin)).astype(np.float32)
        params[name + '/b'] = (rng.randn(cout) * 0.1).astype(np.float32)

    for name, spec in STEM:
        if spec is None:
            continue
        cin, cout = _CHANNELS[name]
        mk(name, cin, cout, spec[0])
    for bname, kind in BLOCKS:
        chans = _block_channels(bname, kind, _BLOCK_CIN[bname])
        for cname, spec in _SPECS[kind].items():
            cin, cout = chans[cname]
            mk(f'{bname}.{cname}', cin, cout, spec[0])
    return params


def _conv(params, name, x, spec):
    (kh, kw), (sh, sw), (ph, pw) = spec
    w = params[name].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (sh, sw), [(ph, ph), (pw, pw)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        precision=jax.lax.Precision.HIGHEST)
    y = y + params[name + '/b'].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool(x, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avgpool_nip(x):
    """3×3 stride-1 pad-1 average pool with count_include_pad=False."""
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), pads)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), pads)
    return s / cnt


def _run_block(params, name, kind, x):
    p = partial(_conv, params)
    spec = _SPECS[kind]

    def c(cname, h):
        return p(f'{name}.{cname}', h, spec[cname])

    if kind == 'A':
        b0 = c('branch1x1', x)
        b1 = c('branch5x5_2', c('branch5x5_1', x))
        b2 = c('branch3x3dbl_3', c('branch3x3dbl_2', c('branch3x3dbl_1', x)))
        b3 = c('branch_pool', _avgpool_nip(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
    if kind == 'B':
        b0 = c('branch3x3', x)
        b1 = c('branch3x3dbl_3', c('branch3x3dbl_2', c('branch3x3dbl_1', x)))
        b2 = _maxpool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)
    if kind == 'C':
        b0 = c('branch1x1', x)
        b1 = c('branch7x7_3', c('branch7x7_2', c('branch7x7_1', x)))
        b2 = x
        for i in range(1, 6):
            b2 = c(f'branch7x7dbl_{i}', b2)
        b3 = c('branch_pool', _avgpool_nip(x))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
    if kind == 'D':
        b0 = c('branch3x3_2', c('branch3x3_1', x))
        b1 = x
        for i in range(1, 5):
            b1 = c(f'branch7x7x3_{i}', b1)
        b2 = _maxpool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)
    if kind == 'E':
        b0 = c('branch1x1', x)
        t = c('branch3x3_1', x)
        b1 = jnp.concatenate([c('branch3x3_2a', t), c('branch3x3_2b', t)],
                             axis=-1)
        t = c('branch3x3dbl_2', c('branch3x3dbl_1', x))
        b2 = jnp.concatenate([c('branch3x3dbl_3a', t),
                              c('branch3x3dbl_3b', t)], axis=-1)
        # FIDInceptionE_2 (Mixed_7c) uses a max pool in the pool branch.
        pooled = _maxpool(x, stride=1, pad=1) if name == 'Mixed_7c' \
            else _avgpool_nip(x)
        b3 = c('branch_pool', pooled)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
    raise ValueError(kind)


def apply(params: Dict[str, jax.Array], images: jax.Array,
          resize_input: bool = True) -> jax.Array:
    """images: [N, H, W, 3] float in [0, 255] → pool3 features [N, 2048]."""
    x = jnp.asarray(images, jnp.float32)
    if resize_input and x.shape[1:3] != (299, 299):
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                             method='bilinear')
    x = x / 127.5 - 1.0
    for name, spec in STEM:
        if spec is None:
            x = _maxpool(x)
        else:
            x = _conv(params, name, x, spec)
    for bname, kind in BLOCKS:
        x = _run_block(params, bname, kind, x)
    return jnp.mean(x, axis=(1, 2))  # global average pool → [N, 2048]


def load_params(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def save_params(params: Dict[str, np.ndarray], path: str):
    np.savez(path, **params)
