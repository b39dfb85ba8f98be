"""VGG16 LPIPS feature network (JAX, inference-only).

The reference's perceptual distance is NVIDIA's ``vgg16.pt`` TorchScript
detector called with ``return_lpips=True`` (reference:
metrics/perceptual_path_length.py:44-47, projector.py:61-63): it returns a
feature vector whose squared L2 distance between two images equals the
LPIPS(VGG) perceptual distance.  This module reproduces that contract in
plain JAX from converted weights (``utils/convert_vgg16.py``):

  * VGG16 conv stack (13 convs, 5 maxpools), taps after
    relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3;
  * each tap is unit-normalized along channels (LPIPS ``normalize_tensor``),
    scaled by ``sqrt(lin_l / (H_l * W_l))`` where ``lin_l`` are the learned
    per-channel LPIPS weights, and flattened;
  * the concatenation of all taps is the LPIPS feature vector: for two
    images, ``sum((f0 - f1)**2)`` is exactly
    ``Σ_l mean_{hw} Σ_c lin_lc (x̂ - ŷ)²`` — the LPIPS distance.

Input convention: NHWC float RGB in [0, 255] (same as the other extractors
in ``metrics/features.py``).  Internally mapped to [-1, 1] and passed
through the LPIPS scaling layer (shift/scale constants from the LPIPS
reference implementation).

Weights: convert a torchvision ``vgg16`` state_dict (and optionally an
LPIPS ``vgg.pth`` linear-head checkpoint) with
``python -m montage_gan_tpu.utils.convert_vgg16``.  Without a linear head,
uniform weights ``1/C_l`` are used (a valid perceptual metric, not
calibrated LPIPS).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 'D' configuration: (name, out_channels); 'pool' entries are 2x2/2
# max pools.  Taps are the relu outputs listed in TAPS.
CONFIG = [
    ('conv1_1', 64), ('conv1_2', 64), ('pool1', None),
    ('conv2_1', 128), ('conv2_2', 128), ('pool2', None),
    ('conv3_1', 256), ('conv3_2', 256), ('conv3_3', 256), ('pool3', None),
    ('conv4_1', 512), ('conv4_2', 512), ('conv4_3', 512), ('pool4', None),
    ('conv5_1', 512), ('conv5_2', 512), ('conv5_3', 512), ('pool5', None),
]
TAPS = ['conv1_2', 'conv2_2', 'conv3_3', 'conv4_3', 'conv5_3']
TAP_CHANNELS = [64, 128, 256, 512, 512]

# LPIPS ScalingLayer constants (images in [-1, 1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def apply(params: Dict[str, jax.Array], images: jax.Array,
          return_lpips: bool = True) -> jax.Array:
    """images: [N, H, W, 3] float in [0, 255] → LPIPS features [N, D].

    With ``return_lpips=False`` returns the raw conv5_3 feature map
    (NHWC), mirroring the detector's feature mode.
    """
    x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
    x = (x - _SHIFT) / _SCALE

    taps = []
    for name, _ in CONFIG:
        if name.startswith('pool'):
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID')
            continue
        w = params[f'{name}_w']
        b = params[f'{name}_b']
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = jax.nn.relu(x + b)
        if name in TAPS:
            taps.append(x)
    if not return_lpips:
        return taps[-1]

    feats = []
    for i, t in enumerate(taps):
        # normalize_tensor: unit L2 along channels
        norm = jnp.sqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True))
        t_hat = t / (norm + 1e-10)
        lin = params[f'lin{i}']  # [C], non-negative
        h, w = t.shape[1], t.shape[2]
        scaled = t_hat * jnp.sqrt(lin / (h * w))
        feats.append(scaled.reshape(t.shape[0], -1))
    return jnp.concatenate(feats, axis=-1)


def feature_dim(height: int, width: int) -> int:
    """LPIPS feature length for a given input size (dim depends on H, W)."""
    d, h, w = 0, height, width
    for i, c in enumerate(TAP_CHANNELS):
        # taps happen before the i+1'th pool; spatial size halves per pool
        hh, ww = h >> i, w >> i
        d += c * hh * ww
    return d


# ----------------------------------------------------------------------
# Weight conversion / IO
# ----------------------------------------------------------------------

def convert_torch_state_dict(sd: Dict[str, np.ndarray],
                             lpips_sd: Dict[str, np.ndarray] | None = None
                             ) -> Dict[str, np.ndarray]:
    """torchvision ``vgg16().features`` state_dict → this module's params.

    Accepts either torchvision naming (``features.{idx}.weight``) or plain
    sequential indices; conv weights are transposed OIHW → HWIO.  LPIPS
    linear heads (``lin{l}.model.1.weight`` [1, C, 1, 1], from the official
    LPIPS ``vgg.pth``) may live in the same dict or in ``lpips_sd``; absent
    heads fall back to uniform ``1/C``.
    """
    # map sequential torchvision indices to conv names
    idx_to_name = {}
    idx = 0
    for name, _ in CONFIG:
        if name.startswith('pool'):
            idx += 1  # MaxPool2d occupies one slot
            continue
        idx_to_name[idx] = name
        idx += 2  # Conv2d + ReLU

    params: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        kk = k
        for prefix in ('features.', 'layers.', 'model.'):
            if kk.startswith(prefix):
                kk = kk[len(prefix):]
        parts = kk.split('.')
        if parts[0].isdigit() and int(parts[0]) in idx_to_name:
            name = idx_to_name[int(parts[0])]
            if parts[-1] == 'weight':
                params[f'{name}_w'] = np.transpose(
                    np.asarray(v, np.float32), (2, 3, 1, 0))
            elif parts[-1] == 'bias':
                params[f'{name}_b'] = np.asarray(v, np.float32)
        elif kk.startswith('conv') and (kk.endswith('_w') or
                                        kk.endswith('_b')):
            arr = np.asarray(v, np.float32)
            out_ch = dict(CONFIG).get(kk[:-2])
            if kk.endswith('_w') and not (arr.shape[:2] == (3, 3) and
                                          arr.shape[-1] == out_ch):
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW → HWIO
            params[kk] = arr

    import re
    for src in (sd, lpips_sd or {}):
        for k, v in src.items():
            if '.model.1.weight' in k or (k.startswith('lin') and
                                          k.endswith('.weight')):
                # accept 'lin0.model.1.weight' and the ModuleList alias
                # 'lins.0.model.1.weight'; ignore unrecognized shapes
                m = re.match(r'lins?\.?(\d+)\.', k)
                if m is None:
                    continue
                lin = np.asarray(v, np.float32).reshape(-1)
                # LPIPS linear heads are non-negative by construction;
                # clamp so sqrt() below can never produce NaN features
                params[f'lin{int(m.group(1))}'] = np.maximum(lin, 0.0)

    for name, _ in CONFIG:
        if name.startswith('pool'):
            continue
        if f'{name}_w' not in params or f'{name}_b' not in params:
            raise KeyError(f'missing VGG16 conv params for {name}')
    for i, c in enumerate(TAP_CHANNELS):
        params.setdefault(f'lin{i}',
                          np.full((c,), 1.0 / c, np.float32))
        if params[f'lin{i}'].shape != (c,):
            raise ValueError(f'lin{i} has shape {params[f"lin{i}"].shape}, '
                             f'expected ({c},)')
    return params


def init_random(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random parameters with the real shapes (for tests)."""
    rng = np.random.RandomState(seed)
    params: Dict[str, np.ndarray] = {}
    cin = 3
    for name, cout in CONFIG:
        if name.startswith('pool'):
            continue
        params[f'{name}_w'] = (rng.randn(3, 3, cin, cout)
                               / np.sqrt(9 * cin)).astype(np.float32)
        params[f'{name}_b'] = (rng.randn(cout) * 0.1).astype(np.float32)
        cin = cout
    for i, c in enumerate(TAP_CHANNELS):
        params[f'lin{i}'] = np.full((c,), 1.0 / c, np.float32)
    return params


def save_params(params: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}
