"""Convert FID InceptionV3 weights (torch state_dict) → .npz for JAX.

The reference downloads NVIDIA's Inception-2015-12-05 TorchScript detector at
runtime (reference: metrics/metric_utils.py:46-57).  Offline, obtain the same
weights once (e.g. pytorch-fid's ``pt_inception-2015-12-05-6726825d.pth`` or a
torchvision ``inception_v3`` checkpoint — both use the torchvision parameter
layout) and convert:

    python -m montage_gan_tpu.utils.convert_inception in.pth out.npz
    export MGT_INCEPTION_WEIGHTS=out.npz

Batchnorm is folded into the conv weights (inference only); see
``metrics/inception_net.py`` for the architecture.
"""

from __future__ import annotations

import sys

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth/.pt file into {name: np.ndarray} without CUDA."""
    import torch
    try:
        obj = torch.load(path, map_location='cpu', weights_only=False)
    except RuntimeError:
        # TorchScript archive (e.g. NVIDIA's detector .pt files)
        obj = torch.jit.load(path, map_location='cpu')
    if hasattr(obj, 'state_dict'):  # full module / TorchScript module
        obj = obj.state_dict()
    if isinstance(obj, dict) and 'state_dict' in obj:
        obj = obj['state_dict']
    return {k: v.detach().numpy() if hasattr(v, 'detach') else np.asarray(v)
            for k, v in obj.items()}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    src, dst = argv
    from ..metrics import inception_net
    sd = load_torch_state_dict(src)
    params = inception_net.convert_torch_state_dict(sd)
    inception_net.save_params(params, dst)
    n = sum(int(np.prod(v.shape)) for v in params.values())
    print(f'wrote {dst}: {len(params)} arrays, {n / 1e6:.1f}M params')


if __name__ == '__main__':
    main()
