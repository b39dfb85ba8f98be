"""Feature extractors for distribution metrics.

The reference downloads NVIDIA's Inception-2015-12-05 / VGG16-LPIPS
TorchScript detectors at runtime (reference: metrics/metric_utils.py:46-57,
frechet_inception_distance.py:23).  This framework is offline/TPU-native, so
extractors are pluggable:

  * ``InceptionV3Features`` — an InceptionV3 (2015, pool3) feature network in
    flax; weights must be supplied as a converted ``.msgpack`` file
    (``MGT_INCEPTION_WEIGHTS`` env or explicit path).  With the official
    weights this reproduces standard FID.
  * ``RandomFeatures`` — a fixed-seed random strided-conv pyramid.  Fully
    deterministic and training-free; FID/KID computed with it are *relative*
    quality numbers (valid for comparing runs/checkpoints, not comparable to
    published FID).  Used when no weights are available and in tests.

All extractors consume NHWC uint8-range float [0, 255] RGB and return
``[N, D]`` features.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def weights_dropin_dir() -> str:
    """The offline weights drop-in directory (``MGT_WEIGHTS_DIR``, default
    ``~/.cache/montage_gan_tpu/weights``).  Converted detector ``.npz`` files
    placed here are picked up automatically when the per-detector env vars
    are unset — the one-directory handoff `check-weights` documents."""
    return os.environ.get(
        'MGT_WEIGHTS_DIR',
        os.path.join(os.path.expanduser('~'), '.cache', 'montage_gan_tpu',
                     'weights'))


def resolve_weights(env: str, dropin_name: str) -> Optional[str]:
    """Env var first, then the drop-in directory; None if neither exists."""
    path = os.environ.get(env)
    if path:
        return path
    cand = os.path.join(weights_dropin_dir(), dropin_name)
    return cand if os.path.exists(cand) else None


class RandomFeatures:
    """Deterministic random conv pyramid (LeCun-normal, fixed seed)."""

    name = 'random2048'
    feature_dim = 2048

    def __init__(self, seed: int = 0, num_stages: int = 4, width: int = 128):
        self.seed = seed
        self.num_stages = num_stages
        self.width = width
        self._params = None
        self._apply = None

    def _build(self, channels: int):
        key = jax.random.PRNGKey(self.seed)
        params = []
        cin = channels
        for i in range(self.num_stages):
            cout = min(self.width * (2 ** i), 512)
            k = jax.random.fold_in(key, i)
            w = jax.random.normal(k, (3, 3, cin, cout)) / np.sqrt(9 * cin)
            params.append(w)
            cin = cout
        kf = jax.random.fold_in(key, 99)
        wf = jax.random.normal(kf, (cin, self.feature_dim)) / np.sqrt(cin)
        params.append(wf)
        self._params = params

        def apply(params, x):
            x = x / 127.5 - 1.0
            for w in params[:-1]:
                x = jax.lax.conv_general_dilated(
                    x, w.astype(x.dtype), (2, 2), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                x = jax.nn.leaky_relu(x, 0.2)
            x = jnp.mean(x, axis=(1, 2))  # GAP
            return jnp.dot(x, params[-1])

        self._apply = jax.jit(apply)

    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [N, H, W, C] in [0, 255] float."""
        if self._params is None:
            self._build(images.shape[-1])
        return self._apply(self._params, jnp.asarray(images, jnp.float32))


class InceptionV3Features:
    """InceptionV3 pool3 features (FID variant) from converted weights.

    With the standard FID weights (pytorch-fid's
    ``pt_inception-2015-12-05-*.pth``, same Inception-2015-12-05 graph the
    reference downloads — reference: metrics/frechet_inception_distance.py:23)
    this reproduces standard/absolute FID.  Convert once with
    ``python -m montage_gan_tpu.utils.convert_inception in.pth out.npz`` and
    point ``MGT_INCEPTION_WEIGHTS`` at the ``.npz``.
    """

    name = 'inception_v3'
    feature_dim = 2048

    def __init__(self, weights_path: Optional[str] = None):
        from . import inception_net
        self.weights_path = weights_path or resolve_weights(
            'MGT_INCEPTION_WEIGHTS', 'inception.npz')
        if not self.weights_path or not os.path.exists(self.weights_path):
            raise FileNotFoundError(
                'InceptionV3 weights not available. Convert the standard '
                'detector (utils/convert_inception.py) and point '
                'MGT_INCEPTION_WEIGHTS at the .npz, or use '
                'feature_extractor="random" for relative metrics.')
        self._params = inception_net.load_params(self.weights_path)
        self._apply = jax.jit(inception_net.apply)

    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [N, H, W, 3] float in [0, 255] → [N, 2048]."""
        return self._apply(self._params, jnp.asarray(images, jnp.float32))


class VGG16Features:
    """VGG16 LPIPS features from converted weights.

    Squared L2 distance between two images' features equals the LPIPS(VGG)
    perceptual distance — the contract of the reference's ``vgg16.pt``
    detector with ``return_lpips=True`` (reference:
    metrics/perceptual_path_length.py:44-47, projector.py:61-63).  Convert
    with ``python -m montage_gan_tpu.utils.convert_vgg16`` and point
    ``MGT_VGG16_WEIGHTS`` at the ``.npz``.
    """

    name = 'vgg16_lpips'
    feature_dim = None  # depends on input H, W (see vgg16_net.feature_dim)

    def __init__(self, weights_path: Optional[str] = None):
        from . import vgg16_net
        self.weights_path = weights_path or resolve_weights(
            'MGT_VGG16_WEIGHTS', 'vgg16.npz')
        if not self.weights_path or not os.path.exists(self.weights_path):
            raise FileNotFoundError(
                'VGG16 weights not available. Convert once with '
                'utils/convert_vgg16.py and point MGT_VGG16_WEIGHTS at the '
                '.npz, or use the random-feature distance (relative only).')
        self._params = vgg16_net.load_params(self.weights_path)
        self._apply = jax.jit(vgg16_net.apply)

    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [N, H, W, 3] float in [0, 255] → [N, D] LPIPS features."""
        return self._apply(self._params, jnp.asarray(images, jnp.float32))


def build_extractor(kind: str = 'auto', **kwargs):
    if kind == 'auto':
        try:
            return InceptionV3Features(**kwargs)
        except (FileNotFoundError, NotImplementedError):
            return RandomFeatures()
    if kind == 'auto_lpips':
        # perceptual-distance extractor (PPL, projector): prefer VGG16-LPIPS
        try:
            return VGG16Features(**kwargs)
        except (FileNotFoundError, NotImplementedError):
            return RandomFeatures()
    if kind == 'random':
        return RandomFeatures(**kwargs)
    if kind == 'inception':
        return InceptionV3Features(**kwargs)
    if kind in ('vgg16', 'lpips'):
        return VGG16Features(**kwargs)
    raise ValueError(kind)
