"""Parity tests for the JAX VGG16-LPIPS port.

An independently written torch mirror (standard LPIPS formulation: VGG16
taps → channel unit-normalization → learned per-channel weights → spatial
mean → layer sum) is run against the JAX port with identical random weights
routed through the actual conversion path (torchvision OIHW layout →
``convert_torch_state_dict``).  Mirrors the dual-implementation testing
strategy used for the Inception port (SURVEY.md §4.3).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from montage_gan_tpu.metrics import vgg16_net  # noqa: E402


def make_random_state_dict(seed=0, with_lin=True):
    """Random VGG16 weights in torchvision ``features.{idx}`` naming."""
    rng = np.random.RandomState(seed)
    sd = {}
    idx = 0
    cin = 3
    for name, cout in vgg16_net.CONFIG:
        if name.startswith('pool'):
            idx += 1
            continue
        sd[f'features.{idx}.weight'] = torch.tensor(
            (rng.randn(cout, cin, 3, 3) / np.sqrt(9 * cin)).astype(
                np.float32))
        sd[f'features.{idx}.bias'] = torch.tensor(
            (rng.randn(cout) * 0.05).astype(np.float32))
        idx += 2
        cin = cout
    lin = None
    if with_lin:
        lin = {}
        for i, c in enumerate(vgg16_net.TAP_CHANNELS):
            lin[f'lin{i}.model.1.weight'] = torch.tensor(
                rng.uniform(0.0, 0.2, (1, c, 1, 1)).astype(np.float32))
    return sd, lin


def torch_lpips(sd, lin, img0_255, img1_255):
    """Independent torch LPIPS(VGG) distance on NHWC [0,255] numpy images."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.tensor(np.transpose(img, (0, 3, 1, 2)), dtype=torch.float32)
        x = x / 127.5 - 1.0
        x = (x - shift) / scale
        taps = []
        idx = 0
        for name, _ in vgg16_net.CONFIG:
            if name.startswith('pool'):
                x = F.max_pool2d(x, 2, 2)
                idx += 1
                continue
            w = sd[f'features.{idx}.weight']
            b = sd[f'features.{idx}.bias']
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if name in vgg16_net.TAPS:
                taps.append(x)
            idx += 2
        return taps

    t0, t1 = feats(img0_255), feats(img1_255)
    dist = 0.0
    for i, (a, b) in enumerate(zip(t0, t1)):
        a = a / (a.square().sum(dim=1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.square().sum(dim=1, keepdim=True).sqrt() + 1e-10)
        if lin is not None:
            w = lin[f'lin{i}.model.1.weight'].view(1, -1, 1, 1)
        else:
            w = torch.full((1, a.shape[1], 1, 1), 1.0 / a.shape[1])
        dist = dist + (w * (a - b).square()).sum(dim=1).mean(dim=(1, 2))
    return dist.numpy()


@pytest.mark.parametrize('with_lin', [True, False])
def test_lpips_distance_parity(with_lin):
    sd, lin = make_random_state_dict(0, with_lin=with_lin)
    params = vgg16_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        {k: v.numpy() for k, v in (lin or {}).items()} or None)

    rng = np.random.RandomState(1)
    img0 = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.uniform(-40, 40, img0.shape), 0,
                   255).astype(np.float32)

    ref = torch_lpips(sd, lin, img0, img1)

    f0 = vgg16_net.apply(params, jnp.asarray(img0))
    f1 = vgg16_net.apply(params, jnp.asarray(img1))
    got = np.sum(np.square(np.asarray(f0) - np.asarray(f1)), axis=-1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_feature_dim_matches():
    sd, lin = make_random_state_dict(2)
    params = vgg16_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        {k: v.numpy() for k, v in lin.items()})
    img = np.zeros((1, 64, 64, 3), np.float32)
    f = vgg16_net.apply(params, jnp.asarray(img))
    assert f.shape == (1, vgg16_net.feature_dim(64, 64))


def test_save_load_roundtrip(tmp_path):
    sd, lin = make_random_state_dict(3)
    params = vgg16_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        {k: v.numpy() for k, v in lin.items()})
    p = tmp_path / 'vgg.npz'
    vgg16_net.save_params(params, str(p))
    loaded = vgg16_net.load_params(str(p))
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k])


def test_extractor_via_env(tmp_path, monkeypatch):
    from montage_gan_tpu.metrics.features import build_extractor
    sd, lin = make_random_state_dict(4)
    params = vgg16_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()},
        {k: v.numpy() for k, v in lin.items()})
    p = tmp_path / 'vgg.npz'
    vgg16_net.save_params(params, str(p))
    monkeypatch.setenv('MGT_VGG16_WEIGHTS', str(p))
    ex = build_extractor('auto_lpips')
    assert ex.name == 'vgg16_lpips'
    img = np.zeros((1, 32, 32, 3), np.float32)
    f = ex(jnp.asarray(img))
    assert f.shape[0] == 1
