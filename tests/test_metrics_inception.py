"""Parity tests for the JAX InceptionV3 (FID variant) port.

An independently written torch mirror (padding derived from weight shapes,
torch's own conv/pool/batchnorm semantics) is run against the JAX port with
identical random weights routed through the actual conversion path
(``convert_torch_state_dict`` — BN folding + layout transpose).  This mirrors
the reference's dual-implementation testing strategy (SURVEY.md §4.3).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from montage_gan_tpu.metrics import inception_net  # noqa: E402

# Stride-2 convs in the graph (torchvision inception_v3); everything else is
# stride 1.  Independent of the spec tables in inception_net.
STRIDE2 = {'Conv2d_1a_3x3', 'Mixed_6a.branch3x3', 'Mixed_6a.branch3x3dbl_3',
           'Mixed_7a.branch3x3_2', 'Mixed_7a.branch7x7x3_4'}
# Stem paddings are explicit in torchvision; block convs pad k//2 when
# stride 1 and 0 when stride 2.
STEM_PAD = {'Conv2d_1a_3x3': 0, 'Conv2d_2a_3x3': 0, 'Conv2d_2b_3x3': 1,
            'Conv2d_3b_1x1': 0, 'Conv2d_4a_3x3': 0}


def make_random_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}

    def add(name, cin, cout, k):
        sd[f'{name}.conv.weight'] = torch.tensor(
            (rng.randn(cout, cin, k[0], k[1])
             / np.sqrt(k[0] * k[1] * cin)).astype(np.float32))
        sd[f'{name}.bn.weight'] = torch.tensor(
            rng.uniform(0.8, 1.2, cout).astype(np.float32))
        sd[f'{name}.bn.bias'] = torch.tensor(
            rng.uniform(0.0, 0.1, cout).astype(np.float32))
        sd[f'{name}.bn.running_mean'] = torch.tensor(
            (rng.randn(cout) * 0.05).astype(np.float32))
        sd[f'{name}.bn.running_var'] = torch.tensor(
            rng.uniform(0.8, 1.2, cout).astype(np.float32))

    for name, spec in inception_net.STEM:
        if spec is None:
            continue
        cin, cout = inception_net._CHANNELS[name]
        add(name, cin, cout, spec[0])
    for bname, kind in inception_net.BLOCKS:
        chans = inception_net._block_channels(
            bname, kind, inception_net._BLOCK_CIN[bname])
        for cname, spec in inception_net._SPECS[kind].items():
            cin, cout = chans[cname]
            add(f'{bname}.{cname}', cin, cout, spec[0])
    return sd


def t_conv(sd, name, x):
    w = sd[name + '.conv.weight']
    stride = 2 if name in STRIDE2 else 1
    if name in STEM_PAD:
        pad = STEM_PAD[name]
    elif stride == 2:
        pad = 0
    else:
        pad = (w.shape[2] // 2, w.shape[3] // 2)
    y = F.conv2d(x, w, stride=stride, padding=pad)
    y = F.batch_norm(y, sd[name + '.bn.running_mean'],
                     sd[name + '.bn.running_var'], sd[name + '.bn.weight'],
                     sd[name + '.bn.bias'], training=False, eps=1e-3)
    return F.relu(y)


def torch_forward(sd, x):
    """x: [N, 3, 299, 299] in [0, 255] → [N, 2048] pool3 features."""
    c = lambda name, h: t_conv(sd, name, h)
    avg = lambda h: F.avg_pool2d(h, 3, 1, 1, count_include_pad=False)
    x = x / 127.5 - 1.0
    x = c('Conv2d_1a_3x3', x)
    x = c('Conv2d_2a_3x3', x)
    x = c('Conv2d_2b_3x3', x)
    x = F.max_pool2d(x, 3, 2)
    x = c('Conv2d_3b_1x1', x)
    x = c('Conv2d_4a_3x3', x)
    x = F.max_pool2d(x, 3, 2)
    for b, pf in [('Mixed_5b', 32), ('Mixed_5c', 64), ('Mixed_5d', 64)]:
        x = torch.cat([
            c(f'{b}.branch1x1', x),
            c(f'{b}.branch5x5_2', c(f'{b}.branch5x5_1', x)),
            c(f'{b}.branch3x3dbl_3',
              c(f'{b}.branch3x3dbl_2', c(f'{b}.branch3x3dbl_1', x))),
            c(f'{b}.branch_pool', avg(x))], 1)
    x = torch.cat([
        c('Mixed_6a.branch3x3', x),
        c('Mixed_6a.branch3x3dbl_3',
          c('Mixed_6a.branch3x3dbl_2', c('Mixed_6a.branch3x3dbl_1', x))),
        F.max_pool2d(x, 3, 2)], 1)
    for b in ['Mixed_6b', 'Mixed_6c', 'Mixed_6d', 'Mixed_6e']:
        h2 = x
        for i in range(1, 6):
            h2 = c(f'{b}.branch7x7dbl_{i}', h2)
        x = torch.cat([
            c(f'{b}.branch1x1', x),
            c(f'{b}.branch7x7_3',
              c(f'{b}.branch7x7_2', c(f'{b}.branch7x7_1', x))),
            h2,
            c(f'{b}.branch_pool', avg(x))], 1)
    h1 = x
    for i in range(1, 5):
        h1 = c(f'Mixed_7a.branch7x7x3_{i}', h1)
    x = torch.cat([
        c('Mixed_7a.branch3x3_2', c('Mixed_7a.branch3x3_1', x)),
        h1, F.max_pool2d(x, 3, 2)], 1)
    for b in ['Mixed_7b', 'Mixed_7c']:
        t = c(f'{b}.branch3x3_1', x)
        b1 = torch.cat([c(f'{b}.branch3x3_2a', t), c(f'{b}.branch3x3_2b', t)], 1)
        t = c(f'{b}.branch3x3dbl_2', c(f'{b}.branch3x3dbl_1', x))
        b2 = torch.cat([c(f'{b}.branch3x3dbl_3a', t),
                        c(f'{b}.branch3x3dbl_3b', t)], 1)
        pool = (F.max_pool2d(x, 3, 1, 1) if b == 'Mixed_7c' else avg(x))
        x = torch.cat([c(f'{b}.branch1x1', x), b1, b2,
                       c(f'{b}.branch_pool', pool)], 1)
    return x.mean(dim=(2, 3))


def test_inception_parity_vs_torch_mirror():
    sd = make_random_state_dict(0)
    rng = np.random.RandomState(1)
    imgs = rng.uniform(0, 255, (2, 299, 299, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_forward(sd, torch.tensor(
            np.transpose(imgs, (0, 3, 1, 2)))).numpy()

    params = inception_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    got = np.asarray(inception_net.apply(params, jnp.asarray(imgs),
                                         resize_input=False))
    assert got.shape == (2, 2048)
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.std(ref) > 0  # net did not collapse — parity is meaningful
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3 * scale)


def test_inception_resize_and_feature_extractor(tmp_path, monkeypatch):
    params = inception_net.init_random(0)
    path = str(tmp_path / 'inception.npz')
    inception_net.save_params(params, path)

    from montage_gan_tpu.metrics.features import (InceptionV3Features,
                                                  build_extractor)
    monkeypatch.setenv('MGT_INCEPTION_WEIGHTS', path)
    ext = build_extractor('inception')
    assert isinstance(ext, InceptionV3Features)
    imgs = jnp.asarray(np.random.RandomState(0)
                       .uniform(0, 255, (3, 64, 64, 3)).astype(np.float32))
    feats = np.asarray(ext(imgs))  # resize 64→299 path
    assert feats.shape == (3, 2048) and np.all(np.isfinite(feats))

    monkeypatch.delenv('MGT_INCEPTION_WEIGHTS')
    assert build_extractor('auto').name == 'random2048'


def test_convert_cli_roundtrip(tmp_path):
    sd = make_random_state_dict(2)
    src = str(tmp_path / 'in.pth')
    dst = str(tmp_path / 'out.npz')
    torch.save(sd, src)
    from montage_gan_tpu.utils import convert_inception
    convert_inception.main([src, dst])
    params = inception_net.load_params(dst)
    direct = inception_net.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    assert set(params) == set(direct)
    np.testing.assert_allclose(params['Mixed_7c.branch_pool'],
                               direct['Mixed_7c.branch_pool'], atol=1e-7)


def test_fid_e2e_through_converter_path(tmp_path, monkeypatch):
    """End-to-end FID with REAL-SHAPED randomly-initialized detector weights
    through the FULL supply chain a user follows (round-2 review item #6):
    torch .pth on disk → convert_inception CLI → MGT_INCEPTION_WEIGHTS →
    build_extractor('auto') picks the real InceptionV3 → FeatureStats →
    compute_fid_from_stats.  Identical sets give FID ≈ 0; disjoint sets give
    a clearly larger, finite FID."""
    from montage_gan_tpu.metrics.features import (InceptionV3Features,
                                                  build_extractor)
    from montage_gan_tpu.metrics.frechet_inception_distance import \
        compute_fid_from_stats
    from montage_gan_tpu.metrics.metric_utils import FeatureStats
    from montage_gan_tpu.utils import convert_inception

    sd = make_random_state_dict(3)
    src, dst = str(tmp_path / 'in.pth'), str(tmp_path / 'out.npz')
    torch.save(sd, src)
    convert_inception.main([src, dst])
    monkeypatch.setenv('MGT_INCEPTION_WEIGHTS', dst)
    ext = build_extractor('auto')
    assert isinstance(ext, InceptionV3Features)  # not the random fallback

    rng = np.random.RandomState(0)
    a = rng.uniform(0, 255, (8, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 60, a.shape), 0, 255).astype(np.float32)

    def stats(images):
        st = FeatureStats(capture_mean_cov=True, max_items=len(images))
        st.append(np.asarray(ext(jnp.asarray(images))))
        return st.get_mean_cov()

    ma, Sa = stats(a)
    mb, Sb = stats(b)
    fid_same = compute_fid_from_stats(ma, Sa, ma, Sa)
    fid_diff = compute_fid_from_stats(ma, Sa, mb, Sb)
    # random weights discriminate weakly — this asserts the PLUMBING
    # (converted weights loaded, real net ran, FID math finite & ordered),
    # not detector quality
    assert abs(fid_same) < 1e-6
    assert np.isfinite(fid_diff) and fid_diff > max(abs(fid_same) * 10, 1e-6)


def test_check_weights_cli(tmp_path, monkeypatch):
    """`check-weights` (cli/check_weights.py): rc 1 + actionable one-liners
    when detectors are missing; rc 0 when both env vars point at loadable
    converted weights."""
    from click.testing import CliRunner

    from montage_gan_tpu.cli.check_weights import main as check_weights

    runner = CliRunner()
    monkeypatch.delenv('MGT_INCEPTION_WEIGHTS', raising=False)
    monkeypatch.delenv('MGT_VGG16_WEIGHTS', raising=False)
    monkeypatch.setenv('MGT_WEIGHTS_DIR', str(tmp_path / 'dropin'))
    res = runner.invoke(check_weights, [])
    assert res.exit_code == 1
    assert 'convert_inception' in res.output
    assert 'convert_vgg16' in res.output
    assert 'RELATIVE' in res.output
    # the doctor prints the drop-in path (one-file handoff)
    assert str(tmp_path / 'dropin') in res.output

    inc = str(tmp_path / 'inception.npz')
    inception_net.save_params(inception_net.init_random(0), inc)
    from montage_gan_tpu.metrics import vgg16_net
    vgg = str(tmp_path / 'vgg16.npz')
    vgg16_net.save_params(vgg16_net.init_random(0), vgg)
    monkeypatch.setenv('MGT_INCEPTION_WEIGHTS', inc)
    monkeypatch.setenv('MGT_VGG16_WEIGHTS', vgg)
    res = runner.invoke(check_weights, [])
    assert res.exit_code == 0, res.output
    assert 'ABSOLUTE' in res.output


def test_check_weights_dropin_sha256_gate(tmp_path, monkeypatch):
    """The offline drop-in handoff (VERDICT r3 #9): a torch source dropped
    into MGT_WEIGHTS_DIR is sha256-verified against its filename-embedded
    digest (torch-hub convention); a corrupted file is flagged and NOT
    converted; a verified one converts with --convert and the resulting
    .npz is picked up with no env vars set."""
    import hashlib

    import torch
    from click.testing import CliRunner

    from montage_gan_tpu.cli.check_weights import main as check_weights
    from montage_gan_tpu.metrics.features import (InceptionV3Features,
                                                  resolve_weights)

    dropin = tmp_path / 'dropin'
    dropin.mkdir()
    monkeypatch.delenv('MGT_INCEPTION_WEIGHTS', raising=False)
    monkeypatch.delenv('MGT_VGG16_WEIGHTS', raising=False)
    monkeypatch.setenv('MGT_WEIGHTS_DIR', str(dropin))
    runner = CliRunner()

    # a source whose filename digest does NOT match its content → CORRUPT,
    # never converted
    bad = dropin / 'pt_inception-2015-12-05-6726825d.pth'
    bad.write_bytes(b'not the official checkpoint')
    res = runner.invoke(check_weights, ['--convert'])
    assert res.exit_code == 1
    assert 'MISMATCH' in res.output
    assert not (dropin / 'inception.npz').exists()
    bad.unlink()

    # a source correctly named by its own sha256 prefix → verified, and
    # --convert produces a loadable npz that resolves with no env var
    sd = make_random_state_dict(seed=3)
    tmp_src = dropin / 'staging.bin'
    torch.save(sd, str(tmp_src))
    digest = hashlib.sha256(tmp_src.read_bytes()).hexdigest()[:8]
    src = dropin / f'pt_inception-2015-12-05-{digest}.pth'
    tmp_src.rename(src)
    res = runner.invoke(check_weights, ['--convert'])
    assert 'VERIFIED' in res.output, res.output
    assert (dropin / 'inception.npz').exists()
    assert resolve_weights('MGT_INCEPTION_WEIGHTS',
                           'inception.npz') == str(dropin / 'inception.npz')
    ext = InceptionV3Features()
    assert ext.weights_path == str(dropin / 'inception.npz')
    # inception is now available; only vgg16 still missing
    assert res.exit_code == 1 and 'vgg16' in res.output
