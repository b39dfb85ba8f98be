"""Resume alias registry, retry/cache URL opener, and pkl transfer-learning
into a train state (reference: train_aio.py:333-355, dnnlib/util.py:386-470,
training/training_loop.py:166-172)."""

import hashlib
import os
import pickle

import numpy as np
import pytest

from montage_gan_tpu.utils import url_util


def test_open_url_local_path(tmp_path):
    p = tmp_path / 'x.bin'
    p.write_bytes(b'hello')
    with url_util.open_url(str(p)) as f:
        assert f.read() == b'hello'
    assert url_util.open_url(str(p), return_filename=True) == str(p)


def test_open_url_file_url(tmp_path):
    p = tmp_path / 'y.bin'
    p.write_bytes(b'data')
    with url_util.open_url('file://' + str(p)) as f:
        assert f.read() == b'data'


def test_open_url_cache_hit_no_network(tmp_path):
    """A cached download is served from disk — no socket touched (this
    environment is zero-egress, so reaching the network would fail)."""
    url = 'https://example.com/weights.pkl'
    md5 = hashlib.md5(url.encode()).hexdigest()
    cache_dir = tmp_path / 'cache'
    cache_dir.mkdir()
    (cache_dir / (md5 + '_weights.pkl')).write_bytes(b'cached-bytes')
    with url_util.open_url(url, cache_dir=str(cache_dir)) as f:
        assert f.read() == b'cached-bytes'
    fn = url_util.open_url(url, cache_dir=str(cache_dir),
                           return_filename=True)
    assert os.path.basename(fn).startswith(md5)


def test_open_url_retries_then_fails(tmp_path, monkeypatch):
    calls = []

    def fake_urlopen(url, timeout=None):
        calls.append(url)
        raise IOError('no egress')

    monkeypatch.setattr(url_util.urllib.request, 'urlopen', fake_urlopen)
    with pytest.raises(IOError):
        url_util.open_url('https://example.com/z.bin',
                          cache_dir=str(tmp_path), num_attempts=3,
                          verbose=False)
    assert len(calls) == 3  # the reference's retry loop (dnnlib/util.py:432)


def test_resolve_resume_shapes():
    # alias table parity (reference train_aio.py:333-339)
    assert set(url_util.RESUME_SPECS) == {
        'ffhq256', 'ffhq512', 'ffhq1024', 'celebahq256', 'lsundog256'}
    assert url_util.resolve_resume(None) == (None, '')
    assert url_util.resolve_resume('noresume') == (None, '-noresume')
    path, desc = url_util.resolve_resume('ffhq256', fetch=False)
    assert desc == '-resumeffhq256' and path.startswith('https://')
    path, desc = url_util.resolve_resume('/some/local/snap.msgpack')
    assert desc == '-resumecustom' and path == '/some/local/snap.msgpack'


@pytest.mark.reference
def test_transfer_into_train_state(tmp_path):
    torch = pytest.importorskip('torch')
    from custom.networks_aio import Discriminator, Generator
    from torch_utils import persistence

    import jax
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper
    from montage_gan_tpu.utils.pkl_import import transfer_into_train_state

    gcls = persistence.persistent_class(Generator)
    dcls = persistence.persistent_class(Discriminator)
    g = gcls(z_dim=16, c_dim=0, w_dim=16, img_resolution=16, img_channels=4,
             mapping_kwargs=dict(num_layers=2),
             synthesis_kwargs=dict(channel_base=512, channel_max=64,
                                   num_fp16_res=0, conv_clamp=None))
    d = dcls(c_dim=0, img_resolution=16, img_channels=4,
             channel_base=512, channel_max=64, num_fp16_res=0,
             conv_clamp=None)
    path = str(tmp_path / 'snap.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G=g, D=d, G_ema=g), f)

    cfg = MontageConfig(
        layer_names=('image',), layer_targets=((16, 16),),
        base_resolution=16, conv_config_index=2, z_dim=16, w_dim=16,
        mapping_num_layers=2, channel_base=512, channel_max=64,
        num_fp16_res=0, conv_clamp=None, mbstd_group_size=2,
        use_global_mapping=False, train_global=False, renderer_type='none')
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=2, augment=None, ada_target=None,
                       train_global=False, train_renderer=False,
                       bypass_renderer=True)
    trainer = MontageTrainer(ens, hyper)
    state = trainer.init_state(jax.random.PRNGKey(0), batch=2)

    state = transfer_into_train_state(state, path, verbose=False)

    # mapping fc0 weight landed (transposed to [in, out])
    ref_w = g.mapping.fc0.weight.detach().numpy().T
    np.testing.assert_allclose(
        np.asarray(state.variables['mapping']['params']['fc0']['weight']),
        ref_w, rtol=1e-6)
    # G_ema went to the EMA tree
    np.testing.assert_allclose(
        np.asarray(state.ema['mapping']['params']['fc0']['weight']),
        ref_w, rtol=1e-6)
    # D landed too (fromrgb conv of the top block)
    d_sd = d.state_dict()
    top = [k for k in d_sd if k.endswith('fromrgb.weight')][0]
    got_d = state.variables['local_d'][0]['params']
    blk = top.split('.')[0]
    assert blk in got_d and 'fromrgb' in got_d[blk]
    np.testing.assert_allclose(
        np.asarray(got_d[blk]['fromrgb']['weight']),
        d_sd[top].detach().numpy().transpose(2, 3, 1, 0), rtol=1e-6)
