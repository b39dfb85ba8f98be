"""Safe persistence-pickle importer tests.

Creates a real reference-style persistence pickle (via the reference's own
``torch_utils.persistence`` + networks, random init) and verifies our
restricted unpickler extracts the exact state_dict and init kwargs WITHOUT
executing the embedded module source (reference hazard:
torch_utils/persistence.py:9-14; loader contract: legacy.py:21-61).
"""

import io
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from montage_gan_tpu.utils import pkl_import, torch_import  # noqa: E402


def _make_ref_generator():
    from custom.networks_aio import Generator
    from torch_utils import persistence
    cls = persistence.persistent_class(Generator)
    g = cls(z_dim=16, c_dim=0, w_dim=16, img_resolution=16, img_channels=4,
            mapping_kwargs=dict(num_layers=2),
            synthesis_kwargs=dict(channel_base=512, channel_max=64,
                                  num_fp16_res=0, conv_clamp=None))
    return g


def test_extract_state_dict_matches_torch(tmp_path):
    g = _make_ref_generator()
    path = str(tmp_path / 'snap.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G_ema=g, training_set_kwargs={'foo': 1}), f)

    loaded = pkl_import.load_network_pkl(path)
    assert loaded['training_set_kwargs'] == {'foo': 1}
    net = loaded['G_ema']
    assert net['class_name'] == 'Generator'
    assert net['init_kwargs']['z_dim'] == 16
    ref_sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    got_sd = net['state_dict']
    assert set(got_sd) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(got_sd[k], ref_sd[k], err_msg=k)


def test_no_source_execution(tmp_path):
    """A pickle whose embedded source / globals would run hostile code must
    load inertly (the whole point of the restricted unpickler)."""
    meta = dict(type='class', version=6,
                module_src='raise RuntimeError("executed embedded source")',
                class_name='Evil', state={'_parameters': {}, '_buffers': {},
                                          '_modules': {}})

    class FakePersistent:
        def __reduce__(self):
            return (_fake_reconstruct, (meta,))

    # Craft bytes referencing torch_utils.persistence._reconstruct_persistent_obj.
    # Protocol 0 writes globals as plain "c<module>\n<name>\n" text, so the
    # module/name can be swapped without breaking pickle framing.
    payload = pickle.dumps({'G': FakePersistent()}, protocol=0)
    payload = payload.replace(_fake_reconstruct.__module__.encode(),
                              b'torch_utils.persistence')
    payload = payload.replace(b'_fake_reconstruct',
                              b'_reconstruct_persistent_obj')
    path = str(tmp_path / 'evil.pkl')
    with open(path, 'wb') as f:
        f.write(payload)
    loaded = pkl_import.load_network_pkl(path)  # must not raise/execute
    assert loaded['G']['class_name'] == 'Evil'

    # and arbitrary globals (e.g. os.system) become inert placeholders
    evil2 = pickle.dumps({'x': 1}).replace(b'x', b'y')  # trivially safe base
    obj = pkl_import._SafeUnpickler(io.BytesIO(evil2)).load()
    assert obj == {'y': 1}
    cls = pkl_import._SafeUnpickler(io.BytesIO(b'')).find_class('os', 'system')
    inst = cls('echo pwned')  # calling it must NOT run a shell
    assert isinstance(inst, pkl_import._Opaque)


def _fake_reconstruct(meta):  # placeholder global for pickling above
    raise AssertionError('should never run')


def test_generate_cli_from_pkl(tmp_path):
    from click.testing import CliRunner
    from montage_gan_tpu.cli.generate import main as gen_main

    g = _make_ref_generator().eval()
    path = str(tmp_path / 'snap.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G_ema=g), f)
    outdir = str(tmp_path / 'out')
    res = CliRunner().invoke(gen_main, ['--network', path, '--seeds', '0,1',
                                        '--outdir', outdir, '--trunc', '1.0'])
    assert res.exit_code == 0, res.output
    import os
    assert sorted(os.listdir(outdir)) == ['seed0000.png', 'seed0001.png']


def test_convert_pickle_cli_roundtrip(tmp_path):
    """pkl → native snapshot → generate parity vs the torch forward."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.convert_pickle import main as conv_main

    g = _make_ref_generator().eval()
    src = str(tmp_path / 'snap.pkl')
    with open(src, 'wb') as f:
        pickle.dump(dict(G_ema=g), f)
    dest = str(tmp_path / 'converted')
    res = CliRunner().invoke(conv_main, ['--source', src, '--dest', dest])
    assert res.exit_code == 0, res.output

    import jax
    import jax.numpy as jnp
    from montage_gan_tpu.utils.checkpoint import load_ema_snapshot

    cfg, ens, tree = load_ema_snapshot(dest + '.msgpack')
    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    ws = ens.mapping.apply(tree['mapping'], jnp.asarray(z))
    img = ens.local_gs[0].apply(tree['local_g'][0],
                                ens.ws_for_layer(ws, 0),
                                noise_mode='const', force_fp32=True)
    with torch.no_grad():
        img_ref = g(torch.tensor(z), None, noise_mode='const',
                    force_fp32=True).numpy()
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2),
                               img_ref, rtol=5e-3, atol=5e-4)


def test_calc_metrics_cli_from_pkl(tmp_path):
    from click.testing import CliRunner
    from PIL import Image
    from montage_gan_tpu.cli.calc_metrics import main as cm_main

    g = _make_ref_generator().eval()
    path = str(tmp_path / 'snap.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G_ema=g), f)

    data = tmp_path / 'imgs'
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 256, (16, 16, 4), dtype=np.uint8),
                        'RGBA').save(str(data / f'{i}.png'))

    res = CliRunner().invoke(cm_main, [
        '--network', path, '--data', str(data), '--metrics', 'fid2k',
        '--extractor', 'random', '--batch', '4',
        '--cache-dir', str(tmp_path / 'cache')])
    assert res.exit_code == 0, res.output
    assert 'fid2k' in res.output


def test_generator_variables_from_pkl_forward_parity(tmp_path):
    g = _make_ref_generator().eval()
    path = str(tmp_path / 'snap.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G_ema=g), f)

    mapping_vars, synthesis_vars, kw = \
        pkl_import.generator_variables_from_pkl(path)
    assert kw['img_resolution'] == 16

    import jax.numpy as jnp
    from montage_gan_tpu import models

    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ws_ref = g.mapping(torch.tensor(z), None)
        img_ref = g.synthesis(ws_ref, noise_mode='const',
                              force_fp32=True).numpy()

    mapping = models.MappingNetwork(z_dim=16, w_dim=16,
                                    num_ws=int(ws_ref.shape[1]), num_layers=2)
    ws = mapping.apply(mapping_vars, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ws), ws_ref.numpy(),
                               rtol=1e-4, atol=1e-5)

    synth = models.SynthesisNetwork(img_resolution=16, img_channels=4,
                                    w_dim=16, channel_base=512,
                                    channel_max=64)
    img = synth.apply(synthesis_vars, ws, noise_mode='const',
                      force_fp32=True)
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2), img_ref,
                               rtol=5e-3, atol=5e-4)
