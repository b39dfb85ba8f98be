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


def test_generate_cli_conditional_class_label(tmp_path):
    """--class parity with reference generate.py:44,111-118: a conditional
    pkl refuses to sample without --class, samples with a valid label, and
    an unconditional network warns when --class is passed."""
    from click.testing import CliRunner
    from custom.networks_aio import Generator
    from torch_utils import persistence

    cls = persistence.persistent_class(Generator)
    g = cls(z_dim=16, c_dim=3, w_dim=16, img_resolution=16, img_channels=4,
            mapping_kwargs=dict(num_layers=2),
            synthesis_kwargs=dict(channel_base=512, channel_max=64,
                                  num_fp16_res=0, conv_clamp=None)).eval()
    path = str(tmp_path / 'cond.pkl')
    with open(path, 'wb') as f:
        pickle.dump(dict(G_ema=g), f)

    from montage_gan_tpu.cli.generate import main as gen_main
    outdir = str(tmp_path / 'out')

    # conditional without --class → refused
    res = CliRunner().invoke(gen_main, ['--network', path, '--seeds', '0',
                                        '--outdir', outdir])
    assert res.exit_code != 0
    assert 'Must specify class label with --class' in res.output

    # out-of-range label → refused
    res = CliRunner().invoke(gen_main, ['--network', path, '--seeds', '0',
                                        '--outdir', outdir, '--class', '7'])
    assert res.exit_code != 0 and 'out of range' in res.output

    # valid label → sampled, and the label actually reaches the mapping:
    # different classes must give different images
    import os
    from PIL import Image
    imgs = {}
    for ci in (0, 2):
        od = str(tmp_path / f'out{ci}')
        res = CliRunner().invoke(gen_main, ['--network', path, '--seeds', '0',
                                            '--outdir', od, '--class', str(ci)])
        assert res.exit_code == 0, res.output
        assert os.listdir(od) == ['seed0000.png']
        imgs[ci] = np.asarray(Image.open(f'{od}/seed0000.png'))
    assert not np.array_equal(imgs[0], imgs[2])

    # unconditional network + --class → warn, still samples
    g0 = _make_ref_generator().eval()
    path0 = str(tmp_path / 'uncond.pkl')
    with open(path0, 'wb') as f:
        pickle.dump(dict(G_ema=g0), f)
    od = str(tmp_path / 'outu')
    res = CliRunner().invoke(gen_main, ['--network', path0, '--seeds', '0',
                                        '--outdir', od, '--class', '1'])
    assert res.exit_code == 0, res.output
    assert 'ignored when running on an unconditional network' in res.output


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


# ---------------------------------------------------------------------------
# TF1 (legacy StyleGAN2) pickle branch — parity vs the reference's
# legacy.py:117-320 converter as oracle.
# ---------------------------------------------------------------------------

def _install_fake_tf_network_cls():
    """A dict-subclass pickled under the 'dnnlib.tflib.network.Network'
    global — the name both unpicklers intercept (reference legacy.py:70-77;
    ours pkl_import._SafeUnpickler)."""
    import sys
    import types
    mod = sys.modules.get('dnnlib.tflib.network')
    if mod is None:
        for name in ('dnnlib.tflib', 'dnnlib.tflib.network'):
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
        mod = sys.modules['dnnlib.tflib.network']
    if not hasattr(mod, 'Network'):
        cls = type('Network', (dict,), {})
        cls.__module__ = 'dnnlib.tflib.network'
        mod.Network = cls
    return mod.Network


def _t2tf_conv(w, flip=False):
    """torch conv [O,I,kh,kw] → TF [kh,kw,I,O] (inverse of legacy.py's
    transpose(3,2,0,1), with the Conv0_up/Skip spatial flip)."""
    v = w.detach().numpy().transpose(2, 3, 1, 0)
    return np.ascontiguousarray(v[::-1, ::-1] if flip else v)


def _make_tf_pickle(tmp_path, res=16, img_channels=4):
    """Build tiny reference-torch G/D, express their params in TF-pickle
    layout, and write a (G, D, Gs) legacy pickle both loaders accept."""
    import sys
    sys.path.insert(0, "/root/reference/montage_gan")
    from training import networks as ref_networks

    fmap_base, fmap_max = 256, 64
    g = ref_networks.Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=res,
        img_channels=img_channels, mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=fmap_base * 2,
                              channel_max=fmap_max)).eval()
    d = ref_networks.Discriminator(
        c_dim=0, img_resolution=res, img_channels=img_channels,
        channel_base=fmap_base * 2, channel_max=fmap_max,
        epilogue_kwargs=dict(mbstd_group_size=None)).eval()

    gv = {}
    gsd = dict(g.named_parameters())
    gsd.update(dict(g.named_buffers()))
    gv['dlatent_avg'] = gsd['mapping.w_avg'].numpy()
    for i in range(2):
        gv[f'mapping/Dense{i}/weight'] = \
            gsd[f'mapping.fc{i}.weight'].detach().numpy().T
        gv[f'mapping/Dense{i}/bias'] = \
            gsd[f'mapping.fc{i}.bias'].detach().numpy()
    gv['synthesis/4x4/Const/const'] = \
        gsd['synthesis.b4.const'].detach().numpy()[None]
    noise_of = {'synthesis.b4.conv1': 0}
    for r in [8 << i for i in range(res.bit_length() - 3)]:
        lg = int(np.log2(r))
        noise_of[f'synthesis.b{r}.conv0'] = lg * 2 - 5
        noise_of[f'synthesis.b{r}.conv1'] = lg * 2 - 4
    for tname, tf_base in (
            [('synthesis.b4.conv1', 'synthesis/4x4/Conv')] +
            [(f'synthesis.b{r}.{c}',
              f'synthesis/{r}x{r}/{tf}')
             for r in [8 << i for i in range(res.bit_length() - 3)]
             for c, tf in (('conv0', 'Conv0_up'), ('conv1', 'Conv1'))] +
            [(f'synthesis.b{r}.torgb', f'synthesis/{r}x{r}/ToRGB')
             for r in [4 << i for i in range(res.bit_length() - 2)]]):
        flip = tf_base.endswith('Conv0_up')
        gv[f'{tf_base}/weight'] = _t2tf_conv(gsd[f'{tname}.weight'], flip)
        gv[f'{tf_base}/bias'] = gsd[f'{tname}.bias'].detach().numpy()
        gv[f'{tf_base}/mod_weight'] = \
            gsd[f'{tname}.affine.weight'].detach().numpy().T
        gv[f'{tf_base}/mod_bias'] = \
            gsd[f'{tname}.affine.bias'].detach().numpy() - 1
        if tname in noise_of:
            gv[f'{tf_base}/noise_strength'] = \
                gsd[f'{tname}.noise_strength'].detach().numpy()
            gv[f'synthesis/noise{noise_of[tname]}'] = \
                gsd[f'{tname}.noise_const'].detach().numpy()[None, None]

    dv = {}
    dsd = dict(d.named_parameters())
    dsd.update(dict(d.named_buffers()))
    for r in [res >> i for i in range(res.bit_length() - 3)]:
        for tname, tf_name in ((f'b{r}.fromrgb', f'{r}x{r}/FromRGB'),
                               (f'b{r}.conv0', f'{r}x{r}/Conv0'),
                               (f'b{r}.conv1', f'{r}x{r}/Conv1_down'),
                               (f'b{r}.skip', f'{r}x{r}/Skip')):
            if f'{tname}.weight' in dsd:
                dv[f'{tf_name}/weight'] = _t2tf_conv(dsd[f'{tname}.weight'])
                if f'{tname}.bias' in dsd:
                    dv[f'{tf_name}/bias'] = \
                        dsd[f'{tname}.bias'].detach().numpy()
    dv['4x4/Conv/weight'] = _t2tf_conv(dsd['b4.conv.weight'])
    dv['4x4/Conv/bias'] = dsd['b4.conv.bias'].detach().numpy()
    dv['4x4/Dense0/weight'] = dsd['b4.fc.weight'].detach().numpy().T
    dv['4x4/Dense0/bias'] = dsd['b4.fc.bias'].detach().numpy()
    dv['Output/weight'] = dsd['b4.out.weight'].detach().numpy().T
    dv['Output/bias'] = dsd['b4.out.bias'].detach().numpy()

    Network = _install_fake_tf_network_cls()

    def net(kwargs, variables):
        return Network(version=4, static_kwargs=dict(kwargs), components={},
                       variables=[(k, v) for k, v in variables.items()])

    g_kwargs = dict(latent_size=16, dlatent_size=16, resolution=res,
                    num_channels=img_channels, mapping_layers=2,
                    fmap_base=fmap_base, fmap_max=fmap_max)
    d_kwargs = dict(resolution=res, num_channels=img_channels,
                    fmap_base=fmap_base, fmap_max=fmap_max)
    path = str(tmp_path / 'tf_legacy.pkl')
    with open(path, 'wb') as f:
        pickle.dump((net(g_kwargs, gv), net(d_kwargs, dv),
                     net(g_kwargs, gv)), f)
    return path, g, d


@pytest.mark.reference
def test_tf1_pkl_matches_reference_converter(tmp_path):
    """Our TF1 branch reproduces legacy.py's converted torch state_dicts."""
    path, _, _ = _make_tf_pickle(tmp_path)
    import sys
    sys.path.insert(0, "/root/reference/montage_gan")
    import legacy as ref_legacy

    with open(path, 'rb') as f:
        ref_data = ref_legacy.load_network_pkl(f)
    ours = pkl_import.load_network_pkl(path)

    for key in ('G', 'D', 'G_ema'):
        ref_sd = {k: v.detach().numpy()
                  for k, v in ref_data[key].state_dict().items()
                  if not k.endswith('resample_filter')}
        got_sd = ours[key]['state_dict']
        assert set(got_sd) == set(ref_sd), key
        for k in ref_sd:
            np.testing.assert_allclose(got_sd[k], ref_sd[k], atol=1e-6,
                                       err_msg=f'{key}:{k}')


@pytest.mark.reference
def test_tf1_pkl_generate_forward_parity(tmp_path):
    """TF1 pkl → our flax generator forward matches the torch original."""
    path, g, _ = _make_tf_pickle(tmp_path)

    import jax.numpy as jnp
    from montage_gan_tpu import models

    mapping_vars, synthesis_vars, kw = \
        pkl_import.generator_variables_from_pkl(path)
    assert kw['img_resolution'] == 16

    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ws_ref = g.mapping(torch.tensor(z), None)
        img_ref = g.synthesis(ws_ref, noise_mode='const',
                              force_fp32=True).numpy()

    mapping = models.MappingNetwork(z_dim=16, w_dim=16,
                                    num_ws=int(ws_ref.shape[1]), num_layers=2)
    ws = mapping.apply(mapping_vars, jnp.asarray(z))
    synth = models.SynthesisNetwork(
        img_resolution=16, img_channels=4, w_dim=16,
        channel_base=kw['synthesis_kwargs']['channel_base'],
        channel_max=kw['synthesis_kwargs']['channel_max'])
    img = synth.apply(synthesis_vars, ws, noise_mode='const', force_fp32=True)
    np.testing.assert_allclose(np.asarray(img).transpose(0, 3, 1, 2), img_ref,
                               rtol=5e-3, atol=5e-4)
