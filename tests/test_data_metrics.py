"""Data pipeline + metrics machinery tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu.data.sampler import InfiniteSampler
from montage_gan_tpu.data.synthetic import make_synthetic_layer_dataset, synthetic_batch
from montage_gan_tpu.data.dataset import DatasetAIO
from montage_gan_tpu.metrics.features import RandomFeatures
from montage_gan_tpu.metrics.frechet_inception_distance import compute_fid_from_stats
from montage_gan_tpu.metrics.kernel_inception_distance import compute_kid_from_features
from montage_gan_tpu.metrics.metric_utils import (FeatureStats,
                                                  layers_to_metric_rgb)
from montage_gan_tpu.utils.image_utils import (alpha_composite_np,
                                               generate_pseudo_fake_np,
                                               make_batch_for_local_d_np)


@pytest.mark.reference
def test_infinite_sampler_matches_reference():
    from torch_utils.misc import InfiniteSampler as RefSampler

    class _FakeDs:
        def __len__(self):
            return 23

    try:  # reference Sampler.__init__ is incompatible with newer torch
        RefSampler(_FakeDs(), rank=0, num_replicas=1, seed=0)
    except TypeError:
        pytest.skip("reference InfiniteSampler incompatible with this torch")

    for rank, reps in [(0, 1), (1, 4), (3, 4)]:
        ours = iter(InfiniteSampler(23, rank=rank, num_replicas=reps, seed=7))
        ref = iter(RefSampler(_FakeDs(), rank=rank, num_replicas=reps, seed=7))
        ours_seq = [next(ours) for _ in range(200)]
        ref_seq = [next(ref) for _ in range(200)]
        assert ours_seq == ref_seq, (rank, reps)


def test_infinite_sampler_rank_partition():
    streams = [iter(InfiniteSampler(10, rank=r, num_replicas=4, seed=0))
               for r in range(4)]
    seen = [next(s) for s in streams for _ in range(1)]
    assert all(0 <= i < 10 for i in seen)


def test_synthetic_dataset_roundtrip(tmp_path):
    path = make_synthetic_layer_dataset(str(tmp_path / "ds"), num_samples=4,
                                        size=64)
    ds = DatasetAIO(path, conv_config_index=2)
    assert len(ds) == 4
    assert ds.num_layers == 9
    x = ds[0]
    assert x.shape == (9, 64, 64, 4)
    assert 0 <= x.min() and x.max() <= 1
    # xflip doubling
    ds2 = DatasetAIO(path, xflip=True)
    assert len(ds2) == 8
    np.testing.assert_allclose(ds2[4], ds2[0][:, :, ::-1])
    # stats cache materialized
    assert os.path.exists(os.path.join(path, "montage_stats.json"))
    # per-layer targets are valid pyramid outputs ≤ canvas
    for name in ds.layer_names:
        th, tw = ds.target_res_layer(name)
        assert th <= 64 and tw <= 64


def test_make_batch_for_local_d_contract():
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, 2, num_layers=3, size=64)
    crops = make_batch_for_local_d_np(batch, [(64, 64), (32, 16), (16, 16)],
                                      to_minus11=True)
    assert crops[0].shape == (2, 64, 64, 4)
    assert crops[1].shape == (2, 32, 16, 4)
    assert -1 <= crops[0].min() and crops[0].max() <= 1
    # recentring: content bbox center of the pseudo-fake is the image center
    pf = generate_pseudo_fake_np(batch)
    for b in range(2):
        for l in range(3):
            ys, xs = np.nonzero(pf[b, l, ..., 3])
            if len(ys):
                cy = (ys.min() + ys.max()) / 2
                cx = (xs.min() + xs.max()) / 2
                assert abs(cy - 31.5) <= 1.0 and abs(cx - 31.5) <= 1.0


def test_feature_stats_mean_cov():
    rng = np.random.RandomState(1)
    x = rng.randn(500, 16).astype(np.float32)
    st = FeatureStats(capture_mean_cov=True, capture_all=True)
    for i in range(0, 500, 64):
        st.append(x[i:i + 64])
    mean, cov = st.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(st.get_all(), x)


def test_fid_kid_sanity():
    rng = np.random.RandomState(2)
    a = rng.randn(800, 8)
    b = rng.randn(800, 8)
    c = rng.randn(800, 8) + 3.0
    ma, Sa = a.mean(0), np.cov(a.T, bias=True)
    mb, Sb = b.mean(0), np.cov(b.T, bias=True)
    mc, Sc = c.mean(0), np.cov(c.T, bias=True)
    fid_same = compute_fid_from_stats(ma, Sa, mb, Sb)
    fid_diff = compute_fid_from_stats(ma, Sa, mc, Sc)
    assert fid_same < 1.0
    assert fid_diff > 5.0 and fid_diff > fid_same * 3

    kid_same = compute_kid_from_features(a, b, num_subsets=10,
                                         max_subset_size=400)
    kid_diff = compute_kid_from_features(a, c, num_subsets=10,
                                         max_subset_size=400)
    assert kid_diff > kid_same


def test_random_features_deterministic():
    rng = np.random.RandomState(3)
    imgs = rng.rand(4, 32, 32, 3).astype(np.float32) * 255
    f1 = np.asarray(RandomFeatures(seed=0)(jnp.asarray(imgs)))
    f2 = np.asarray(RandomFeatures(seed=0)(jnp.asarray(imgs)))
    np.testing.assert_allclose(f1, f2)
    assert f1.shape == (4, 2048)


def test_layers_to_metric_rgb():
    rng = np.random.RandomState(4)
    batch = synthetic_batch(rng, 2, num_layers=3, size=32)
    rgb = layers_to_metric_rgb(batch)
    assert rgb.shape == (2, 32, 32, 3)
    assert rgb.min() >= 0 and rgb.max() <= 255
    # fully transparent everywhere → white background
    empty = np.zeros((1, 3, 8, 8, 4), np.float32)
    white = layers_to_metric_rgb(empty)
    np.testing.assert_allclose(white, 255.0, atol=1e-3)


@pytest.mark.reference
def test_widen_mapping_to_global():
    """Mapping→GlobalMapping widening rule parity
    (reference: custom/training_loop_aio.py:321-334): loading a plain
    MappingNetwork checkpoint into a GlobalMappingNetwork by repeating the
    final layer's output params per image layer — every layer's ws must then
    equal the original mapping's ws."""
    from montage_gan_tpu import models
    from montage_gan_tpu.utils.torch_import import widen_mapping_to_global

    m = models.MappingNetwork(z_dim=16, w_dim=16, num_ws=4, num_layers=2)
    z = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    mv = m.init({'params': jax.random.PRNGKey(1)}, z)
    ws = m.apply(mv, z)

    gm = models.GlobalMappingNetwork(z_dim=16, w_dim=16, num_ws=4,
                                     num_layers=2, num_splits=5)
    gv = widen_mapping_to_global(mv, 5)
    gws = gm.apply(gv, z)
    assert gws.shape == (3, 5, 4, 16)
    for l in range(5):
        np.testing.assert_allclose(np.asarray(gws[:, l]), np.asarray(ws),
                                   rtol=1e-5, atol=1e-6)


def test_ppl_machinery():
    from montage_gan_tpu.metrics.perceptual_path_length import (compute_ppl,
                                                                slerp)
    a = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    b = jnp.asarray([[0.0, 1.0], [2.0, 0.0]])
    mid = slerp(a, b, 0.5)
    # slerp returns unit vectors (reference perceptual_path_length.py:24-33)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(mid), axis=-1),
                               [1.0, 1.0], rtol=1e-5)
    a_unit = np.asarray(a) / np.linalg.norm(np.asarray(a), axis=-1,
                                            keepdims=True)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), a_unit,
                               atol=1e-6)

    # a smooth sampler has finite, small PPL; a discontinuous one larger
    class IdFeatures:
        name = 'id'

        def __call__(self, imgs):
            return imgs.reshape(imgs.shape[0], -1) / 255.0

    def smooth_pair(z0, z1):
        def render(z):
            v = jnp.tanh(z[:, :3])
            return jnp.tile(v[:, None, None, :], (1, 4, 4, 1)) * 0.5 + 0.5
        return render(z0), render(z1)

    ppl = compute_ppl(smooth_pair, z_dim=8, extractor=IdFeatures(),
                      num_samples=64, batch_size=16)
    assert np.isfinite(ppl) and ppl >= 0


def test_legacy_metric_registrations():
    """All reference metric names (metric_main.py:88-176) are registered."""
    from montage_gan_tpu.metrics import metric_main
    expected = {'fid50k_full', 'kid50k_full', 'pr50k3_full', 'ppl2_wend',
                'is50k', 'fid50k', 'kid50k', 'pr50k3', 'ppl_zfull',
                'ppl_wfull', 'ppl_zend', 'ppl_wend'}
    assert expected <= set(metric_main.list_valid_metrics())


def test_ppl_legacy_variant_runs():
    """ppl_zend end-to-end through the registry with a toy sampler."""
    import jax.numpy as jnp
    from montage_gan_tpu.metrics import metric_main

    def sample_fn(z):
        img = jnp.tile(jnp.tanh(z[:, :1])[:, None, None, None] * 0.5 + 0.5,
                       (1, 16, 16, 3))
        return img

    class IdFeatures:
        def __call__(self, x):
            return x.reshape(x.shape[0], -1) / 255.0

    res = metric_main.calc_metric('ppl_zend', dataset=None,
                                  sample_fn=sample_fn, z_dim=8,
                                  extractor=IdFeatures(), batch_size=64,
                                  ppl_samples=64)
    assert np.isfinite(res.results['ppl_zend'])


def test_ppl_wspace_interpolates_in_w():
    """ppl_wend/ppl2_wend really interpolate in W: with a mapping whose image
    is a curved manifold, w-lerp endpoints differ from mapping the z-slerp
    endpoints (reference semantics, perceptual_path_length.py:57-64), and
    the metric runs end-to-end through map_fn/synth_fn."""
    import jax.numpy as jnp
    from montage_gan_tpu.metrics import metric_main

    seen_ws = []

    def map_fn(z):
        return jnp.tanh(z) ** 3  # nonlinear: lerp in w != map(slerp in z)

    def synth_fn(ws):
        seen_ws.append(np.asarray(ws))
        return jnp.tile(ws[:, :1][:, None, None] * 0.5 + 0.5, (1, 16, 16, 3))

    class IdFeatures:
        def __call__(self, x):
            return x.reshape(x.shape[0], -1) / 255.0

    res = metric_main.calc_metric('ppl2_wend', dataset=None, map_fn=map_fn,
                                  synth_fn=synth_fn, z_dim=8,
                                  extractor=IdFeatures(), batch_size=32,
                                  ppl_samples=32, seed=3)
    assert np.isfinite(res.results['ppl2_wend'])
    # endpoint sampling: the first synth call saw exactly w0 = map_fn(z0)
    # (t=0 lerp), NOT a z-interpolated remap — check it lies in tanh³ range
    assert len(seen_ws) >= 2
    w0, w1 = seen_ws[0], seen_ws[1]
    assert np.abs(w0).max() < 1.0
    # the ε-perturbed endpoint differs (w-lerp moved toward w1)
    assert not np.allclose(w0, w1)

    # the w-space variants refuse to run without the mapping split
    import pytest
    with pytest.raises(ValueError, match='map_fn'):
        metric_main.calc_metric('ppl_wend', dataset=None,
                                sample_fn=lambda z: None, z_dim=8,
                                extractor=IdFeatures(), ppl_samples=8)


def test_ppl_crop_window_matches_reference():
    """The legacy cropped variants use the reference's asymmetric window:
    rows c*3:c*7, cols c*2:c*6 with c = H//8
    (reference perceptual_path_length.py:76-78)."""
    from montage_gan_tpu.metrics.perceptual_path_length import _crop
    img = jnp.arange(16 * 16, dtype=jnp.float32).reshape(1, 16, 16, 1)
    out = np.asarray(_crop(img))
    c = 2
    np.testing.assert_array_equal(
        out, np.asarray(img)[:, c * 3:c * 7, c * 2:c * 6])
    assert out.shape == (1, 8, 8, 1)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_metric_feature_loops_on_mesh_match_single_device(tmp_path):
    """Mesh-sharded metric eval (the reference's calc_metrics --gpus DDP
    fan-out, calc_metrics.py:33-42) computes the same features/statistics
    as the single-device loops — including ragged tails that need padding
    up to the device count."""
    from montage_gan_tpu.metrics.metric_utils import (
        compute_feature_stats_for_dataset, compute_feature_stats_for_generator)
    from montage_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    ext = RandomFeatures(seed=0, num_stages=2, width=32)

    # dataset path: n=10 with batch 4 → a ragged 2-row tail (pad path)
    path = str(tmp_path / 'layers')
    make_synthetic_layer_dataset(path, num_samples=10, size=16,
                                 spec=(('#1_a', (4, 4), (5, 6)),
                                       ('#2_b', (4, 6), (6, 4))))
    ds = DatasetAIO(path)
    kw = dict(batch_size=4, capture_all=True, capture_mean_cov=True)
    st_single = compute_feature_stats_for_dataset(ds, ext, **kw)
    st_mesh = compute_feature_stats_for_dataset(ds, ext, mesh=mesh, **kw)
    assert st_single.num_items == st_mesh.num_items == 10
    np.testing.assert_allclose(st_mesh.get_all(), st_single.get_all(),
                               rtol=1e-5, atol=1e-5)

    # generator path: same PRNG stream → identical z draws on both paths
    def sample_fn(z):
        img = jnp.broadcast_to(z[:, None, None, :16],
                               (z.shape[0], 16, 16, 16))[..., :4]
        return jax.nn.sigmoid(img)

    gkw = dict(num_items=12, batch_size=8, seed=3, capture_all=True)
    g_single = compute_feature_stats_for_generator(sample_fn, 32, ext, **gkw)
    g_mesh = compute_feature_stats_for_generator(sample_fn, 32, ext,
                                                 mesh=mesh, **gkw)
    np.testing.assert_allclose(g_mesh.get_all(), g_single.get_all(),
                               rtol=1e-5, atol=1e-5)

    # PPL end-to-end on the mesh equals the single-device run
    from montage_gan_tpu.metrics import metric_main

    class IdFeatures:
        name = 'id'

        def __call__(self, x):
            return x.reshape(x.shape[0], -1)

    def map_fn(z):
        return jnp.tanh(z) * 2.0

    def synth_fn(ws):
        return jnp.broadcast_to(ws[:, None, None, :8],
                                (ws.shape[0], 8, 8, 8))[..., :3]

    common = dict(dataset=None, map_fn=map_fn, synth_fn=synth_fn, z_dim=32,
                  extractor=IdFeatures(), ppl_samples=16, batch_size=8,
                  seed=5)
    r_single = metric_main.calc_metric('ppl2_wend', **common)
    r_mesh = metric_main.calc_metric('ppl2_wend', mesh=make_mesh(4), **common)
    assert r_mesh.num_gpus == 4
    np.testing.assert_allclose(r_mesh.results['ppl2_wend'],
                               r_single.results['ppl2_wend'],
                               rtol=1e-4, atol=1e-6)
