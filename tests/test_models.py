"""Network construction/shape tests mirroring the reference model zoo.

Covers the 9 MontageGAN layer geometries (SURVEY.md §2.3/§2.4, dataset stats
at reference custom/dataset_aio.py:30-83), num_ws accounting parity with the
reference SynthesisNetwork, STN identity-at-init, and renderer shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu import models
from montage_gan_tpu.utils import calc_init_res

# (layer_name, target (h, w)) — the reference dataset's per-layer geometry.
LAYER_GEOMS = [
    ("hair_back", (256, 256)),
    ("body", (256, 256)),
    ("ear", (160, 224)),
    ("face", (256, 256)),
    ("eye", (96, 160)),
    ("mouth", (64, 96)),
    ("nose", (64, 32)),
    ("hair_front", (256, 256)),
    ("brow", (64, 160)),
]
CCI = 3  # conv_config_index used by the AIO config (reference training_loop_aio.py:58)


def geom(target, cci=CCI):
    init_res, res, _ = calc_init_res(target, conv_config_index=cci)
    return init_res, res


def rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    return {"params": k, "noise": jax.random.fold_in(k, 1)}


# distinct geometries only (square, tall, wide, extreme-aspect) — the other
# reference layers repeat these shapes
DISTINCT_GEOMS = [LAYER_GEOMS[0], LAYER_GEOMS[2], LAYER_GEOMS[4], LAYER_GEOMS[6]]


@pytest.mark.parametrize("name,target", DISTINCT_GEOMS)
def test_synthesis_output_shapes(name, target):
    init_res, res = geom(target)
    # tiny channel config — shape logic is independent of width
    net = models.SynthesisNetwork(img_resolution=res, img_channels=4,
                                  init_res=tuple(init_res), conv_config_index=CCI,
                                  channel_base=1024, channel_max=32,
                                  conv_clamp=256, w_dim=64)
    ws = jnp.zeros((1, net.num_ws, 64))
    variables = net.init(rngs(), ws, noise_mode='const')
    img = net.apply(variables, ws, noise_mode='const')
    assert img.shape == (1, target[0], target[1], 4), (name, img.shape)
    assert img.dtype == jnp.float32


@pytest.mark.reference
@pytest.mark.parametrize("target", [(256, 256), (64, 32), (96, 160)])
def test_num_ws_matches_reference(target):
    from custom.networks_aio import SynthesisNetwork as RefSynthesis

    init_res, res = geom(target)
    ref = RefSynthesis(w_dim=512, img_resolution=res, img_channels=4,
                       init_res=list(init_res), conv_config_index=CCI,
                       channel_base=16384, channel_max=512)
    ours = models.SynthesisNetwork(img_resolution=res, img_channels=4,
                                   init_res=tuple(init_res),
                                   conv_config_index=CCI,
                                   channel_base=16384, channel_max=512)
    assert ours.num_ws == ref.num_ws
    assert list(ours.block_resolutions) == list(ref.block_resolutions)


@pytest.mark.parametrize("name,target", [LAYER_GEOMS[0], LAYER_GEOMS[6]])
def test_discriminator_shapes(name, target):
    init_res, res = geom(target)
    net = models.Discriminator(img_resolution=res, img_channels=4,
                               init_res=tuple(init_res), conv_config_index=CCI,
                               channel_base=1024, channel_max=32,
                               conv_clamp=256, mbstd_group_size=2)
    x = jnp.zeros((2, target[0], target[1], 4))
    variables = net.init(rngs(), x)
    logits = net.apply(variables, x)
    assert logits.shape == (2, 1)
    assert logits.dtype == jnp.float32


def test_mapping_and_global_mapping():
    m = models.MappingNetwork(num_ws=10, num_layers=2, z_dim=64, w_dim=64)
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
    variables = m.init(rngs(), z)
    ws = m.apply(variables, z)
    assert ws.shape == (4, 10, 64)

    gm = models.GlobalMappingNetwork(num_ws=10, num_layers=2, num_splits=9,
                                     z_dim=64, w_dim=64)
    variables = gm.init(rngs(), z)
    ws = gm.apply(variables, z)
    assert ws.shape == (4, 9, 10, 64)

    # w_avg updates under mutable moving_stats
    ws2, mutated = gm.apply(variables, z, update_w_avg=True,
                            mutable=['moving_stats'])
    w_avg = mutated['moving_stats']['w_avg']
    assert w_avg.shape == (64 * 9,)
    assert float(jnp.abs(w_avg).sum()) > 0

    # truncation pulls towards w_avg; flat w_avg [L*w] splits as (L, w)
    vt = {**variables, 'moving_stats': mutated['moving_stats']}
    ws_trunc = gm.apply(vt, z, truncation_psi=0.0)
    avg = np.asarray(w_avg).reshape(9, 64)[None, :, None, :]
    np.testing.assert_allclose(np.asarray(ws_trunc),
                               np.broadcast_to(avg, ws_trunc.shape),
                               rtol=1e-5, atol=1e-6)


def test_stn_identity_at_init():
    """Zero-init regression head ⇒ identity transform at init
    (reference: fukuwarai/networks.py:202-203)."""
    stn = models.STN(img_resolution=64, img_channels=4, img_layers=3,
                     num_stages=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64, 4),
                           minval=-1.0, maxval=1.0)
    variables = stn.init(rngs(), x)
    y, theta = stn.apply(variables, x)
    assert y.shape == x.shape
    assert theta.shape == (2, 3, 2, 3)
    eye = np.tile(np.eye(2, 3, dtype=np.float32), (2, 3, 1, 1))
    np.testing.assert_allclose(np.asarray(theta), eye, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("rtype", ["tanh", "sigmoid", "subpixel"])
def test_renderer_shapes(rtype):
    r = models.build_renderer(rtype, img_resolution=32, img_channels=4,
                              img_layers=9)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 9, 32, 32, 4))
    variables = r.init(rngs(), x)
    y = r.apply(variables, x)
    assert y.shape == (2, 32, 32, 4)
    lo, hi = (-1, 1) if rtype != "sigmoid" else (0, 1)
    assert float(y.min()) >= lo and float(y.max()) <= hi

    if rtype in ("tanh", "sigmoid"):
        # shared mid block ⇒ exactly 3 distinct convs (quirk parity,
        # reference diff_rendering/networks.py:29,74)
        assert set(variables['params'].keys()) == {'conv_in', 'block', 'conv_out'}


def test_generator_wrapper():
    g = models.Generator(img_resolution=32, img_channels=4, init_res=(4, 4),
                         conv_config_index=2, mapping_num_layers=2,
                         channel_base=4096, channel_max=128)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    variables = g.init(rngs(), z, noise_mode='const')
    img = g.apply(variables, z, noise_mode='const')
    assert img.shape == (2, 32, 32, 4)


def test_bf16_blocks():
    """num_fp16_res blocks run in bfloat16; output stays float32."""
    net = models.SynthesisNetwork(img_resolution=32, img_channels=4,
                                  init_res=(4, 4), conv_config_index=2,
                                  channel_base=4096, channel_max=128,
                                  num_fp16_res=2, conv_clamp=256)
    ws = jnp.zeros((2, net.num_ws, 512))
    variables = net.init(rngs(), ws, noise_mode='const')
    img = net.apply(variables, ws, noise_mode='const')
    assert img.dtype == jnp.float32
    assert img.shape == (2, 32, 32, 4)
