"""Golden-value parity tests for the op layer vs the upstream reference.

The reference's pure-PyTorch 'ref' implementations define the op contracts
(SURVEY.md §4 point 3); every op here must match them numerically, including
1st- and 2nd-order gradients (the reference hand-codes those in CUDA —
bias_act.cu G∈{0,1,2}; we get them from JAX AD and must prove equivalence).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montage_gan_tpu import ops

torch = pytest.importorskip("torch")


def to_nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def to_nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


def t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# upfirdn2d
# ---------------------------------------------------------------------------

UPFIRDN_CASES = [
    dict(up=1, down=1, padding=0, f=[1, 3, 3, 1]),
    dict(up=2, down=1, padding=1, f=[1, 3, 3, 1], gain=4.0),
    dict(up=1, down=2, padding=[1, 2], f=[1, 3, 3, 1]),
    dict(up=2, down=2, padding=[2, 1, 1, 2], f=[1, 2, 1]),
    dict(up=1, down=1, padding=[-1, 2, 0, -2], f=[1, 3, 3, 1]),  # negative = crop
    dict(up=[2, 1], down=[1, 2], padding=[1, 1, 2, 2], f=[1, 3, 3, 1]),
    dict(up=1, down=1, padding=3, f=None),
    dict(up=2, down=1, padding=2, f=[1, 3, 3, 1], flip_filter=True),
    # separable 8-tap (wavelet-style) filter
    dict(up=2, down=1, padding=3, f=list(range(1, 9)), gain=2.0),
    dict(up=1, down=2, padding=3, f=list(range(1, 9))),
]


@pytest.mark.reference
@pytest.mark.parametrize("case", UPFIRDN_CASES)
def test_upfirdn2d_forward(case):
    from torch_utils.ops.upfirdn2d import _upfirdn2d_ref, setup_filter as ref_setup

    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 3).astype(np.float32)
    f_arg = case.get("f")
    flip = case.get("flip_filter", False)
    gain = case.get("gain", 1.0)

    f_ours = ops.setup_filter(f_arg) if f_arg is not None else None
    y = ops.upfirdn2d(jnp.asarray(x), f_ours, up=case["up"], down=case["down"],
                      padding=case["padding"], flip_filter=flip, gain=gain)

    f_ref = ref_setup(f_arg) if f_arg is not None else None
    y_ref = _upfirdn2d_ref(t(to_nchw(x)), f_ref, up=case["up"], down=case["down"],
                           padding=case["padding"], flip_filter=flip, gain=gain)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.numpy()),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.reference
def test_upfirdn2d_gradient():
    from torch_utils.ops.upfirdn2d import _upfirdn2d_ref, setup_filter as ref_setup

    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 2).astype(np.float32)
    f = [1, 3, 3, 1]

    def loss_ours(xx):
        y = ops.upfirdn2d(xx, ops.setup_filter(f), up=2, padding=1, gain=4.0)
        return jnp.sum(jnp.sin(y))

    g_ours = jax.grad(loss_ours)(jnp.asarray(x))

    xt = t(to_nchw(x)).requires_grad_(True)
    y_ref = _upfirdn2d_ref(xt, ref_setup(f), up=2, padding=1, gain=4.0)
    torch.sin(y_ref).sum().backward()
    np.testing.assert_allclose(np.asarray(g_ours), to_nhwc(xt.grad.numpy()),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.reference
@pytest.mark.parametrize("helper", ["filter2d", "upsample2d", "downsample2d"])
def test_upfirdn2d_helpers(helper):
    import torch_utils.ops.upfirdn2d as ref_up

    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, 16, 4).astype(np.float32)
    f = [1, 3, 3, 1]
    ours = getattr(ops, helper)(jnp.asarray(x), ops.setup_filter(f))
    ref = getattr(ref_up, helper)(t(to_nchw(x)), ref_up.setup_filter(f), impl="ref")
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref.numpy()),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# bias_act
# ---------------------------------------------------------------------------

ACTS = ["linear", "relu", "lrelu", "tanh", "sigmoid", "elu", "selu", "softplus", "swish"]


@pytest.mark.reference
@pytest.mark.parametrize("act", ACTS)
def test_bias_act_forward_and_grads(act):
    from torch_utils.ops.bias_act import _bias_act_ref

    rng = np.random.RandomState(3)
    x = rng.randn(4, 6, 5, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    clamp = 0.9 if act in ("linear", "lrelu") else None

    y = ops.bias_act(jnp.asarray(x), jnp.asarray(b), dim=-1, act=act, clamp=clamp)
    # reference is NCHW/dim=1 → feed it channel-first
    y_ref = _bias_act_ref(t(to_nchw(x)), t(b), dim=1, act=act, clamp=clamp)
    # tolerance covers math-library differences (XLA vs torch exp/tanh)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.numpy()),
                               rtol=1e-3, atol=2e-4)

    # 1st-order gradients
    def loss(xx, bb):
        return jnp.sum(jnp.cos(ops.bias_act(xx, bb, dim=-1, act=act, clamp=clamp)))

    gx, gb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(b))
    xt = t(to_nchw(x)).requires_grad_(True)
    bt = t(b).requires_grad_(True)
    torch.cos(_bias_act_ref(xt, bt, dim=1, act=act, clamp=clamp)).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), to_nhwc(xt.grad.numpy()),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), bt.grad.numpy(), rtol=1e-3, atol=1e-3)


@pytest.mark.reference
@pytest.mark.parametrize("act", ["lrelu", "tanh", "swish", "softplus"])
def test_bias_act_second_order(act):
    """Grad-of-grad parity — the contract of bias_act.cu's G=2 rows, needed by
    the R1/path-length regularizers."""
    from torch_utils.ops.bias_act import _bias_act_ref

    rng = np.random.RandomState(4)
    x = rng.randn(3, 7).astype(np.float32)

    def inner_ours(xx):
        y = ops.bias_act(xx, None, act=act)
        g = jax.grad(lambda z: jnp.sum(y * jnp.sin(z)))  # unused path guard
        return jnp.sum(jax.grad(lambda z: jnp.sum(ops.bias_act(z, None, act=act) ** 2))(xx) ** 2)

    gg_ours = jax.grad(inner_ours)(jnp.asarray(x))

    xt = t(x).requires_grad_(True)
    y = _bias_act_ref(xt, None, act=act)
    (g,) = torch.autograd.grad((y ** 2).sum(), xt, create_graph=True)
    (gg,) = torch.autograd.grad((g ** 2).sum(), xt)
    np.testing.assert_allclose(np.asarray(gg_ours), gg.detach().numpy(),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# conv2d_resample
# ---------------------------------------------------------------------------

CONV_CASES = [
    dict(up=1, down=1, padding=1, k=3),
    dict(up=2, down=1, padding=1, k=3, flip_weight=False),   # synthesis conv0
    dict(up=1, down=2, padding=1, k=3),                      # discriminator conv1
    dict(up=1, down=2, padding=0, k=1),                      # resnet skip down
    dict(up=2, down=1, padding=0, k=1, flip_weight=False),   # skip-img upsample
    dict(up=1, down=1, padding=0, k=1),                      # ToRGB
    dict(up=1, down=1, padding=2, k=3, groups=2),
    dict(up=2, down=1, padding=1, k=3, groups=2, flip_weight=False),
]


@pytest.mark.reference
@pytest.mark.parametrize("case", CONV_CASES)
def test_conv2d_resample(case):
    from torch_utils.ops.conv2d_resample import conv2d_resample as ref_conv
    from torch_utils.ops.upfirdn2d import setup_filter as ref_setup

    rng = np.random.RandomState(5)
    groups = case.get("groups", 1)
    cin, cout, k = 6, 8, case["k"]
    x = rng.randn(2, 10, 12, cin).astype(np.float32)
    w_oihw = rng.randn(cout, cin // groups, k, k).astype(np.float32)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    flip_w = case.get("flip_weight", True)
    f = [1, 3, 3, 1]

    y = ops.conv2d_resample(jnp.asarray(x), jnp.asarray(w_hwio),
                            f=ops.setup_filter(f), up=case["up"], down=case["down"],
                            padding=case["padding"], groups=groups,
                            flip_weight=flip_w)
    y_ref = ref_conv(t(to_nchw(x)), t(w_oihw), f=ref_setup(f), up=case["up"],
                     down=case["down"], padding=case["padding"], groups=groups,
                     flip_weight=flip_w)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.numpy()),
                               rtol=1e-3, atol=1e-4)


UP_SUBPIXEL_CASES = [
    dict(k=3, up=2, cin=6, cout=8, h=10, w=12),     # synthesis conv0
    dict(k=3, up=2, cin=6, cout=8, h=7, w=9),       # odd spatial
    dict(k=1, up=2, cin=6, cout=8, h=10, w=12),     # degenerate (zero phases)
    dict(k=5, up=2, cin=4, cout=4, h=8, w=8),
    dict(k=4, up=3, cin=4, cout=4, h=6, w=6),
    dict(k=3, up=2, cin=6, cout=8, h=10, w=12, groups=2),
    dict(k=3, up=2, cin=6, cout=8, h=10, w=12, flip_weight=True),
]


@pytest.mark.slow
@pytest.mark.parametrize("case", UP_SUBPIXEL_CASES)
def test_up_conv_subpixel_matches_dilated(case):
    """The subpixel phase decomposition must be exactly the dilated
    transposed conv it replaces (ops/conv2d_resample.py:_up_conv_subpixel),
    including gradients (the synthesis path differentiates through it for
    R1/PL)."""
    from montage_gan_tpu.ops.conv2d_resample import _conv, _up_conv_subpixel

    rng = np.random.RandomState(11)
    k, up, groups = case["k"], case["up"], case.get("groups", 1)
    flip_w = case.get("flip_weight", False)
    x = jnp.asarray(rng.randn(2, case["h"], case["w"],
                              case["cin"]).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, case["cin"] // groups,
                              case["cout"]).astype(np.float32))

    def dilated(x, w):
        return _conv(x, w, groups=groups, flip_weight=flip_w,
                     lhs_dilation=(up, up),
                     padding=((k - 1, k - 1 + up - 1),
                              (k - 1, k - 1 + up - 1)))

    def subpixel(x, w):
        return _up_conv_subpixel(x, w, up, groups=groups, flip_weight=flip_w)

    y_ref, y = dilated(x, w), subpixel(x, w)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    gx_ref, gw_ref = jax.grad(
        lambda x, w: jnp.sum(dilated(x, w) * ct), argnums=(0, 1))(x, w)
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(subpixel(x, w) * ct), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_conv2d_resample_up_impl_dispatch(monkeypatch):
    """MGT_UP_IMPL=subpixel must route the up path through the phase
    decomposition and produce the same full conv2d_resample output."""
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 10, 12, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 8).astype(np.float32))
    f = ops.setup_filter([1, 3, 3, 1])

    monkeypatch.setenv("MGT_UP_IMPL", "dilated")
    y_ref = ops.conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=False)
    monkeypatch.setenv("MGT_UP_IMPL", "subpixel")
    y = ops.conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# modulated_conv2d
# ---------------------------------------------------------------------------

@pytest.mark.reference
@pytest.mark.parametrize("up,demod,noise", [(1, True, False), (2, True, True),
                                            (1, False, False), (2, False, False)])
def test_modulated_conv2d(up, demod, noise):
    from custom.networks_aio import modulated_conv2d as ref_modconv
    from torch_utils.ops.upfirdn2d import setup_filter as ref_setup

    rng = np.random.RandomState(6)
    n, cin, cout, k, h, w = 2, 6, 8, 3, 8, 8
    x = rng.randn(n, h, w, cin).astype(np.float32)
    weight_oihw = rng.randn(cout, cin, k, k).astype(np.float32)
    weight_hwio = np.transpose(weight_oihw, (2, 3, 1, 0))
    styles = rng.randn(n, cin).astype(np.float32)
    ho, wo = h * up, w * up
    nz = rng.randn(n, ho, wo, 1).astype(np.float32) if noise else None
    f = [1, 3, 3, 1]

    y = ops.modulated_conv2d(jnp.asarray(x), jnp.asarray(weight_hwio),
                             jnp.asarray(styles),
                             noise=jnp.asarray(nz) if noise else None,
                             up=up, padding=k // 2,
                             resample_filter=ops.setup_filter(f),
                             demodulate=demod, flip_weight=(up == 1))
    nz_ref = t(np.transpose(nz, (0, 3, 1, 2))) if noise else None
    y_ref = ref_modconv(t(to_nchw(x)), t(weight_oihw), t(styles), noise=nz_ref,
                        up=up, padding=k // 2, resample_filter=ref_setup(f),
                        demodulate=demod, flip_weight=(up == 1),
                        fused_modconv=False)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.detach().numpy()),
                               rtol=1e-3, atol=1e-4)

    # also against the reference's *fused* grouped-conv path
    y_ref_fused = ref_modconv(t(to_nchw(x)), t(weight_oihw), t(styles),
                              noise=nz_ref, up=up, padding=k // 2,
                              resample_filter=ref_setup(f), demodulate=demod,
                              flip_weight=(up == 1), fused_modconv=True)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref_fused.detach().numpy()),
                               rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# grid_sample / affine_grid
# ---------------------------------------------------------------------------

@pytest.mark.reference
def test_grid_sample_parity():
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    x = rng.rand(3, 10, 12, 4).astype(np.float32)
    theta = np.tile(np.eye(2, 3, dtype=np.float32), (3, 1, 1))
    theta[:, :, 2] = rng.uniform(-1.2, 1.2, size=(3, 2)).astype(np.float32)
    theta[:, 0, 1] = 0.1  # small shear to exercise the full matrix

    grid = ops.affine_grid(jnp.asarray(theta), 10, 12)
    y = ops.grid_sample(jnp.asarray(x), grid)

    xt = t(to_nchw(x))
    grid_ref = F.affine_grid(t(theta), xt.shape, align_corners=False)
    y_ref = F.grid_sample(xt, grid_ref, align_corners=False)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.numpy()),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grid),
                               grid_ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.reference
def test_translate_sample_matches_stn_workaround():
    """pad_value=-1 must reproduce the reference STNv2c '+1 shift' trick
    (fukuwarai/networks.py:252-255) for [-1,1]-ranged data."""
    import torch.nn.functional as F

    rng = np.random.RandomState(8)
    x = rng.uniform(-1, 1, size=(2, 16, 16, 4)).astype(np.float32)
    trans = rng.uniform(-0.5, 0.5, size=(2, 2)).astype(np.float32)

    y = ops.translate_sample(jnp.asarray(x), jnp.asarray(trans), pad_value=-1.0)

    theta = np.tile(np.eye(2, 3, dtype=np.float32), (2, 1, 1))
    theta[:, :, 2] += trans
    xt = t(to_nchw(x))
    grid_ref = F.affine_grid(t(theta), xt.shape, align_corners=False)
    y_ref = F.grid_sample(xt + 1, grid_ref, align_corners=False) - 1
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref.numpy()),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# alpha compositing
# ---------------------------------------------------------------------------

def _random_layers(rng, b=2, l=5, h=8, w=8):
    layers = rng.rand(b, l, h, w, 4).astype(np.float32)
    # make some alphas exactly 0 / 1 to exercise the safe-division paths
    layers[:, 0, ..., 3] = 0.0
    layers[:, 1, :4, :, 3] = 1.0
    return layers


def _torch_a_over_b_recurrence(layers_t):
    """Independent sequential straight-alpha recurrence oracle implementing
    the documented contract (reference custom_utils/image_utils.py:128-146):
    canvas starts at layer 0; each next layer composites OVER it; 0/0 → 0."""
    canvas = layers_t[:, 0]
    for i in range(1, layers_t.shape[1]):
        top = layers_t[:, i]
        ta, ca = top[..., 3:], canvas[..., 3:]
        ao = ta + ca * (1 - ta)
        co = torch.nan_to_num(
            (top[..., :3] * ta + canvas[..., :3] * ca * (1 - ta)) / ao)
        canvas = torch.cat([co, ao], dim=-1)
    return canvas


def test_alpha_composite_vs_torch_recurrence():
    rng = np.random.RandomState(9)
    layers = _random_layers(rng)
    y = ops.alpha_composite(jnp.asarray(layers))
    y_ref = _torch_a_over_b_recurrence(t(layers))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_alpha_composite_vs_pil():
    """Golden test against the Pillow oracle the reference uses for renderer
    targets (custom_utils/image_utils.py:74-96). PIL works on uint8, so we
    quantize the input and allow 1/255-level tolerance."""
    from PIL import Image

    rng = np.random.RandomState(10)
    layers = (np.round(_random_layers(rng) * 255) / 255).astype(np.float32)
    y = np.asarray(ops.alpha_composite(jnp.asarray(layers)))

    for b in range(layers.shape[0]):
        canvas = Image.fromarray((layers[b, 0] * 255).astype(np.uint8), "RGBA")
        for l in range(1, layers.shape[1]):
            canvas.alpha_composite(
                Image.fromarray((layers[b, l] * 255).astype(np.uint8), "RGBA"))
        pil = np.asarray(canvas).astype(np.float32) / 255.0
        # alpha channel is exact under quantization; color within rounding
        np.testing.assert_allclose(y[b, ..., 3], pil[..., 3], atol=2 / 255)
        mask = pil[..., 3:] > 0.02
        err = np.abs(y[b, ..., :3] - pil[..., :3]) * mask
        assert err.max() < 0.03, err.max()


def test_alpha_composite_gradients_finite():
    rng = np.random.RandomState(11)
    layers = _random_layers(rng)

    def loss(x):
        return jnp.sum(ops.alpha_composite(x) ** 2)

    g = jax.grad(loss)(jnp.asarray(layers))
    assert np.all(np.isfinite(np.asarray(g)))

    # second order too (R1 through the composite path)
    def loss2(x):
        return jnp.sum(jax.grad(loss)(x) ** 2)

    g2 = jax.grad(loss2)(jnp.asarray(layers))
    assert np.all(np.isfinite(np.asarray(g2)))


@pytest.mark.reference
def test_translate_and_composite_fused():
    """Fused op == torch chain (STN-style translate w/ +1 shift → composite)."""
    import torch.nn.functional as F

    rng = np.random.RandomState(12)
    layers01 = _random_layers(rng, b=2, l=3, h=12, w=12)
    layers = layers01 * 2 - 1  # [-1, 1]
    trans = rng.uniform(-0.4, 0.4, size=(2, 3, 2)).astype(np.float32)

    y = ops.translate_and_composite(jnp.asarray(layers), jnp.asarray(trans),
                                    pad_value=-1.0, input_range='minus11')

    b, l, h, w, c = layers.shape
    xt = t(np.ascontiguousarray(
        np.transpose(layers, (0, 1, 4, 2, 3)))).reshape(b * l, c, h, w)
    theta = np.tile(np.eye(2, 3, dtype=np.float32), (b * l, 1, 1))
    theta[:, :, 2] += trans.reshape(b * l, 2)
    grid_ref = F.affine_grid(t(theta), xt.shape, align_corners=False)
    moved = F.grid_sample(xt + 1, grid_ref, align_corners=False) - 1
    moved = moved.permute(0, 2, 3, 1).reshape(b, l, h, w, c)
    comp = _torch_a_over_b_recurrence((moved + 1) / 2) * 2 - 1
    np.testing.assert_allclose(np.asarray(y), comp.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# resolution algebra
# ---------------------------------------------------------------------------

@pytest.mark.reference
def test_calc_res_parity():
    import importlib
    import custom_utils.calc_res as ref_cr
    # the package re-exports a function named calc_res, shadowing the
    # submodule attribute — resolve the module explicitly
    cr = importlib.import_module("montage_gan_tpu.utils.calc_res")

    shapes = [(256, 256), (224, 160), (160, 96), (96, 64), (64, 32),
              (160, 64), (64, 160), (94, 151), (128, 128)]
    for s in shapes:
        assert cr.calc_res(s) == ref_cr.calc_res(s), s
        for cci in (2, 3):
            a = cr.calc_init_res(s, conv_config_index=cci)
            b = ref_cr.calc_init_res(s, conv_config_index=cci)
            assert a[0] == b[0] and a[1] == b[1] and a[2] == b[2], (s, cci)

    for cci in (2, 3):
        assert (cr.calc_res_combination(cci) == ref_cr.calc_res_combination(cci))
        assert (cr.find_min_res_combination((94, 151), conv_config_index=cci)
                == ref_cr.find_min_res_combination((94, 151), conv_config_index=cci))
