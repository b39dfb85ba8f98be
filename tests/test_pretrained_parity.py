"""Parity against the reference's shipped pretrained renderer checkpoints —
the only numerical oracles the reference publishes (BASELINE.md).

Protocol (BASELINE.md "Measurement protocol" #1): run the real 9-layer fixture
(reference custom_utils/test_data/) through the imported renderer weights in
both frameworks and through our fused composite; require near-exact agreement
with torch and >40 dB composite PSNR vs the Pillow oracle.
"""

import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from montage_gan_tpu import models, ops
from montage_gan_tpu.utils import torch_import

TANH_CKPT = ("/root/reference/pretrained/diff_rendering/"
             "211120-1956-output-tanh/renderer032000.pth.tar")
SUBPIXEL_CKPT = ("/root/reference/pretrained/diff_rendering/"
                 "211210-1834-output-subpixel/renderer032000.pth.tar")
FIXTURE_DIR = "/root/reference/montage_gan/custom_utils/test_data/layers"

needs_ckpt = pytest.mark.skipif(not os.path.exists(TANH_CKPT),
                                reason="pretrained checkpoints not available")


def load_fixture_layers():
    """[L, H, W, 4] float32 in [0, 1], sorted by filename (the reference's
    loader contract, custom_utils/image_utils.py:49-64)."""
    from PIL import Image
    layers = []
    for fn in sorted(os.listdir(FIXTURE_DIR)):
        img = Image.open(os.path.join(FIXTURE_DIR, fn)).convert("RGBA")
        layers.append(np.asarray(img, dtype=np.float32) / 255.0)
    return np.stack(layers)


def psnr(a, b, data_range=1.0):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * math.log10(data_range ** 2 / mse)


@pytest.fixture(scope="module")
def fixture_batch():
    if not os.path.isdir(FIXTURE_DIR):
        pytest.skip("fixture data not available")
    layers = load_fixture_layers()
    return np.stack([layers, layers[:, :, ::-1]])  # [2, L, H, W, 4], + xflip


@needs_ckpt
@pytest.mark.reference
@pytest.mark.parametrize("ckpt,rtype", [(TANH_CKPT, "tanh"),
                                        (SUBPIXEL_CKPT, "subpixel")])
def test_renderer_checkpoint_parity(fixture_batch, ckpt, rtype):
    import torch
    import sys
    sys.path.insert(0, "/root/reference/montage_gan")
    from diff_rendering.networks import RendererTanh, RendererSubPixelConv

    x01 = fixture_batch
    x = x01 * 2 - 1  # [-1, 1] as in training (custom/loss_aio.py:248-251)

    variables = torch_import.load_reference_renderer(ckpt, rtype)
    ours = models.build_renderer(rtype, img_resolution=256, img_channels=4,
                                 img_layers=9)
    y = ours.apply(variables, jnp.asarray(x))

    ref_cls = RendererTanh if rtype == "tanh" else RendererSubPixelConv
    ref = ref_cls(img_resolution=256, img_channels=4, img_layers=9)
    data = torch.load(ckpt, map_location="cpu", weights_only=False)
    ref.load_state_dict(data["renderer"])
    ref.eval()
    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3))))
        y_ref = ref(xt).numpy().transpose(0, 2, 3, 1)

    # fp32: implementations are algebraically identical (proven to 3e-14 in
    # float64 below) but conv accumulation order differs between XLA and
    # torch; require agreement at >40 dB PSNR and small max error.
    q_impl = psnr(np.asarray(y), y_ref, data_range=2.0)
    assert q_impl > 40, f"impl PSNR {q_impl:.1f} dB"
    assert np.abs(np.asarray(y) - y_ref).max() < 0.05

    # quality sanity: imported renderer approximates true compositing
    target = np.asarray(ops.alpha_composite(jnp.asarray(x01)))
    q = psnr((np.asarray(y) + 1) / 2, target)
    assert q > 20, f"renderer PSNR vs composite suspiciously low: {q:.1f} dB"


@needs_ckpt
@pytest.mark.reference
def test_renderer_checkpoint_parity_float64():
    """Bit-level equivalence of the imported renderer in float64 (removes
    conv accumulation-order noise; any real logic/layout bug would show)."""
    import torch
    import sys
    sys.path.insert(0, "/root/reference/montage_gan")
    from diff_rendering.networks import RendererTanh
    import jax

    with jax.enable_x64():
        rng = np.random.RandomState(0)
        x = rng.uniform(-1, 1, (1, 9, 64, 64, 4)).astype(np.float64)
        variables = torch_import.load_reference_renderer(TANH_CKPT, "tanh")
        variables = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), variables)
        ours = models.RendererTanh(img_resolution=64, img_channels=4,
                                   img_layers=9)
        y = np.asarray(ours.apply(variables, jnp.asarray(x,
                                                         dtype=jnp.float64)))

    ref = RendererTanh(256, 4, 9)
    data = torch.load(TANH_CKPT, map_location="cpu", weights_only=False)
    ref.load_state_dict(data["renderer"])
    ref.double().eval()
    with torch.no_grad():
        xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))
        y_ref = ref(xt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, y_ref, atol=1e-10)


def test_composite_psnr_vs_pillow(fixture_batch):
    """North-star check (BASELINE.md): composite PSNR > 40 dB vs Pillow."""
    from PIL import Image

    x01 = fixture_batch
    y = np.asarray(ops.alpha_composite(jnp.asarray(x01)))

    for b in range(x01.shape[0]):
        canvas = Image.fromarray((x01[b, 0] * 255).astype(np.uint8), "RGBA")
        for l in range(1, x01.shape[1]):
            canvas.alpha_composite(
                Image.fromarray((x01[b, l] * 255).astype(np.uint8), "RGBA"))
        pil = np.asarray(canvas).astype(np.float32) / 255.0
        q = psnr(y[b], pil)
        assert q > 40, f"composite PSNR vs Pillow: {q:.2f} dB"


@needs_ckpt
@pytest.mark.reference
def test_compare_renderers_cli(tmp_path):
    """The renderer-eval harness (reference diff_rendering/compare.py:30-64)
    reports a high average PSNR for the shipped tanh checkpoint."""
    from click.testing import CliRunner
    from montage_gan_tpu.cli.compare_renderers import main as compare_cli

    layers = load_fixture_layers()
    sample_dir = tmp_path / "ds" / "sample0"
    sample_dir.mkdir(parents=True)
    from PIL import Image
    for i in range(layers.shape[0]):
        Image.fromarray((layers[i] * 255).astype(np.uint8), "RGBA").save(
            sample_dir / f"#{i}_layer.png")

    result = CliRunner().invoke(compare_cli, [
        "--data", str(tmp_path / "ds"), "--ckpt", TANH_CKPT,
        "--renderer-type", "tanh", "--batch", "1", "--seed", "0"])
    assert result.exit_code == 0, result.output
    avg = float(result.output.strip().split("avg PSNR")[1].split("dB")[0])
    assert avg > 30, result.output
