"""Native C++ batch-loader tests: bit-parity vs the Python/PIL path,
xflip, FIFO prefetch ordering, and error propagation.

(the native pipeline replaces the reference's DataLoader worker processes,
reference: custom/training_loop_aio.py:240-244)
"""

import os

import numpy as np
import pytest

from montage_gan_tpu.data.native_loader import NativeBatchLoader, _get_lib


@pytest.fixture(scope='module')
def png_items(tmp_path_factory):
    from PIL import Image
    tmp = tmp_path_factory.mktemp('pngs')
    rng = np.random.RandomState(0)
    items = []
    for i in range(5):
        paths = []
        for j in range(3):  # 3 "layers" per item
            arr = rng.randint(0, 256, (16, 12, 4), dtype=np.uint8)
            p = str(tmp / f'item{i}_layer{j}.png')
            Image.fromarray(arr, 'RGBA').save(p)
            paths.append(p)
        items.append(paths)
    return items


def test_native_builds():
    assert _get_lib() is not None, 'native loader failed to build'


def test_native_matches_python(png_items):
    nat = NativeBatchLoader(png_items, 16, 12, 4)
    py = NativeBatchLoader(png_items, 16, 12, 4, force_python=True)
    assert nat.is_native and not py.is_native
    idx = [0, 3, 1]
    flips = [False, True, False]
    a = nat.next_batch(idx, flips)
    b = py.next_batch(idx, flips)
    assert a.shape == (3, 3, 16, 12, 4)
    np.testing.assert_array_equal(a, b)
    nat.close()


def test_fifo_prefetch_order(png_items):
    nat = NativeBatchLoader(png_items, 16, 12, 4, num_threads=3)
    if not nat.is_native:
        pytest.skip('native unavailable')
    nat.submit([0, 1])
    nat.submit([2, 3])
    nat.submit([4, 4])
    py = NativeBatchLoader(png_items, 16, 12, 4, force_python=True)
    for idx in ([0, 1], [2, 3], [4, 4]):
        got = nat.collect(2)
        np.testing.assert_array_equal(got, py.next_batch(idx))
    nat.close()


def test_error_propagation(png_items, tmp_path):
    bad = [[str(tmp_path / 'missing.png')] * 3]
    nat = NativeBatchLoader(bad, 16, 12, 4)
    if not nat.is_native:
        pytest.skip('native unavailable')
    nat.submit([0])
    with pytest.raises(RuntimeError, match='missing.png'):
        nat.collect(1)
    nat.close()

    nat2 = NativeBatchLoader(png_items, 16, 12, 4)
    with pytest.raises(RuntimeError, match='index out of range'):
        nat2.submit([99])
    nat2.close()


def test_batch_prefetcher_native_parity(tmp_path):
    from montage_gan_tpu.data.dataset import DatasetAIO
    from montage_gan_tpu.data.synthetic import make_synthetic_layer_dataset
    from montage_gan_tpu.training.loop_aio import BatchPrefetcher

    path = make_synthetic_layer_dataset(str(tmp_path / 'ds'), num_samples=6,
                                        size=32)
    ds = DatasetAIO(path, xflip=True)
    pf_nat = BatchPrefetcher(ds, 4, ds.layer_targets, seed=5,
                             use_native=True)
    pf_py = BatchPrefetcher(ds, 4, ds.layer_targets, seed=5,
                            use_native=False)
    assert pf_nat.native is not None, 'native path did not engage'
    for _ in range(3):
        s_a, c_a = pf_nat.next()
        s_b, c_b = pf_py.next()
        np.testing.assert_array_equal(s_a, s_b)
        for x, y in zip(c_a, c_b):
            np.testing.assert_array_equal(x, y)
    pf_nat.stop()
    pf_py.stop()


def test_size_mismatch_rejected(png_items):
    nat = NativeBatchLoader(png_items, 32, 32, 4)
    if not nat.is_native:
        pytest.skip('native unavailable')
    nat.submit([0])
    with pytest.raises(RuntimeError, match='size mismatch'):
        nat.collect(1)
    nat.close()
