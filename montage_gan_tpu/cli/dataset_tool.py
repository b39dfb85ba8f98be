"""Offline dataset converter.

CLI parity with the reference's dataset_tool.py (reference:
dataset_tool.py:57-334): sources = image folder / zip / CIFAR-10 / MNIST,
optional center-crop or wide-crop transform and resizing, output as a folder
or zip of PNGs with a dataset.json labels file.  Also adds a `layers` mode
that validates/normalizes a directory-of-directories multi-layer dataset into
the canonical DatasetAIO layout and precomputes its statistics cache.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Optional

import click
import numpy as np


def _iter_folder(src):
    files = sorted(os.path.join(r, f) for r, _, fs in os.walk(src) for f in fs
                   if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    labels = {}
    meta = os.path.join(src, 'dataset.json')
    if os.path.exists(meta):
        with open(meta) as f:
            labels = dict(json.load(f).get('labels') or [])
    from PIL import Image
    for fp in files:
        rel = os.path.relpath(fp, src).replace('\\', '/')
        yield np.asarray(Image.open(fp)), labels.get(rel)


def _iter_zip(src):
    from PIL import Image
    with zipfile.ZipFile(src) as z:
        labels = {}
        if 'dataset.json' in z.namelist():
            labels = dict(json.loads(z.read('dataset.json')).get('labels') or [])
        for name in sorted(z.namelist()):
            if name.lower().endswith(('.png', '.jpg', '.jpeg')):
                yield np.asarray(Image.open(io.BytesIO(z.read(name)))), \
                    labels.get(name)


def _iter_cifar10(src):
    import pickle
    for batch in range(1, 6):
        with open(os.path.join(src, f'data_batch_{batch}'), 'rb') as f:
            data = pickle.load(f, encoding='latin1')
        imgs = data['data'].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        for img, lab in zip(imgs, data['labels']):
            yield img, int(lab)


def _iter_mnist(src):
    import gzip
    import struct
    with gzip.open(os.path.join(src, 'train-images-idx3-ubyte.gz')) as f:
        _, n, h, w = struct.unpack('>IIII', f.read(16))
        imgs = np.frombuffer(f.read(), np.uint8).reshape(n, h, w, 1)
    with gzip.open(os.path.join(src, 'train-labels-idx1-ubyte.gz')) as f:
        struct.unpack('>II', f.read(8))
        labels = np.frombuffer(f.read(), np.uint8)
    for img, lab in zip(imgs, labels):
        yield img, int(lab)


def _iter_lmdb(src):
    """LSUN LMDB archive (reference: dataset_tool.py:118-144).  Uses the
    `lmdb` package when present; otherwise falls back to the pure-Python
    read-only walker (data/lmdb_reader.py) — no native dependency needed
    for ingestion."""
    import io
    from PIL import Image

    def records():
        try:
            import lmdb
        except ImportError:
            from ..data.lmdb_reader import LMDBReader
            with LMDBReader(src) as reader:
                yield from reader.items()
            return
        with lmdb.open(src, readonly=True,
                       lock=False).begin(write=False) as txn:
            yield from txn.cursor()

    for _key, value in records():
        try:
            img = Image.open(io.BytesIO(value))
            yield np.asarray(img.convert('RGB')), None
        except OSError:
            continue


def _transform(img: np.ndarray, transform: Optional[str],
               width: Optional[int], height: Optional[int]) -> np.ndarray:
    from PIL import Image
    if img.ndim == 2:
        img = img[:, :, None]
    if transform == 'center-crop':
        assert width and height
        s = min(img.shape[0], img.shape[1])
        y0 = (img.shape[0] - s) // 2
        x0 = (img.shape[1] - s) // 2
        img = img[y0:y0 + s, x0:x0 + s]
    elif transform == 'center-crop-wide':
        assert width and height
        ch = int(round(width * img.shape[0] / img.shape[1]))
        pil = Image.fromarray(img.squeeze())
        pil = pil.resize((width, ch), Image.LANCZOS)
        img = np.asarray(pil)
        if img.ndim == 2:
            img = img[:, :, None]
        y0 = (img.shape[0] - height) // 2
        img = img[max(y0, 0):max(y0, 0) + height]
    if width and height and (img.shape[0] != height or img.shape[1] != width):
        pil = Image.fromarray(img.squeeze())
        img = np.asarray(pil.resize((width, height), Image.LANCZOS))
        if img.ndim == 2:
            img = img[:, :, None]
    return img


@click.command()
@click.option('--source', required=True, metavar='PATH')
@click.option('--dest', required=True, metavar='PATH',
              help='Output directory or .zip')
@click.option('--source-type', type=click.Choice(['auto', 'folder', 'zip',
                                                  'cifar10', 'mnist', 'lmdb',
                                                  'layers']),
              default='auto')
@click.option('--transform', type=click.Choice(['center-crop',
                                                'center-crop-wide']),
              default=None)
@click.option('--width', type=int, default=None)
@click.option('--height', type=int, default=None)
@click.option('--max-images', type=int, default=None)
def main(source, dest, source_type, transform, width, height, max_images):
    """Convert a dataset into the canonical training layout."""
    from PIL import Image

    if source_type == 'auto':
        if os.path.isdir(source):
            entries = os.listdir(source)
            if entries and all(os.path.isdir(os.path.join(source, e))
                               for e in entries[:8]):
                source_type = 'layers'
            else:
                source_type = 'folder'
        elif source.endswith('.zip'):
            source_type = 'zip'
        else:
            raise click.UsageError(f'cannot infer source type of {source}')

    if source_type == 'layers':
        # Validate + stat-cache a multi-layer dataset (DatasetAIO layout).
        from ..data.dataset import DatasetAIO, dataset_stat
        import shutil
        if os.path.abspath(source) != os.path.abspath(dest):
            shutil.copytree(source, dest, dirs_exist_ok=True)
        ds = DatasetAIO(dest, use_stat_cache=True)
        print(f'layers dataset: {len(ds)} samples, {ds.num_layers} layers, '
              f'targets {ds.layer_targets}')
        return

    if source_type == 'lmdb':
        # reference dataset_tool.py:118 (LSUN archives); works without the
        # lmdb package via data/lmdb_reader.py
        iterator = _iter_lmdb(source)
    else:
        iterator = {'folder': _iter_folder, 'zip': _iter_zip,
                    'cifar10': _iter_cifar10,
                    'mnist': _iter_mnist}[source_type](source)

    to_zip = dest.endswith('.zip')
    zf = zipfile.ZipFile(dest, 'w') if to_zip else None
    if not to_zip:
        os.makedirs(dest, exist_ok=True)

    labels = []
    count = 0
    for img, label in iterator:
        if max_images is not None and count >= max_images:
            break
        img = _transform(img, transform, width, height)
        name = f'img{count:08d}.png'
        pil = Image.fromarray(img.squeeze())
        if to_zip:
            buf = io.BytesIO()
            pil.save(buf, format='png')
            zf.writestr(name, buf.getvalue())
        else:
            pil.save(os.path.join(dest, name))
        if label is not None:
            labels.append([name, label])
        count += 1

    meta = json.dumps({'labels': labels if labels else None})
    if to_zip:
        zf.writestr('dataset.json', meta)
        zf.close()
    else:
        with open(os.path.join(dest, 'dataset.json'), 'w') as f:
            f.write(meta)
    print(f'wrote {count} images to {dest}')


if __name__ == '__main__':
    main()
