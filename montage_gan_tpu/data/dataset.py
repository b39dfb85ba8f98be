"""Datasets: multi-layer RGBA directories and flat image folders.

Capability parity with the reference's DatasetAIO / dataset_stat
(reference: custom/dataset_aio.py:88-254) and the SG2-ADA ImageFolderDataset
(reference: training/dataset.py:29-247), NHWC/numpy, torch-free.

Layout (DatasetAIO): one directory per sample containing L sorted layer PNGs;
``__getitem__`` returns ``[L, H, W, 4]`` float32 in [0, 1].  Per-layer
statistics (nonzero-alpha bounding boxes → target resolutions via the
resolution algebra) are computed once and cached as JSON next to the dataset
(the reference hard-codes its dataset's stats in source,
custom/dataset_aio.py:17-85 — here the cache is a first-class artifact).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.calc_res import (calc_init_res, calc_res, calc_res_combination,
                              find_min_res_combination)

STAT_CACHE_NAME = "montage_stats.json"


def _load_rgba(path: str) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGBA")
    return np.asarray(img, dtype=np.float32) / 255.0


def dataset_stat(src: str, conv_config_index: int = 2) -> Dict:
    """Per-layer bounding-box statistics → target resolutions
    (reference contract: custom/dataset_aio.py:88-140)."""
    combos = calc_res_combination(conv_config_index)
    boxes: Dict[str, List[Tuple[int, int, int, int]]] = {}
    img_shape = None
    dirs = sorted(os.listdir(src))
    for d in dirs:
        dpath = os.path.join(src, d)
        if not os.path.isdir(dpath):
            continue
        for f in sorted(os.listdir(dpath)):
            layer_name = os.path.splitext(f)[0]
            img = _load_rgba(os.path.join(dpath, f))
            if img_shape is None:
                img_shape = (img.shape[0], img.shape[1], img.shape[2])
            ys, xs = np.nonzero(img[..., 3])
            if len(ys) == 0:
                continue
            # (x, y, w, h) like cv2.boundingRect
            boxes.setdefault(layer_name, []).append(
                (int(xs.min()), int(ys.min()),
                 int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)))

    layer_stats = {}
    for name, bs in boxes.items():
        arr = np.asarray(bs, dtype=np.float64)
        max_w, max_h = arr[:, 2].max(), arr[:, 3].max()
        center = arr[:, :2] + arr[:, 2:] / 2
        avg_center = center.mean(axis=0)
        max_center_diff = np.abs(center - avg_center).max(axis=0)
        target = find_min_res_combination((max_w, max_h), combos,
                                          conv_config_index)
        layer_stats[name] = {
            "required_width": int(max_w), "required_height": int(max_h),
            "target_width": int(target[0]), "target_height": int(target[1]),
            "avg_center": avg_center.tolist(),
            "max_center_diff": max_center_diff.tolist(),
        }
    names = sorted(layer_stats.keys())
    n_samples = sum(os.path.isdir(os.path.join(src, d)) for d in dirs)
    return {
        "layer_names": names,
        "layer_stats": layer_stats,
        "shape": [n_samples, len(names), img_shape[0], img_shape[1], img_shape[2]],
        "conv_config_index": conv_config_index,
    }


class DatasetAIO:
    """Directory-of-directories multi-layer RGBA dataset
    (reference contract: custom/dataset_aio.py:143-254)."""

    def __init__(self, path: str, xflip: bool = False,
                 conv_config_index: int = 2,
                 stat: Optional[Dict] = None,
                 use_stat_cache: bool = True, **_ignored):
        self.path = path
        self.conv_config_index = conv_config_index
        self.name = os.path.basename(os.path.normpath(path)) or "dataset"

        cache_path = os.path.join(path, STAT_CACHE_NAME)
        if stat is not None:
            self._stat = stat
        elif use_stat_cache and os.path.exists(cache_path):
            with open(cache_path) as f:
                self._stat = json.load(f)
            if self._stat.get("conv_config_index") != conv_config_index:
                self._stat = dataset_stat(path, conv_config_index)
        else:
            self._stat = dataset_stat(path, conv_config_index)
            if use_stat_cache:
                try:
                    with open(cache_path, "w") as f:
                        json.dump(self._stat, f, indent=2)
                except OSError:
                    pass

        self.layer_names: List[str] = list(self._stat["layer_names"])
        self.layer_stats = self._stat["layer_stats"]
        self._raw_shape = list(self._stat["shape"])  # [N, L, H, W, C]
        self._dirs = sorted(d for d in os.listdir(path)
                            if os.path.isdir(os.path.join(path, d)))

        n = len(self._dirs)
        self.raw_idx = np.arange(n, dtype=np.int64)
        self.is_xflip = np.zeros(n, dtype=np.uint8)
        if xflip:
            self.raw_idx = np.tile(self.raw_idx, 2)
            self.is_xflip = np.concatenate([self.is_xflip,
                                            np.ones(n, dtype=np.uint8)])

    # -- geometry --------------------------------------------------------
    @property
    def num_layers(self) -> int:
        return self._raw_shape[1]

    @property
    def num_channels(self) -> int:
        return self._raw_shape[4]

    @property
    def resolution(self) -> int:
        return calc_res(self._raw_shape[2:4])

    @property
    def init_res(self) -> List[int]:
        return calc_init_res(self._raw_shape[2:4],
                             conv_config_index=self.conv_config_index)[0]

    def _layer_size(self, layer_name: str) -> List[int]:
        s = self.layer_stats[layer_name]
        return [s["target_height"], s["target_width"]]

    def target_res_layer(self, layer_name: str) -> List[int]:
        return self._layer_size(layer_name)

    def init_res_layer(self, layer_name: str) -> List[int]:
        return calc_init_res(self._layer_size(layer_name),
                             conv_config_index=self.conv_config_index)[0]

    def resolution_layer(self, layer_name: str) -> int:
        return calc_res(self._layer_size(layer_name))

    def res_log2_layer(self, layer_name: str) -> int:
        return calc_init_res(self._layer_size(layer_name),
                             conv_config_index=self.conv_config_index)[2]

    @property
    def layer_targets(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(tuple(self._layer_size(n)) for n in self.layer_names)

    def item_paths(self) -> List[List[str]]:
        """Per-raw-item sorted layer PNG paths (for the native loader)."""
        out = []
        for d in self._dirs:
            dp = os.path.join(self.path, d)
            out.append([os.path.join(dp, f) for f in sorted(os.listdir(dp))])
        return out

    @property
    def image_shape(self) -> Tuple[int, int]:
        return self._raw_shape[2], self._raw_shape[3]

    # -- access ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.raw_idx)

    def __getitem__(self, index: int) -> np.ndarray:
        """[L, H, W, 4] float32 in [0, 1]; xflip flips W."""
        d = os.path.join(self.path, self._dirs[self.raw_idx[index]])
        layers = [_load_rgba(os.path.join(d, f)) for f in sorted(os.listdir(d))]
        out = np.stack(layers)
        if self.is_xflip[index]:
            out = out[:, :, ::-1]
        return np.ascontiguousarray(out)


class ImageFolderDataset:
    """Flat image folder (or zip) dataset with optional labels, for the
    single-GAN train path (reference contract: training/dataset.py:29-247).
    Returns NHWC uint8."""

    def __init__(self, path: str, resolution: Optional[int] = None,
                 use_labels: bool = False, xflip: bool = False,
                 max_size: Optional[int] = None, random_seed: int = 0,
                 **_ignored):
        self.path = path
        self.name = os.path.splitext(os.path.basename(path))[0]
        self._zip = None
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(root, f)
                for root, _, files in os.walk(path) for f in files
                if f.lower().endswith((".png", ".jpg", ".jpeg")))
            self._in_zip = False
        elif path.lower().endswith(".zip"):
            import zipfile
            self._zip = zipfile.ZipFile(path)
            self._files = sorted(n for n in self._zip.namelist()
                                 if n.lower().endswith((".png", ".jpg", ".jpeg")))
            self._in_zip = True
        else:
            raise IOError(f"unsupported dataset path {path}")
        if not self._files:
            raise IOError(f"no images in {path}")

        self._labels = self._load_labels() if use_labels else None
        probe = self._load_image(0)
        self.resolution = resolution or probe.shape[0]
        self.image_shape = (probe.shape[0], probe.shape[1], probe.shape[2])
        self.num_channels = probe.shape[2]
        self.label_dim = (self._labels.shape[1]
                          if self._labels is not None else 0)

        n = len(self._files)
        self.raw_idx = np.arange(n, dtype=np.int64)
        if max_size is not None and n > max_size:
            rnd = np.random.RandomState(random_seed)
            self.raw_idx = np.sort(rnd.choice(n, size=max_size, replace=False))
        self.is_xflip = np.zeros(self.raw_idx.size, dtype=np.uint8)
        if xflip:
            self.raw_idx = np.tile(self.raw_idx, 2)
            self.is_xflip = np.concatenate([self.is_xflip,
                                            np.ones_like(self.is_xflip)])

    def _load_labels(self):
        import json as _json
        data = None
        if self._in_zip:
            if "dataset.json" in self._zip.namelist():
                data = _json.loads(self._zip.read("dataset.json"))
        else:
            p = os.path.join(self.path, "dataset.json")
            if os.path.exists(p):
                with open(p) as f:
                    data = _json.load(f)
        if data is None or data.get("labels") is None:
            return None
        lookup = {k: v for k, v in data["labels"]}
        labels = [lookup[os.path.relpath(f, self.path).replace("\\", "/")
                         if not self._in_zip else f] for f in self._files]
        labels = np.asarray(labels)
        if labels.ndim == 1:
            onehot = np.zeros((labels.size, labels.max() + 1), np.float32)
            onehot[np.arange(labels.size), labels] = 1
            return onehot
        return labels.astype(np.float32)

    def _load_image(self, i: int) -> np.ndarray:
        from PIL import Image
        import io
        if self._in_zip:
            img = Image.open(io.BytesIO(self._zip.read(self._files[i])))
        else:
            img = Image.open(self._files[i])
        return np.asarray(img.convert("RGB" if img.mode != "RGBA" else "RGBA"))

    @property
    def has_labels(self) -> bool:
        return self._labels is not None

    def get_label(self, index: int) -> np.ndarray:
        if self._labels is None:
            return np.zeros([0], np.float32)
        return self._labels[self.raw_idx[index]]

    def __len__(self) -> int:
        return len(self.raw_idx)

    def __getitem__(self, index: int):
        img = self._load_image(self.raw_idx[index])
        if self.is_xflip[index]:
            img = img[:, ::-1]
        return np.ascontiguousarray(img), self.get_label(index)
