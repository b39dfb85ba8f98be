"""Shared metric machinery: feature statistics, dataset/generator feature
loops, caching.

Contract parity with the reference's metric_utils
(reference: metrics/metric_utils.py): FeatureStats accumulates either raw
features or streaming mean/cov (:62-138); dataset features are cached keyed
by an options hash (:199-218); MontageGAN preprocessing composites the layer
stack and blends on white background → RGB uint8 range (:231-236); generator
features run the EMA ensemble z → ws → local Gs → pad → STN → clip (:265-280).

TPU-first: feature batches are device-computed; the cross-rank broadcast
interleave (:102-112) is unnecessary in the single-program model — each host
computes its stride and stats are combined with process_allgather when
multi-host.

Multi-chip: both feature loops accept ``mesh`` — batches are then laid out
batch-sharded over the mesh and XLA runs the generator/extractor data-parallel
on every device (the reference fans metric eval out with one DDP rank per GPU
and a broadcast interleave, metrics/metric_utils.py:102-112 and
calc_metrics.py:33-42; here a sharded device_put replaces the whole
rendezvous).  Feature gathering back to host is the all-gather.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.composite import alpha_composite
from ..utils.image_utils import alpha_composite_np, blend_white_bg


class FeatureStats:
    """Accumulate raw features and/or streaming mean/cov
    (reference contract: metrics/metric_utils.py:62-138)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is not None:
            assert num_features == self.num_features
            return
        self.num_features = num_features
        self.raw_mean = np.zeros([num_features], np.float64)
        self.raw_cov = np.zeros([num_features, num_features], np.float64)

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None:
            if self.num_items >= self.max_items:
                return
            x = x[:self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path: str):
        with open(path, 'wb') as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(path: str) -> 'FeatureStats':
        with open(path, 'rb') as f:
            state = pickle.load(f)
        obj = FeatureStats(capture_all=state['capture_all'],
                           capture_mean_cov=state['capture_mean_cov'],
                           max_items=state['max_items'])
        obj.__dict__.update(state)
        return obj


def layers_to_metric_rgb(layers01: np.ndarray) -> np.ndarray:
    """[B, L, H, W, 4] in [0,1] → [B, H, W, 3] in [0,255]
    (reference preprocessing: metric_utils.py:231-236 — composite layers,
    blend on white background, uint8 range)."""
    comp = alpha_composite_np(layers01)  # [B, H, W, 4]
    white = np.ones_like(comp)
    stack = np.stack([white, comp], axis=1)
    rgb = alpha_composite_np(stack)[..., :3]
    return np.clip(rgb, 0, 1) * 255.0


def images_to_metric_rgb(imgs01: np.ndarray) -> np.ndarray:
    """[B, H, W, C] in [0,1] → [B, H, W, 3] in [0,255].  RGBA is blended on
    white (same rule as the layered path); RGB/grayscale pass through."""
    if imgs01.shape[-1] == 4:
        white = np.ones_like(imgs01)
        imgs01 = alpha_composite_np(np.stack([white, imgs01], axis=1))
    rgb = imgs01[..., :3]
    if rgb.shape[-1] == 1:
        rgb = np.repeat(rgb, 3, axis=-1)
    return np.clip(rgb, 0, 1) * 255.0


def _item_to_rgb(item) -> np.ndarray:
    """One dataset item (layered [L,H,W,4] float01, flat [H,W,C] uint8, or a
    (img, label) tuple) → [H, W, 3] in [0,255]."""
    if isinstance(item, tuple):
        item = item[0]
    item = np.asarray(item)
    if item.ndim == 4:  # layered
        return layers_to_metric_rgb(item[None])[0]
    if item.dtype == np.uint8:
        item = item.astype(np.float32) / 255.0
    return images_to_metric_rgb(item[None].astype(np.float32))[0]


def _run_sharded(fn: Callable, x_np: np.ndarray, mesh) -> np.ndarray:
    """Run ``fn`` on one batch, batch-sharded over ``mesh`` (or on the
    default device when ``mesh`` is None).  Ragged tails are padded up to
    the device count with repeats of the last row and the padded rows are
    dropped from the result — feature statistics see exactly the true
    batch."""
    if mesh is None:
        return np.asarray(fn(jnp.asarray(x_np)))
    from ..parallel.mesh import batch_sharding
    n_dev = mesh.devices.size
    pad = (-len(x_np)) % n_dev
    if pad:
        x_np = np.concatenate([x_np, np.repeat(x_np[-1:], pad, axis=0)])
    x = jax.device_put(np.asarray(x_np), batch_sharding(mesh))
    out = np.asarray(fn(x))
    return out[:len(out) - pad] if pad else out


def compute_feature_stats_for_dataset(dataset,
                                      extractor,
                                      batch_size: int = 16,
                                      max_items: Optional[int] = None,
                                      cache_dir: Optional[str] = None,
                                      mesh=None,
                                      **stats_kwargs) -> FeatureStats:
    """(reference contract: metric_utils.py:192-246)"""
    cache_file = None
    if cache_dir is not None:
        key = json.dumps(dict(dataset=getattr(dataset, 'path', str(dataset)),
                              n=len(dataset), extractor=extractor.name,
                              max_items=max_items,
                              stats=sorted(stats_kwargs)), sort_keys=True)
        tag = hashlib.md5(key.encode()).hexdigest()
        cache_file = os.path.join(cache_dir, f'dataset-features-{tag}.pkl')
        if os.path.exists(cache_file):
            return FeatureStats.load(cache_file)

    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    stats = FeatureStats(max_items=n, **stats_kwargs)
    i = 0
    while not stats.is_full() and i < n:
        rgb = np.stack([_item_to_rgb(dataset[j])
                        for j in range(i, min(i + batch_size, n))])
        stats.append(_run_sharded(extractor, rgb, mesh))
        i += batch_size

    if cache_file is not None:
        os.makedirs(cache_dir, exist_ok=True)
        stats.save(cache_file)
    return stats


def compute_feature_stats_for_generator(sample_fn: Callable[[jax.Array], jax.Array],
                                        z_dim: int,
                                        extractor,
                                        num_items: int,
                                        batch_size: int = 16,
                                        seed: int = 0,
                                        mesh=None,
                                        **stats_kwargs) -> FeatureStats:
    """``sample_fn(z) → [B, H, W, 4] RGBA in [0, 1]`` (the composited EMA
    ensemble output; reference contract: metric_utils.py:251-310)."""
    stats = FeatureStats(max_items=num_items, **stats_kwargs)
    key = jax.random.PRNGKey(seed)
    i = 0
    while not stats.is_full():
        key, sub = jax.random.split(key)
        z = np.asarray(jax.random.normal(sub, (batch_size, z_dim)))
        imgs = _run_sharded(sample_fn, z, mesh)  # [B, H, W, 4|3] in [0, 1]
        rgb = images_to_metric_rgb(imgs)
        stats.append(_run_sharded(extractor, rgb, mesh))
        i += batch_size
    return stats
