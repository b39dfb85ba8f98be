"""Improved precision & recall via kNN manifold estimation
(reference contract: metrics/precision_recall.py:20-65)."""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(a: np.ndarray, b: np.ndarray,
                       batch: int = 4096) -> np.ndarray:
    out = np.empty((a.shape[0], b.shape[0]), np.float32)
    b_sq = np.sum(b ** 2, axis=1)
    for i in range(0, a.shape[0], batch):
        aa = a[i:i + batch]
        out[i:i + batch] = (np.sum(aa ** 2, axis=1)[:, None]
                            - 2 * aa @ b.T + b_sq[None])
    return out


def _manifold_radii(feats: np.ndarray, nhood_size: int) -> np.ndarray:
    d = _pairwise_sq_dists(feats, feats)
    # kth smallest distance excluding self (self dist = 0 is the 0th)
    return np.partition(d, nhood_size, axis=1)[:, nhood_size]


def _fraction_in_manifold(probes: np.ndarray, manifold: np.ndarray,
                          radii: np.ndarray) -> float:
    d = _pairwise_sq_dists(probes, manifold)
    return float(np.mean(np.any(d <= radii[None, :], axis=1)))


def compute_pr_from_features(real: np.ndarray, gen: np.ndarray,
                             nhood_size: int = 3):
    precision = _fraction_in_manifold(gen, real, _manifold_radii(real, nhood_size))
    recall = _fraction_in_manifold(real, gen, _manifold_radii(gen, nhood_size))
    return precision, recall


def compute_pr(opts, max_real, num_gen, nhood_size: int = 3):
    from . import metric_utils
    stats_real = metric_utils.compute_feature_stats_for_dataset(
        opts.dataset, opts.extractor, max_items=max_real,
        cache_dir=opts.cache_dir, capture_all=True,
        batch_size=opts.batch_size, mesh=opts.mesh)
    stats_gen = metric_utils.compute_feature_stats_for_generator(
        opts.sample_fn, opts.z_dim, opts.extractor, num_items=num_gen,
        capture_all=True, batch_size=opts.batch_size, seed=opts.seed,
        mesh=opts.mesh)
    return compute_pr_from_features(stats_real.get_all(),
                                    stats_gen.get_all(),
                                    nhood_size=nhood_size)
