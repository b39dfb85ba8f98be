"""Kernel Inception Distance — polynomial-kernel MMD over feature subsets
(reference contract: metrics/kernel_inception_distance.py:19-45)."""

from __future__ import annotations

import numpy as np


def compute_kid_from_features(real: np.ndarray, gen: np.ndarray,
                              num_subsets: int = 100,
                              max_subset_size: int = 1000,
                              seed: int = 0) -> float:
    n = real.shape[1]
    m = min(min(real.shape[0], gen.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = gen[rng.choice(gen.shape[0], m, replace=False)]
        y = real[rng.choice(real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)


def compute_kid(opts, max_real, num_gen) -> float:
    from . import metric_utils
    stats_real = metric_utils.compute_feature_stats_for_dataset(
        opts.dataset, opts.extractor, max_items=max_real,
        cache_dir=opts.cache_dir, capture_all=True,
        batch_size=opts.batch_size, mesh=opts.mesh)
    stats_gen = metric_utils.compute_feature_stats_for_generator(
        opts.sample_fn, opts.z_dim, opts.extractor, num_items=num_gen,
        capture_all=True, batch_size=opts.batch_size, seed=opts.seed,
        mesh=opts.mesh)
    return compute_kid_from_features(stats_real.get_all(),
                                     stats_gen.get_all())
