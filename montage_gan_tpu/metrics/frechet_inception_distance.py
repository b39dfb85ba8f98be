"""Fréchet distance between feature distributions
(reference contract: metrics/frechet_inception_distance.py:21-40)."""

from __future__ import annotations

import numpy as np
import scipy.linalg


def compute_fid_from_stats(mu_real, sigma_real, mu_gen, sigma_gen) -> float:
    m = np.square(mu_gen - mu_real).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real), disp=False)
    fid = np.real(m + np.trace(sigma_gen + sigma_real - s * 2))
    return float(fid)


def compute_fid(opts, max_real, num_gen) -> float:
    from . import metric_utils
    stats_real = metric_utils.compute_feature_stats_for_dataset(
        opts.dataset, opts.extractor, max_items=max_real,
        cache_dir=opts.cache_dir, capture_mean_cov=True,
        batch_size=opts.batch_size, mesh=opts.mesh)
    stats_gen = metric_utils.compute_feature_stats_for_generator(
        opts.sample_fn, opts.z_dim, opts.extractor, num_items=num_gen,
        capture_mean_cov=True, batch_size=opts.batch_size, seed=opts.seed,
        mesh=opts.mesh)
    mu_r, sig_r = stats_real.get_mean_cov()
    mu_g, sig_g = stats_gen.get_mean_cov()
    return compute_fid_from_stats(mu_r, sig_r, mu_g, sig_g)
