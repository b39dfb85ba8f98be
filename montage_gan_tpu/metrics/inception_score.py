"""Inception Score (reference contract: metrics/inception_score.py:19-38).

Meaningful only with a real classifier head; with the random extractor a
softmax over features is used, yielding a *relative* diversity proxy.
"""

from __future__ import annotations

import numpy as np


def compute_is_from_probs(probs: np.ndarray, num_splits: int = 10):
    scores = []
    n = probs.shape[0]
    for i in range(num_splits):
        part = probs[i * n // num_splits:(i + 1) * n // num_splits]
        kl = part * (np.log(part + 1e-12)
                     - np.log(np.mean(part, axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def compute_is(opts, num_gen, num_splits: int = 10):
    from . import metric_utils
    stats_gen = metric_utils.compute_feature_stats_for_generator(
        opts.sample_fn, opts.z_dim, opts.extractor, num_items=num_gen,
        capture_all=True, batch_size=opts.batch_size, seed=opts.seed,
        mesh=opts.mesh)
    feats = stats_gen.get_all()
    e = np.exp(feats - feats.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    return compute_is_from_probs(probs, num_splits)
