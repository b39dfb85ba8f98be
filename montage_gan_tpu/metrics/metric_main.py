"""Metric registry and dispatcher.

Contract parity with the reference's metric_main
(reference: metrics/metric_main.py:24-176): a ``@register_metric`` registry,
``calc_metric(metric, …) → result dict``, and JSONL reporting
(metric-{name}.jsonl).  The reference's cross-rank result broadcast
(:53-58) is unnecessary in the single-program model.

MetricOptions carries: dataset (DatasetAIO), sample_fn (z → composited RGBA
[0,1]), z_dim, extractor, cache_dir, batch_size, seed.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional

from ..utils.config import EasyDict
from .features import build_extractor

_metric_dict: Dict[str, Callable] = {}


def register_metric(fn: Callable) -> Callable:
    assert fn.__name__ not in _metric_dict
    _metric_dict[fn.__name__] = fn
    return fn


def is_valid_metric(metric: str) -> bool:
    return metric in _metric_dict


def list_valid_metrics():
    return list(_metric_dict)


class MetricOptions(EasyDict):
    def __init__(self, dataset=None, sample_fn=None, z_dim=512,
                 extractor=None, cache_dir=None, batch_size=16, seed=0,
                 progress_fn=None, map_fn=None, synth_fn=None,
                 ppl_samples=None, mesh=None):
        super().__init__()
        self.dataset = dataset
        self.sample_fn = sample_fn
        self.z_dim = z_dim
        self.extractor = extractor or build_extractor('auto')
        self.cache_dir = cache_dir
        self.batch_size = batch_size
        self.seed = seed
        self.progress_fn = progress_fn
        # Optional jax.sharding.Mesh: feature/sample batches are laid out
        # batch-sharded over it (data-parallel metric eval — the reference's
        # --gpus fan-out, calc_metrics.py:33-42)
        self.mesh = mesh
        # The mapping/synthesis split of the generator (``map_fn(z) → ws``,
        # ``synth_fn(ws) → img [0,1]``) — required by the w-space PPL
        # variants (reference perceptual_path_length.py:57-60).
        self.map_fn = map_fn
        self.synth_fn = synth_fn
        # PPL sample budget; None → the reference's 50k
        # (metric_main.py:90,125-176).  Set small for on-device tracking.
        self.ppl_samples = ppl_samples

    @property
    def lpips_extractor(self):
        """Perceptual-distance extractor for PPL: VGG16-LPIPS when weights
        are available (the reference's detector, perceptual_path_length.py:
        44-47), else the shared extractor."""
        if '_lpips_extractor' not in self:
            from .features import RandomFeatures, build_extractor
            ex = build_extractor('auto_lpips')
            if isinstance(ex, RandomFeatures):
                ex = self.extractor  # fall back to the shared extractor
            self['_lpips_extractor'] = ex
        return self['_lpips_extractor']


def calc_metric(metric: str, **kwargs) -> EasyDict:
    assert is_valid_metric(metric), metric
    opts = MetricOptions(**kwargs)
    start = time.time()
    results = _metric_dict[metric](opts)
    return EasyDict(results=EasyDict(results), metric=metric,
                    total_time=time.time() - start,
                    num_gpus=(opts.mesh.devices.size
                              if opts.mesh is not None else 1))


def report_metric(result_dict: EasyDict, run_dir: Optional[str] = None,
                  snapshot_pkl: Optional[str] = None) -> None:
    metric = result_dict.metric
    record = dict(result_dict, snapshot_pkl=snapshot_pkl,
                  timestamp=time.time())
    print(json.dumps(record, default=str))
    if run_dir is not None:
        with open(os.path.join(run_dir, f'metric-{metric}.jsonl'), 'at') as f:
            f.write(json.dumps(record, default=str) + '\n')


# ---------------------------------------------------------------------------
# Registered metrics (names/cfgs mirror reference metric_main.py:88-176)
# ---------------------------------------------------------------------------

@register_metric
def fid50k_full(opts):
    from .frechet_inception_distance import compute_fid
    fid = compute_fid(opts, max_real=None, num_gen=50000)
    return {'fid50k_full': fid}


@register_metric
def fid50k(opts):
    from .frechet_inception_distance import compute_fid
    fid = compute_fid(opts, max_real=50000, num_gen=50000)
    return {'fid50k': fid}


@register_metric
def fid2k(opts):
    """Small-budget variant for in-training tracking on TPU."""
    from .frechet_inception_distance import compute_fid
    fid = compute_fid(opts, max_real=None, num_gen=2000)
    return {'fid2k': fid}


@register_metric
def kid50k_full(opts):
    from .kernel_inception_distance import compute_kid
    kid = compute_kid(opts, max_real=1000000, num_gen=50000)
    return {'kid50k_full': kid}


@register_metric
def is50k(opts):
    from .inception_score import compute_is
    mean, std = compute_is(opts, num_gen=50000)
    return {'is50k_mean': mean, 'is50k_std': std}


@register_metric
def ppl2_wend(opts):
    """PPL, w-space, endpoint sampling, 50k samples
    (reference: metric_main.py:95); override the budget with
    opts.ppl_samples.  Requires opts.map_fn/synth_fn (the ensemble's
    mapping/synthesis split)."""
    return _ppl_variant(opts, 'ppl2_wend', 'w', 'end', crop=False)


@register_metric
def pr50k3_full(opts):
    from .precision_recall import compute_pr
    precision, recall = compute_pr(opts, max_real=None, num_gen=50000,
                                   nhood_size=3)
    return {'pr50k3_full_precision': precision,
            'pr50k3_full_recall': recall}


# ---------------------------------------------------------------------------
# Legacy metrics (reference: metric_main.py:125-176) — capped real sets and
# cropped PPL variants, kept for result compatibility with old SG2 runs.
# ---------------------------------------------------------------------------

@register_metric
def kid50k(opts):
    from .kernel_inception_distance import compute_kid
    kid = compute_kid(opts, max_real=50000, num_gen=50000)
    return {'kid50k': kid}


@register_metric
def pr50k3(opts):
    from .precision_recall import compute_pr
    precision, recall = compute_pr(opts, max_real=50000, num_gen=50000,
                                   nhood_size=3)
    return {'pr50k3_precision': precision, 'pr50k3_recall': recall}


def _ppl_variant(opts, name, space, sampling, crop):
    from .perceptual_path_length import compute_ppl
    map_fn, synth_fn = opts.get('map_fn'), opts.get('synth_fn')
    pair_fn = opts.get('sample_pair_fn')
    if map_fn is None and pair_fn is None:
        if space == 'w':
            # Never silently degrade a w-space metric to z-space — the
            # result would be mislabeled (reference interpolates in W via
            # the mapping net, perceptual_path_length.py:57-60).
            raise ValueError(
                f"{name} requires the mapping/synthesis split "
                "(opts.map_fn + opts.synth_fn)")

        def pair_fn(z0, z1):
            return opts.sample_fn(z0), opts.sample_fn(z1)
    ppl = compute_ppl(pair_fn, opts.z_dim, opts.lpips_extractor,
                      num_samples=opts.get('ppl_samples') or 50000,
                      epsilon=1e-4, space=space,
                      sampling=sampling, crop=crop,
                      batch_size=opts.batch_size, seed=opts.seed,
                      map_fn=map_fn, synth_fn=synth_fn, mesh=opts.mesh)
    return {name: ppl}


@register_metric
def ppl_zfull(opts):
    return _ppl_variant(opts, 'ppl_zfull', 'z', 'full', crop=True)


@register_metric
def ppl_wfull(opts):
    return _ppl_variant(opts, 'ppl_wfull', 'w', 'full', crop=True)


@register_metric
def ppl_zend(opts):
    return _ppl_variant(opts, 'ppl_zend', 'z', 'end', crop=True)


@register_metric
def ppl_wend(opts):
    return _ppl_variant(opts, 'ppl_wend', 'w', 'end', crop=True)
