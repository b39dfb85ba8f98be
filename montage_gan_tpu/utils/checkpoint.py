"""Checkpoint save/restore.

Replaces the reference's two snapshot formats (SURVEY.md §5.4):
  * AIO ``network-snapshot-{kimg:06d}.pth`` dicts of state_dicts
    (reference: custom/training_loop_aio.py:808-835) → msgpack-serialized
    flax pytrees (``.msgpack``), one for the full train state (including
    optimizer moments, which the reference drops) and one EMA-only inference
    snapshot with the MontageConfig embedded as JSON.
  * SG2 persistence-pickles (reference: torch_utils/persistence.py) → the
    config-JSON + params-msgpack pair; no source code is embedded or executed
    on load (a deliberate security improvement over pickle).

Importing reference .pth/.pth.tar checkpoints is utils/torch_import.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax

from ..models.ensemble import MontageConfig, MontageEnsemble


def save_pytree(path: str, tree: Any) -> None:
    data = flax.serialization.to_bytes(
        jax.tree_util.tree_map(lambda x: jax.device_get(x), tree))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def restore_pytree(path: str, template: Any) -> Any:
    with open(path, 'rb') as f:
        return flax.serialization.from_bytes(template, f.read())


def save_train_state(run_dir: str, kimg: int, state: Any) -> str:
    path = os.path.join(run_dir, f'network-snapshot-{kimg:06d}.msgpack')
    save_pytree(path, state)
    return path


def restore_train_state(path: str, template_state: Any) -> Any:
    return restore_pytree(path, template_state)


# ---------------------------------------------------------------------------
# EMA inference snapshots (the generate/calc_metrics input format)
# ---------------------------------------------------------------------------

def save_ema_snapshot(path: str, cfg: MontageConfig, ema: Dict[str, Any],
                      renderer_vars: Optional[Any] = None) -> None:
    """Write <path>.msgpack + <path>.json — everything needed to sample."""
    tree = dict(ema)
    if renderer_vars is not None:
        tree['renderer'] = renderer_vars
    save_pytree(path + '.msgpack', tree)
    with open(path + '.json', 'w') as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_ema_snapshot(path: str) -> Tuple[MontageConfig, MontageEnsemble,
                                          Dict[str, Any]]:
    """Load a snapshot pair written by save_ema_snapshot."""
    base = path[:-len('.msgpack')] if path.endswith('.msgpack') else path
    with open(base + '.json') as f:
        raw = json.load(f)
    raw['layer_names'] = tuple(raw['layer_names'])
    raw['layer_targets'] = tuple(tuple(t) for t in raw['layer_targets'])
    cfg = MontageConfig(**raw)
    ens = MontageEnsemble(cfg)
    # build a template with the right structure, then overwrite
    template_vars = ens.init_variables(jax.random.PRNGKey(0), batch=1)
    template = {'mapping': template_vars['mapping'],
                'local_g': tuple(template_vars['local_g'])}
    if ens.stn is not None:
        template['stn'] = template_vars['stn']
    if ens.renderer is not None:
        template['renderer'] = template_vars['renderer']
    tree = restore_pytree(base + '.msgpack', template)
    return cfg, ens, tree
