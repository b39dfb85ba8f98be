"""Multi-host (multi-process) runtime: initialization, process-role
helpers, and host-local batch sharding.

The reference scales with one Python process per GPU on a single node
(torch DDP spawn, reference: train_aio.py:570-577).  The TPU-native
scaling unit is a pod slice: one process per host, each seeing its local
chips, coordinated through ``jax.distributed``.  Everything compute-side is
already multi-host-ready — the train step is one jitted program over a
global mesh and XLA inserts the cross-host collectives; what this module
adds is the runtime glue:

  * :func:`maybe_initialize` — bring up the JAX distributed service when a
    coordinator is configured (explicitly or via environment); a harmless
    no-op for single-process runs.
  * :func:`shard_host_batch` — build a globally-sharded batch from each
    process's host-local slice (``jax.make_array_from_process_local_data``)
    — the multi-host replacement for a plain ``device_put`` of the full
    batch.
  * :func:`is_primary` — filesystem/logging gate (checkpoints, image
    sheets, stats.jsonl are written once, by process 0 — the analogue of
    the reference's ``rank == 0`` guards, custom/training_loop_aio.py
    :521,:700).

Data sharding across hosts needs no coordination: each process draws its
own rank's stride of the deterministic InfiniteSampler stream
(data/sampler.py, reference torch_utils/misc.py:117-148).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

_ENV_COORD = 'JAX_COORDINATOR_ADDRESS'


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` when multi-process coordination is
    configured; return ``(process_index, process_count)``.

    Resolution order: explicit args → ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars → no-op (single
    process).  Must run before the first device query.  Idempotent: a
    second call (or an already-initialized runtime) just returns the
    current process info.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get('JAX_NUM_PROCESSES'):
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and os.environ.get('JAX_PROCESS_ID'):
        process_id = int(os.environ['JAX_PROCESS_ID'])

    if coordinator_address:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            # already initialized (idempotence) — anything else re-raises
            if 'already' not in str(e).lower():
                raise
    return process_info()


def process_info() -> Tuple[int, int]:
    import jax
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the one process that owns filesystem outputs (the
    reference's ``rank == 0`` gate)."""
    import jax
    return jax.process_index() == 0


def shard_host_batch(mesh, tree: Any, axis_name: str = 'data') -> Any:
    """Each process's host-local batch slice → one globally batch-sharded
    array tree on ``mesh``.

    With P processes and global batch B, every process passes its own
    [B/P, ...] slice (its rank's stride of the sampler stream) and gets
    back global [B, ...] arrays sharded along the batch axis.  For a
    single process this equals ``mesh_lib.shard_batch`` exactly
    (pinned by tests/test_distributed.py).
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        tree)
