"""Data-parallel execution over a jax.sharding.Mesh.

The TPU-native replacement for the reference's distributed stack
(SURVEY.md §2.10): one process per GPU + DDP allreduce + rank-strided sampler
(reference: train_aio.py:570-577, custom/training_loop_aio.py:393-429,
torch_utils/misc.py:117-148) becomes a single program over a 1-D 'data' mesh:

  * parameters/optimizer state are replicated (NamedSharding P());
  * batches are sharded along axis 0 (P('data'));
  * gradient reduction is implicit — every jnp.mean over the sharded batch
    axis lowers to a psum over ICI, inserted and overlapped by XLA (replacing
    DDP's bucketed NCCL allreduce and the no_sync() gradient-accumulation
    gating, torch_utils/misc.py:178-185);
  * replication consistency is structural (one program), so the reference's
    check_ddp_consistency (torch_utils/misc.py:191-200) reduces to an
    assert_replicated debug helper.

Multi-host: call jax.distributed.initialize() before make_mesh(); each process
feeds its rank's stride of the InfiniteSampler stream (data/sampler.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def _spans_processes(mesh: Mesh) -> bool:
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate ``tree`` across the mesh.

    On a multi-process mesh a plain device_put cannot target other hosts'
    devices; instead every process contributes its own (identical) full
    copy via ``make_array_from_process_local_data``.  Caller contract on
    multi-host: the value must be process-identical — true for state built
    from a shared seed or restored from the same checkpoint (the same
    assumption the reference's DDP broadcast establishes,
    custom/training_loop_aio.py:393-400)."""
    s = replicated_sharding(mesh)
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = 'data') -> Any:
    s = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def assert_replicated(tree: Any, mesh: Mesh) -> None:
    """Debug analogue of the reference's check_ddp_consistency: verify every
    leaf is fully replicated across the mesh."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, 'sharding') and not leaf.sharding.is_fully_replicated:
            raise AssertionError(f'leaf {path} not replicated: {leaf.sharding}')


def make_parallel_train_step(trainer, mesh: Mesh, axis_name: str = 'data',
                             donate_state: bool = True,
                             with_labels: bool = False):
    """jit the trainer's step with replicated state and data-sharded batches.

    The returned function has signature
    ``(state, real_stack, real_crops, rng) → (state, stats)`` with
    ``real_stack``/``real_crops`` sharded along their leading (batch) axis.
    With ``with_labels=True`` (conditional training) the signature gains
    ``(…, real_c, gen_c)``, both batch-sharded ``[B, c_dim]``.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis_name)

    if with_labels:
        def step_fn(state, real_stack, real_crops, rng, real_c, gen_c):
            return trainer.train_step(state, real_stack, real_crops, rng,
                                      real_c=real_c, gen_c=gen_c)
        in_shardings = (repl, data, data, repl, data, data)
    else:
        step_fn = trainer.train_step
        in_shardings = (repl, data, data, repl)

    step = jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
    return step
