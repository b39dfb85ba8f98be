"""Worker for the 2-process distributed integration test
(tests/test_distributed.py): one REAL jax.distributed process of a
multi-host run, 2 virtual CPU devices per process, executing a full AIO
train step over the 4-device GLOBAL mesh through the production helpers
(replicate / make_parallel_train_step / shard_host_batch with host-LOCAL
batch slices).

Usage: python dist_worker.py <pid> <nproc> <port> <outfile.npz>
Process 0 writes step outputs (stat scalars + concatenated variable
leaves) to <outfile.npz> for the parent test to compare against a
single-process run on the same global batch.
"""

import os
import sys

import re as _re

# force EXACTLY 2 local devices, replacing any inherited count (the parent
# pytest process carries --xla_force_host_platform_device_count=8)
_flags = _re.sub(r'--xla_force_host_platform_device_count=\d+', '',
                 os.environ.get('XLA_FLAGS', ''))
os.environ['XLA_FLAGS'] = (
    _flags + ' --xla_force_host_platform_device_count=2').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outfile = sys.argv[4]
    jax.distributed.initialize(f'localhost:{port}', num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp  # noqa: F401

    from montage_gan_tpu.parallel.distributed import shard_host_batch
    from montage_gan_tpu.parallel.mesh import (make_mesh,
                                               make_parallel_train_step,
                                               replicate)
    # the same tiny config/batch constants as tests/test_parallel.py
    from tests.test_parallel import BATCH, batch_for, tiny

    ens, trainer = tiny()
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))

    mesh = make_mesh()  # GLOBAL: nproc × 2 devices
    assert mesh.devices.size == 2 * nproc

    # this process's host-local slice of the global batch (global device
    # order is process-major, so rows are contiguous per process)
    sl = slice(pid * BATCH // nproc, (pid + 1) * BATCH // nproc)
    stack_s = shard_host_batch(mesh, np.asarray(stack)[sl])
    crops_s = shard_host_batch(mesh, tuple(np.asarray(c)[sl]
                                           for c in crops))

    pstep = make_parallel_train_step(trainer, mesh, donate_state=False)
    state_r = replicate(mesh, state0)
    rng_r = replicate(mesh, jax.random.PRNGKey(2))

    # AOT-compile BEFORE touching any collective, then align both processes
    # at a coordination-service barrier (pure gRPC, no Gloo).  The first
    # executed psum creates the Gloo context, whose peer-connect KV lookup
    # has a hard 30 s deadline — on a loaded 1-CPU box the two workers'
    # compile times can skew by minutes, and the early worker would time
    # out waiting for the late one (observed: "GetKeyValue() timed out
    # with key: cpu:gloo/...").  Compiling first bounds the skew at the
    # barrier exit to microseconds.
    compiled = pstep.lower(state_r, stack_s, crops_s, rng_r).compile()
    from jax._src import distributed as _jdist  # test-only barrier access
    _jdist.global_state.client.wait_at_barrier('dist_worker_compiled',
                                               timeout_in_ms=1_200_000)
    s2, stats = compiled(state_r, stack_s, crops_s, rng_r)

    def local(x):  # replicated global array → this process's copy
        return np.asarray(x.addressable_data(0))

    if pid == 0:
        leaves = jax.tree_util.tree_leaves(s2.variables)
        np.savez(outfile,
                 leaves=np.concatenate([local(l).ravel() for l in leaves]),
                 pl_mean=local(s2.pl_mean),
                 **{f'stat_{k}': local(v) for k, v in stats.items()})
    print(f'worker {pid}: OK', flush=True)


if __name__ == '__main__':
    main()
