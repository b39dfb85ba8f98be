"""Multi-host runtime tests (parallel/distributed.py).

The crown piece is a REAL 2-process ``jax.distributed`` run (Gloo CPU
collectives): two coordinated processes, 2 virtual devices each, execute a
full AIO train step over the 4-device global mesh with host-local batch
slices — and must produce exactly what a single process computes on the
same global batch over 4 local devices.  This is the strongest available
stand-in for a pod-slice run in a single-machine environment (the
reference's analogue is its DDP spawn test story, train_aio.py:570-577).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from montage_gan_tpu.parallel import distributed as dist
from montage_gan_tpu.parallel.mesh import (make_mesh,
                                           make_parallel_train_step,
                                           replicate, shard_batch)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.quick
def test_single_process_info_and_primary():
    # no coordinator configured → no-op initialize, single-process identity
    assert dist.maybe_initialize() == (0, 1)
    assert dist.process_info() == (0, 1)
    assert dist.is_primary()


@pytest.mark.quick
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_host_batch_equals_shard_batch_single_process():
    """With one process, the host-local slice IS the global batch — the
    multi-host construction must coincide with the plain device_put path."""
    mesh = make_mesh(8)
    x = np.random.RandomState(0).randn(16, 3, 5).astype(np.float32)
    a = dist.shard_host_batch(mesh, {'x': x})['x']
    b = shard_batch(mesh, {'x': x})['x']
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_two_process_step_matches_single_process(tmp_path):
    """Spawn 2 real jax.distributed processes (2 CPU devices each) running
    one train step on the global 4-device mesh via shard_host_batch, and
    compare bit-level outputs with a single-process 4-device run."""
    # ---- reference: single process, 4 local devices, full global batch
    from tests.test_parallel import BATCH, batch_for, tiny

    ens, trainer = tiny()
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch=BATCH)
    stack, crops = batch_for(ens, jax.random.PRNGKey(1))
    mesh = make_mesh(4)
    pstep = make_parallel_train_step(trainer, mesh, donate_state=False)
    s1, stats1 = pstep(replicate(mesh, state0), shard_batch(mesh, stack),
                       shard_batch(mesh, crops),
                       replicate(mesh, jax.random.PRNGKey(2)))
    leaves1 = np.concatenate([np.asarray(l).ravel() for l in
                              jax.tree_util.tree_leaves(s1.variables)])

    # ---- the 2-process run
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    out = str(tmp_path / 'proc0.npz')
    worker = os.path.join(REPO_ROOT, 'tests', 'helpers', 'dist_worker.py')
    env = dict(os.environ,
               PYTHONPATH=REPO_ROOT + os.pathsep
               + os.environ.get('PYTHONPATH', ''))
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), '2', str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1800)
        outs.append(stdout.decode(errors='replace'))
    assert all(p.returncode == 0 for p in procs), '\n'.join(outs)

    got = np.load(out)
    np.testing.assert_allclose(got['leaves'], leaves1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got['pl_mean'], np.asarray(s1.pl_mean),
                               rtol=2e-4, atol=2e-5)
    for k, v in stats1.items():
        np.testing.assert_allclose(got[f'stat_{k}'], np.asarray(v),
                                   rtol=2e-3, atol=2e-4, err_msg=k)
