"""Op-level profile of one local phase program on the real chip.

Captures a ``jax.profiler`` trace around steady-state dispatches of a
single phase program (default: 256-px gmain, noaug) and prints the
XLA-op self-time table via tensorboard_plugin_profile — the ground truth
for "where do the conv milliseconds actually go" that the phase-level
probes (local_probe.py) cannot see.

    MGT_PROBE_NOAUG=1 python docs/tools/op_profile.py [layer] [phase]

phase ∈ {gmain, dmain, dr1, greg}.  Writes the raw trace under
/tmp/mgt_profile (inspectable with tensorboard), prints the top-40 ops.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.training.augment import make_augment_config
from montage_gan_tpu.training.phase_exec import PhaseExecutor
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper
from montage_gan_tpu.utils.image_utils import make_batch_for_local_d_np
from montage_gan_tpu.data.synthetic import synthetic_batch

BATCH = 32
ITERS = int(os.environ.get('MGT_PROBE_ITERS', '6'))
NOAUG = os.environ.get('MGT_PROBE_NOAUG', '0') == '1'
LOGDIR = '/tmp/mgt_profile'


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    layer = sys.argv[1] if len(sys.argv) > 1 else 'body'
    phase = sys.argv[2] if len(sys.argv) > 2 else 'gmain'
    from montage_gan_tpu.utils.platform import select_platform
    select_platform()

    cfg = MontageConfig()
    hyper = TrainHyper(batch_size=BATCH,
                       augment=make_augment_config('bgcfnc'),
                       ada_target=0.6, microbatch=16, global_microbatch=8,
                       local_noaug=NOAUG)
    trainer = MontageTrainer(ens := MontageEnsemble(cfg), hyper)
    executor = PhaseExecutor(trainer)

    log("on-device init...")
    state = jax.jit(lambda k: trainer.init_state(k, batch=4, on_cpu=False))(
        jax.random.PRNGKey(0))
    jax.device_get(state.step)

    rng_np = np.random.RandomState(0)
    stack01 = synthetic_batch(rng_np, BATCH, cfg.num_layers,
                              cfg.base_resolution)
    crops = tuple(jnp.asarray(c) for c in make_batch_for_local_d_np(
        stack01, [list(t) for t in cfg.layer_targets], to_minus11=True))
    rng = jax.random.PRNGKey(1)
    aug_p = jnp.full([cfg.num_layers + 1], 0.6)

    rep = cfg.layer_names.index(layer)
    rep = executor._geom_of_layer[rep]
    li = jnp.asarray(rep, jnp.int32)
    v = state.variables
    m = jax.tree_util.tree_map(jnp.copy, v['mapping'])
    g = jax.tree_util.tree_map(jnp.copy, v['local_g'][rep])
    og = jax.tree_util.tree_map(jnp.copy, state.opt_states['local_g'][rep])
    d = jax.tree_util.tree_map(jnp.copy, v['local_d'][rep])
    od = jax.tree_util.tree_map(jnp.copy, state.opt_states['local_d'][rep])
    ss = jnp.zeros([cfg.num_layers + 1])
    sc = jnp.zeros([cfg.num_layers + 1])
    real = crops[rep]

    def getleaf(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        scalar = next((l for l in leaves if getattr(l, 'size', 0) == 1),
                      leaves[0])
        return float(np.asarray(jax.device_get(scalar)).reshape(-1)[0])

    # ---- global tail phases: profile via the pruned tail dispatch --------
    if phase in ('global_g', 'global_d', 'global_dreg', 'renderer'):
        stack = jnp.asarray(stack01 * 2.0 - 1.0)
        gates = {'global_g': dict(do_global_g=True),
                 'global_d': dict(do_global_d=True, do_global_dmain=True),
                 'global_dreg': dict(do_global_d=True, do_global_dmain=False,
                                     do_dreg=True),
                 'renderer': dict(do_renderer=True)}[phase]
        log(f"compiling tail[{phase}] (noaug={NOAUG})...")
        t0 = time.time()
        st_, tstats = executor._tail_dispatch(state, stack, crops, rng,
                                              np.int32(0), **gates)
        getleaf(tstats if tstats else st_.step)
        log(f"first dispatch {time.time() - t0:.1f}s; tracing {ITERS} iters")
        os.makedirs(LOGDIR, exist_ok=True)
        jax.profiler.start_trace(LOGDIR)
        t0 = time.time()
        for i in range(1, ITERS + 1):
            st_, tstats = executor._tail_dispatch(st_, stack, crops, rng,
                                                  np.int32(i), **gates)
        getleaf(tstats if tstats else st_.step)
        wall = (time.time() - t0) / ITERS
        jax.profiler.stop_trace()
        log(f"steady {wall * 1e3:.1f} ms/iter")
        log("parse with: python docs/tools/xplane_walk.py")
        return

    def run_once():
        nonlocal m, g, og, d, od, ss, sc
        if phase == 'gmain':
            fn = executor._gmain_fn(rep)
            m, g, og, st = fn(m, g, og, d, li, real, rng, aug_p)
        elif phase == 'dmain':
            fn = executor._dmain_fn(rep)
            m, d, od, ss, sc, st = fn(m, d, od, g, ss, sc, li, real, rng,
                                      aug_p)
        elif phase == 'dr1':
            fn = executor._dr1_fn(rep)
            d, od, ss, sc, st = fn(d, od, ss, sc, li, real, rng, aug_p)
        else:
            raise SystemExit(f'unknown phase {phase}')
        return st

    log(f"compiling {layer}/{phase} (noaug={NOAUG})...")
    t0 = time.time()
    getleaf(run_once())
    log(f"first dispatch {time.time() - t0:.1f}s; tracing {ITERS} iters...")

    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR)
    t0 = time.time()
    st = None
    for _ in range(ITERS):
        st = run_once()
    getleaf(st)
    wall = (time.time() - t0) / ITERS
    jax.profiler.stop_trace()
    log(f"steady {wall * 1e3:.1f} ms/iter")

    # ---- op table from the trace (minimal wire walker — the tensorboard
    # plugin's C++ bridge is unavailable in this image) -------------------
    log("parse with: python docs/tools/xplane_walk.py")


if __name__ == '__main__':
    main()
