"""On-chip cost probe for the TAIL phases (Renderer, global_Gmain,
global_Dmain, global_Dreg, ema_ada) under the open perf levers:

  MGT_REMAT_GLOBAL_G=0   drop the 9-local-G forward remat in the global
                         phases (~+8 TFLOP/step of uncounted recompute when
                         on; semantics-neutral — losses.py:264-268)
  MGT_REMAT_GLOBAL_D=0   drop the renderer→augment→D chain remat
                         (losses.py:288-305)
  MGT_PROBE_GMB=N        global_microbatch (production 8 → try 16: halves
                         the scan rounds in the global/renderer phases)
  MGT_PROBE_MB=N         local microbatch (not used by tail, but changes
                         the hyper hash → fresh programs; leave at 16)

Each variant is ONE process run (the env knobs are read at trace time);
run variants sequentially — only one process may touch the TPU.  Timing:
N donated-state steady iterations per tail phase inside the dispatch
pipeline, one scalar readback at the end (block_until_ready lies over this
transport — see bench.py).

Example sweep (run each line alone, sequentially):
    python docs/tools/tail_probe.py                         # baseline
    MGT_REMAT_GLOBAL_G=0 python docs/tools/tail_probe.py
    MGT_REMAT_GLOBAL_D=0 python docs/tools/tail_probe.py
    MGT_PROBE_GMB=16 python docs/tools/tail_probe.py
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
ITERS = int(os.environ.get('MGT_PROBE_ITERS', '10'))
GMB = int(os.environ.get('MGT_PROBE_GMB', '8'))
MB = int(os.environ.get('MGT_PROBE_MB', '16'))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    from montage_gan_tpu.utils.platform import select_platform
    select_platform()
    log(f"variant: remat_g={os.environ.get('MGT_REMAT_GLOBAL_G', '1')} "
        f"remat_d={os.environ.get('MGT_REMAT_GLOBAL_D', '1')} "
        f"gmb={GMB} mb={MB}")

    cfg = MontageConfig()
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH, augment=make_augment_config('bgcfnc'),
                       ada_target=0.6, microbatch=MB, global_microbatch=GMB)
    trainer = MontageTrainer(ens, hyper)
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
    stack = jnp.asarray(stack01 * 2.0 - 1.0)

    tail = executor._tail_fn()
    phases = [
        ('Renderer', dict(do_renderer=True)),
        ('global_Gmain', dict(do_global_g=True)),
        ('global_Dmain', dict(do_global_d=True, do_dreg=False)),
        ('global_Dreg', dict(do_global_d=True, do_global_dmain=False,
                             do_dreg=True)),
        ('ema_ada', dict(do_ema_ada=True)),
    ]

    def sync(st):
        return float(jax.device_get(jnp.sum(st.pl_mean) + st.step))

    results = {}
    for name, gates in phases:
        t0 = time.time()
        st, _ = tail(state, stack, crops, jax.random.PRNGKey(1),
                     np.int32(0), **gates)
        state = None  # donated into the chain — drop the host reference
        sync(st)
        log(f"[{name}] first call (compile/load) {time.time() - t0:.1f}s")
        # steady: re-feed the donated state; keep the chain data-dependent
        t0 = time.time()
        for i in range(1, ITERS + 1):
            st, _ = tail(st, stack, crops, jax.random.PRNGKey(1),
                         np.int32(i), **gates)
        sync(st)
        dt = (time.time() - t0) / ITERS
        results[name] = dt
        log(f"[{name}] steady {dt * 1000:7.1f} ms over {ITERS} iters")
        # fresh state for the next phase kind; free the old chain FIRST or
        # two full states coexist and OOM the 16G part
        del st
        state = jax.jit(
            lambda k: trainer.init_state(k, batch=4, on_cpu=False))(
            jax.random.PRNGKey(0))
        jax.device_get(state.step)

    log("---- tail decomposition (batch 32, bgcfnc)")
    for name, dt in results.items():
        log(f"{name:14s} {dt * 1000:7.1f} ms")
    amort = (results.get('Renderer', 0) + results.get('global_Gmain', 0)
             + results.get('global_Dmain', 0)
             + results.get('global_Dreg', 0) / 16.0
             + results.get('ema_ada', 0))
    log(f"amortized tail per step: {amort * 1000:.1f} ms "
        f"(Dreg/16 amortization)")


if __name__ == '__main__':
    main()
