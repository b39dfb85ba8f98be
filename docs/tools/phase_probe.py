"""On-chip cost decomposition of ONE 256-px local phase program.

The bench dashboard shows the four 256-px local phases at ~20 TF/s counted
(vs 42-68 TF/s for the smaller layers) — the counted-FLOP model excludes
the ADA pipe, so the gap is hypothesized to be augment cost (dominated by
the geometric matmul warp).  This probe measures the SAME compiled phase
program (PhaseExecutor._layer_fn for the 256² geometry rep, no-reg combo)
under three augment settings:

    bgcfnc   the production pipe (blit+geom+color+filter+noise+cutout)
    bc       blit+color only — no geometric warp, no filter bank
    noaug    augment disabled entirely

Differences attribute the phase's wall time to {geom warp + filter} vs
{rest of pipe} vs {networks}.  Timing: N sequential donated-state steps
inside the dispatch pipeline with one scalar readback at the end (the
per-step readback RTT ~25 ms is noise against ~0.5 s phases).

Run on the real chip (ONE process): python docs/tools/phase_probe.py
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
from montage_gan_tpu.training.augment import AugmentConfig, make_augment_config
from montage_gan_tpu.training.phase_exec import PhaseExecutor
from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper

BATCH = 32
ITERS = int(os.environ.get('MGT_PROBE_ITERS', '12'))


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def probe(aug_name, aug_cfg):
    cfg = MontageConfig()
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH, augment=aug_cfg, ada_target=0.6,
                       microbatch=16, global_microbatch=8)
    trainer = MontageTrainer(ens, hyper)
    executor = PhaseExecutor(trainer)

    log(f"[{aug_name}] on-device init...")
    state = jax.jit(lambda k: trainer.init_state(k, batch=4, on_cpu=False))(
        jax.random.PRNGKey(0))
    jax.device_get(state.step)

    rep = 0  # hair_back = the 256² geometry representative
    real = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (BATCH, 256, 256, 4))
        .astype(np.float32))
    fn = executor._layer_fn(rep, False, False)  # no-reg combo
    layer_idx = jnp.asarray(0, jnp.int32)

    def args_of(st, ins, i):
        if ins is None:
            v, o = st.variables, st.opt_states
            return (v['mapping'], v['local_g'][0], o['local_g'][0],
                    v['local_d'][0], o['local_d'][0], st.pl_mean,
                    st.ada_sign_sum, st.ada_sign_count, layer_idx, real,
                    jax.random.fold_in(jax.random.PRNGKey(1), i), st.aug_p)
        return ins[:8] + (layer_idx, real,
                          jax.random.fold_in(jax.random.PRNGKey(1), i),
                          st.aug_p)

    log(f"[{aug_name}] compiling/loading the 256² local phase program...")
    t0 = time.time()
    out = fn(*args_of(state, None, 0))
    jax.device_get(out[5][0])  # pl_mean scalar: sync
    log(f"[{aug_name}] first call {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(1, ITERS + 1):
        out = fn(*args_of(state, out, i))
    jax.device_get(out[5][0])
    dt = (time.time() - t0) / ITERS
    log(f"[{aug_name}] steady {dt * 1000:.0f} ms/phase over {ITERS} iters")
    return dt


def main():
    from montage_gan_tpu.utils.platform import select_platform
    select_platform()
    results = {}
    settings = [
        ('bgcfnc', make_augment_config('bgcfnc')),
        ('bc', AugmentConfig(xflip=1, rotate90=1, xint=1, brightness=1,
                             contrast=1, lumaflip=1, hue=1, saturation=1)),
        ('noaug', None),
    ]
    only = os.environ.get('MGT_PROBE_ONLY')
    for name, cfg in settings:
        if only and name not in only.split(','):
            continue
        results[name] = probe(name, cfg)
    log("---- decomposition (256² local phase, no-reg combo, batch 32)")
    for name, dt in results.items():
        log(f"{name:8s} {dt * 1000:7.0f} ms")
    if 'bgcfnc' in results and 'noaug' in results:
        pipe = results['bgcfnc'] - results['noaug']
        log(f"full pipe cost  {pipe * 1000:7.0f} ms "
            f"({pipe / results['bgcfnc'] * 100:.0f}% of phase)")
    if 'bgcfnc' in results and 'bc' in results:
        geom = results['bgcfnc'] - results['bc']
        log(f"geom+filter cost {geom * 1000:6.0f} ms "
            f"({geom / results['bgcfnc'] * 100:.0f}% of phase)")


if __name__ == '__main__':
    main()
