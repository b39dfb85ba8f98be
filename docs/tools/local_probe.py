"""On-chip cost probe for the LOCAL phase programs, per layer geometry.

Decomposes the ~2.8 s local block (BENCH_r03: 58% of the step) into
per-geometry, per-phase-kind costs, and — run twice, with and without the
augment pipe — isolates the ADA augmentation share of each phase (the
analytic FLOP model deliberately excludes augmentation, so its real MXU
time is invisible in the bench TF/s dashboard; VERDICT r3 "weak" #4).

Also re-measures ema_ada BOTH ways (chained donated steady-state like
tail_probe, and single-dispatch-after-sync like bench's `timed`) to resolve
the 400 ms (tail_probe) vs 70 ms (bench Timing/ema_ada) contradiction
(VERDICT r3 "weak" #2).

Variants (one process each — only one process may touch the TPU):
    python docs/tools/local_probe.py                    # augment ON (prod)
    MGT_PROBE_NOAUG=1 python docs/tools/local_probe.py  # augment OFF

Timing: N donated-state steady iterations per phase program inside the
dispatch pipeline, one scalar readback at the end (block_until_ready lies
over this transport — see bench.py).
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
ITERS = int(os.environ.get('MGT_PROBE_ITERS', '8'))
NOAUG = os.environ.get('MGT_PROBE_NOAUG', '0') == '1'


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    from montage_gan_tpu.utils.platform import select_platform
    select_platform()
    log(f"variant: noaug={NOAUG} iters={ITERS}")

    cfg = MontageConfig()
    # production bench hyper (bench.py) so the aug-on programs load from the
    # warm persistent cache
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
    stack = jnp.asarray(stack01 * 2.0 - 1.0)

    rng = jax.random.PRNGKey(1)
    # aug_p at the production ceiling so the geometric branch is fully live
    aug_p = jnp.full([cfg.num_layers + 1], 0.6)

    def getleaf(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        scalar = next((l for l in leaves if getattr(l, 'size', 0) == 1),
                      leaves[0])
        return float(np.asarray(jax.device_get(scalar)).reshape(-1)[0])

    # one rep per geometry; layer name of the rep for display
    reps = sorted(set(executor._geom_of_layer))
    results = {}
    for rep in reps:
        name = cfg.layer_names[rep]
        geom = cfg.layer_targets[rep]
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

        # ---- Gmain: donates (m, g, og); d frozen
        fn = executor._gmain_fn(rep)
        t0 = time.time()
        m, g, og, st = fn(m, g, og, d, li, real, rng, aug_p)
        getleaf(st)
        log(f"[{name} {geom} gmain] first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(ITERS):
            m, g, og, st = fn(m, g, og, d, li, real, rng, aug_p)
        getleaf(st)
        t_g = (time.time() - t0) / ITERS
        # ---- Dmain: donates (m, d, od, ss, sc); g frozen
        fn = executor._dmain_fn(rep)
        t0 = time.time()
        m, d, od, ss, sc, st = fn(m, d, od, g, ss, sc, li, real, rng, aug_p)
        getleaf(st)
        log(f"[{name} {geom} dmain] first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(ITERS):
            m, d, od, ss, sc, st = fn(m, d, od, g, ss, sc, li, real, rng,
                                      aug_p)
        getleaf(st)
        t_d = (time.time() - t0) / ITERS
        # ---- Dreg (R1 grad-of-grad)
        fn = executor._dr1_fn(rep)
        t0 = time.time()
        d, od, ss, sc, st = fn(d, od, ss, sc, li, real, rng, aug_p)
        getleaf(st)
        log(f"[{name} {geom} dr1] first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(ITERS):
            d, od, ss, sc, st = fn(d, od, ss, sc, li, real, rng, aug_p)
        getleaf(st)
        t_r1 = (time.time() - t0) / ITERS
        # ---- Greg (PL; no augment in this phase, still useful cost data)
        fn = executor._greg_fn(rep)
        pl = jnp.zeros([cfg.num_layers])
        t0 = time.time()
        m, g, og, pl, st = fn(m, g, og, pl, li, real, rng)
        getleaf(st)
        log(f"[{name} {geom} greg] first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(ITERS):
            m, g, og, pl, st = fn(m, g, og, pl, li, real, rng)
        getleaf(st)
        t_pl = (time.time() - t0) / ITERS

        results[name] = (geom, t_g, t_d, t_r1, t_pl)
        log(f"[{name} {geom}] gmain {t_g*1e3:7.1f}  dmain {t_d*1e3:7.1f}  "
            f"dr1 {t_r1*1e3:7.1f}  greg {t_pl*1e3:7.1f} ms")
        del m, g, og, d, od, ss, sc, pl

    # ---- ema_ada both ways (VERDICT r3 weak #2)
    tail = executor._tail_fn()
    gates = dict(do_ema_ada=True)
    t0 = time.time()
    st_, _ = tail(state, stack, crops, rng, np.int32(0), **gates)
    state = None
    getleaf(st_.step)
    log(f"[ema_ada] first {time.time() - t0:.1f}s")
    # (a) chained donated steady-state (tail_probe's method)
    t0 = time.time()
    for i in range(1, ITERS + 1):
        st_, _ = tail(st_, stack, crops, rng, np.int32(i), **gates)
    getleaf(st_.step)
    t_chain = (time.time() - t0) / ITERS
    # (b) single dispatch after sync (bench timed()'s method)
    singles = []
    for i in range(4):
        t0 = time.time()
        st_, stt = tail(st_, stack, crops, rng, np.int32(100 + i), **gates)
        getleaf(stt)
        singles.append(time.time() - t0)
    log(f"[ema_ada] chained {t_chain*1e3:.1f} ms/iter; "
        f"single-dispatch {', '.join(f'{s*1e3:.0f}' for s in singles)} ms")

    log("---- local decomposition "
        f"(batch 32 mb16, bgcfnc p=0.6, noaug={NOAUG})")
    log(f"{'layer':12s} {'geom':10s} {'gmain':>8s} {'dmain':>8s} "
        f"{'dr1':>8s} {'greg':>8s}")
    n_of = {}
    for i, r in enumerate(executor._geom_of_layer):
        n_of[cfg.layer_names[r]] = n_of.get(cfg.layer_names[r], 0) + 1
    tot = 0.0
    for name, (geom, t_g, t_d, t_r1, t_pl) in results.items():
        k = n_of[name]
        log(f"{name:12s} {str(geom):10s} {t_g*1e3:8.1f} {t_d*1e3:8.1f} "
            f"{t_r1*1e3:8.1f} {t_pl*1e3:8.1f}   ×{k} layers")
        tot += k * (t_g + t_d + t_r1 / 16.0 + t_pl / 4.0)
    log(f"amortized local block per step: {tot*1e3:.0f} ms "
        f"(dr1/16, greg/4 amortization)")


if __name__ == '__main__':
    main()
