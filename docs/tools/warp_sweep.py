"""On-chip greedy sweep of the matmul-warp engine knobs at the 256-px ADA
augment shape (the dominant cost of the four 256-px local phases — see
README "Performance" and the per-phase bench dashboard).

Objective: the REAL call — the full augment pipe at the local-phase
microbatch — in its three training roles per mb-round:
    t_fwd      aug(reals) in Dmain (forward only)
    t_fwdbwd   aug(fakes) in Gmain and Dmain (forward + backward)
    t_gg       aug(reals) under R1's grad-of-grad (every d_reg_interval)
Score = t_fwd + 2·t_fwdbwd + t_gg/16   (bgcfnc: d_reg_interval = 16).

Timing uses the chained-scan method (see conv_probe._timeit): the tunneled
transport's ~25 ms readback RTT swamps per-call sync for ms-scale kernels,
so each measurement runs ``iters`` data-dependent evaluations inside one
jitted program with a single readback, minus a measured RTT baseline.

Each candidate is also value-checked against the baseline config's forward
(coverage changes show up as edge-sliver diffs; large means a broken
window contract).

Run on the real chip (ONE process):  python docs/tools/warp_sweep.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

if jax.default_backend() == "tpu":
    # TPU-only: caching CPU artifacts here would poison the cache with
    # relay-host AOT code (cpu_aot_loader machine-feature mismatch /
    # SIGILL on load — see .claude/skills/verify/SKILL.md).
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from montage_gan_tpu.training import augment as aug_mod
from montage_gan_tpu.training.augment import augment_pipe, make_augment_config

# Geometry via argv (default: the 256-px ADA shape).  The production
# local-D crops are non-square (reference custom/dataset_aio.py:30-83) —
# sweep each with `python docs/tools/warp_sweep.py H W [MB]` and record the
# per-geometry optimum in training/augment.py WARP_TUNE_BY_GEOM.
import sys as _sys
H = int(_sys.argv[1]) if len(_sys.argv) > 1 else 256
W = int(_sys.argv[2]) if len(_sys.argv) > 2 else 256
MB = int(_sys.argv[3]) if len(_sys.argv) > 3 else 16
C = 4
ITERS = 16

_RTT = []


def _rtt():
    if not _RTT:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(jax.device_get(f(x)))
        t0 = time.time()
        for _ in range(8):
            float(jax.device_get(f(x)))
        _RTT.append((time.time() - t0) / 8)
        print(f"# readback RTT baseline: {_RTT[0]*1e3:.1f} ms", flush=True)
    return _RTT[0]


def chained_time(fn, x, iters=ITERS):
    """One jitted program: ``iters`` sequential data-dependent calls of
    ``fn``, single readback; returns seconds per call (RTT-corrected)."""

    def chained(x0):
        def body(eps, _):
            out = fn(x0 + eps.astype(x0.dtype))
            return out.reshape(-1)[0].astype(jnp.float32) * 1e-30, None

        eps, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    run = jax.jit(chained)
    float(jax.device_get(run(x)))  # compile + warm
    t0 = time.time()
    float(jax.device_get(run(x)))
    return max((time.time() - t0) - _rtt(), 1e-9) / iters


def measure(tune, x, p, key, cfg, baseline_out=None):
    """(t_fwd, t_fwdbwd, t_gg, max_abs_diff_vs_baseline) for one config."""
    old = dict(aug_mod.WARP_TUNE)
    old_geom = dict(aug_mod.WARP_TUNE_BY_GEOM)
    aug_mod.WARP_TUNE.clear()
    aug_mod.WARP_TUNE.update(tune)
    aug_mod.WARP_TUNE_BY_GEOM.clear()  # sweep the base table, unmasked
    try:
        fwd = lambda xx: augment_pipe(xx, p, key, cfg)

        def loss(xx):
            return jnp.sum(jnp.tanh(augment_pipe(xx, p, key, cfg)))

        def bwd(xx):
            return jax.grad(loss)(xx)

        def gg(xx):
            def r1(a):
                g = jax.grad(loss)(a)
                return jnp.sum(g * g)
            return jax.grad(r1)(xx)

        out = jax.jit(fwd)(x)
        diff = (float(jax.device_get(jnp.max(jnp.abs(
            out.astype(jnp.float32) - baseline_out))))
            if baseline_out is not None else 0.0)
        t_f = chained_time(fwd, x)
        t_b = chained_time(bwd, x)
        t_g = chained_time(gg, x, iters=max(ITERS // 2, 4))
        return t_f, t_b, t_g, diff, out
    finally:
        aug_mod.WARP_TUNE.clear()
        aug_mod.WARP_TUNE.update(old)
        aug_mod.WARP_TUNE_BY_GEOM.update(old_geom)


def score(t):
    return t[0] + 2.0 * t[1] + t[2] / 16.0


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = make_augment_config('bgcfnc')
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (MB, H, W, C)), jnp.float32)
    p = jnp.float32(0.6)
    key = jax.random.PRNGKey(0)

    base = dict(aug_mod.WARP_TUNE)
    print(f"baseline config: {base}", flush=True)
    t = measure(base, x, p, key, cfg)
    base_out = t[4].astype(jnp.float32)
    best, best_t = dict(base), t[:3]
    print(f"baseline: fwd {t[0]*1e3:6.1f}  fwd+bwd {t[1]*1e3:6.1f}  "
          f"gg {t[2]*1e3:6.1f} ms   score {score(t)*1e3:6.1f}", flush=True)

    knobs = [
        ('precision', [lax.Precision.HIGH]),
        # keep HIGH in the candidate set so future sweeps re-measure the
        # baseline the r4 "DEFAULT wins 17-24%" claim is compared against
        ('weight_precision', [lax.Precision.DEFAULT, lax.Precision.HIGH]),
        ('chunk', [128, 32]),
        (('tile', 'block'), [(64, 128), (48, 96), (16, 48)]),
        ('chunk_t', [8, 24, 32]),
        (('tile_t', 'block_t'), [(48, 224), (64, 288), (16, 96),
                                 (24, 128)]),
    ]
    for name, cands in knobs:
        for cand in cands:
            trial = dict(best)
            if isinstance(name, tuple):
                for k, v in zip(name, cand):
                    trial[k] = v
            else:
                trial[name] = cand
            label = f"{name}={cand}"
            try:
                t = measure(trial, x, p, key, cfg, baseline_out=base_out)
            except Exception as e:  # OOM / compile failure → reject
                print(f"{label:28s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)
                continue
            better = score(t) < score(best_t)
            print(f"{label:28s} fwd {t[0]*1e3:6.1f}  fwd+bwd {t[1]*1e3:6.1f}"
                  f"  gg {t[2]*1e3:6.1f} ms   score {score(t)*1e3:6.1f}"
                  f"  maxdiff {t[3]:.2e}  {'<-- better' if better else ''}",
                  flush=True)
            if better:
                best, best_t = trial, t[:3]
    print(f"\nBEST: {best}")
    print(f"  fwd {best_t[0]*1e3:.1f}  fwd+bwd {best_t[1]*1e3:.1f}  "
          f"gg {best_t[2]*1e3:.1f} ms   score {score(best_t)*1e3:.1f}")


if __name__ == '__main__':
    main()
