"""On-chip cost of the mapping/style-mixing chain — validates the r5
"mapping hoist" lever (op_profile attributed ~13 ms/round to these
latency-bound batch-16 512-wide FC chains inside every phase program).

Measures, chained with a non-sliceable consumer (sum(tanh(.))):
  map16_fwd      run_mapping_with_mixing at mb=16, forward
  map16x2_fwd    two sequential mb=16 calls (the 2-round structure)
  map32_fwd      one mb=32 call (the hoisted structure)
  map16x2_grad   grad wrt mapping params of two mb=16 calls
  map32_grad     grad wrt mapping params of one mb=32 call

Run on the real chip: PYTHONPATH=/root/repo python docs/tools/mapping_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

if jax.default_backend() == "tpu":
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
from montage_gan_tpu.training.losses import run_mapping_with_mixing

ITERS = 32
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
    def chained(x0):
        def body(eps, _):
            out = fn(x0 + eps)
            return jnp.asarray(out, jnp.float32) * 1e-30, None

        eps, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    run = jax.jit(chained)
    float(jax.device_get(run(x)))
    t0 = time.time()
    float(jax.device_get(run(x)))
    return max((time.time() - t0) - _rtt(), 1e-9) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = MontageConfig()
    ens = MontageEnsemble(cfg)
    rng = jax.random.PRNGKey(0)
    mv = ens.mapping.init(rng, jnp.zeros([2, cfg.z_dim]), None)
    z16 = jax.random.normal(jax.random.PRNGKey(1), [16, cfg.z_dim])
    z32 = jax.random.normal(jax.random.PRNGKey(1), [32, cfg.z_dim])
    k = jax.random.PRNGKey(2)

    def one(z, key, eps):
        ws, _ = run_mapping_with_mixing(
            ens, mv, z + eps, key, 0.9)
        return jnp.sum(jnp.tanh(ws))

    t = chained_time(lambda e: one(z16, k, e), jnp.float32(0.0))
    print(f"map16_fwd     {t*1e3:7.2f} ms", flush=True)
    t = chained_time(
        lambda e: one(z16, k, e) + one(z16, jax.random.fold_in(k, 1), e + 1),
        jnp.float32(0.0))
    print(f"map16x2_fwd   {t*1e3:7.2f} ms", flush=True)
    t = chained_time(lambda e: one(z32, k, e), jnp.float32(0.0))
    print(f"map32_fwd     {t*1e3:7.2f} ms", flush=True)

    def g2(e):
        def loss(p):
            mvp = {**mv, 'params': p}
            ws1, _ = run_mapping_with_mixing(ens, mvp, z16 + e, k, 0.9)
            ws2, _ = run_mapping_with_mixing(ens, mvp, z16 + e + 1,
                                             jax.random.fold_in(k, 1), 0.9)
            return jnp.sum(jnp.tanh(ws1)) + jnp.sum(jnp.tanh(ws2))
        g = jax.grad(loss)(mv['params'])
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    t = chained_time(g2, jnp.float32(0.0))
    print(f"map16x2_grad  {t*1e3:7.2f} ms", flush=True)

    def g1(e):
        def loss(p):
            mvp = {**mv, 'params': p}
            ws, _ = run_mapping_with_mixing(ens, mvp, z32 + e, k, 0.9)
            return jnp.sum(jnp.tanh(ws))
        g = jax.grad(loss)(mv['params'])
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    t = chained_time(g1, jnp.float32(0.0))
    print(f"map32_grad    {t*1e3:7.2f} ms", flush=True)


if __name__ == '__main__':
    main()
