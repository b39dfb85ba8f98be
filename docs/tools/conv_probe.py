"""Microbenchmark: achieved TF/s of the AIO step's conv shapes on the chip.

Answers one optimization question per family:
  * plain 3x3 convs (conv1, D convs) — how close to the chip's attainable
    bf16 conv rate are the step's real shapes?
  * up-2x convs (synthesis conv0) — is XLA's ``lhs_dilation`` lowering
    paying the 4x dense-at-output-res penalty on TPU, compared with the
    subpixel decomposition (4 phase convs on the LOW-res input, same math,
    9 taps total)?  If dilated ≈ subpixel, the current conv2d_resample
    up-path is already optimal; if dilated is ~4x slower, implement the
    subpixel path (ops/conv2d_resample.py:100-110).
  * down-2x strided convs (D transitions) — sanity check.

Run on the real chip (one process!):  python docs/tools/conv_probe.py
Timing uses device->host scalar readback as the barrier — the only sync the
tunneled transport honors (see bench.py NOTE on synchronization).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sync(x):
    return float(jax.device_get(jnp.sum(x[..., :1, :1, :1].astype(jnp.float32))))


def _timeit(fn, *args, iters=32):
    """Time ``fn`` by chaining ``iters`` data-dependent evaluations inside
    ONE jitted program, with a single scalar readback at the end.

    Per-call host sync is useless here: the tunneled transport's readback
    RTT is ~25 ms, which swamps ms-scale kernels (a naive per-iteration
    sync measured a 1-ms conv as "27 ms" / 2.9 TF/s).  Chaining through a
    tiny data-dependent epsilon forces strictly sequential execution of all
    ``iters`` kernel invocations on-device; the one readback at the end
    amortizes the RTT to noise.
    """
    from jax import lax as _lax

    def chained(*a):
        x0 = a[0]
        rest = a[1:]

        def body(eps, _):
            out = fn(x0 + eps.astype(x0.dtype), *rest)
            # scalar data-dependence; ~0 numerically so shapes/values stay put
            eps2 = out.reshape(-1)[0].astype(jnp.float32) * 1e-30
            return eps2, None

        eps, _ = _lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    run = jax.jit(chained)
    _ = float(jax.device_get(run(*args)))  # compile + warm
    t0 = time.time()
    _ = float(jax.device_get(run(*args)))
    return max((time.time() - t0) - _rtt(), 1e-9) / iters


_RTT_CACHE = []


def _rtt():
    """One-time estimate of the dispatch+readback round-trip of a trivial
    program (subtracted from every chained measurement)."""
    if not _RTT_CACHE:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(jax.device_get(f(x)))  # compile
        t0 = time.time()
        for _ in range(8):
            float(jax.device_get(f(x)))
        _RTT_CACHE.append((time.time() - t0) / 8)
        print(f"# readback RTT baseline: {_RTT_CACHE[0]*1e3:.1f} ms")
    return _RTT_CACHE[0]


def dense(x, w, stride=1, lhs_dilation=None, padding='SAME'):
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        lhs_dilation=lhs_dilation, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def up2_dilated(x, w):
    kh, kw = w.shape[0], w.shape[1]
    return dense(x, w, lhs_dilation=(2, 2),
                 padding=((kh - 1, kh), (kw - 1, kw)))


def up2_subpixel(x, w):
    """The production phase decomposition (exact, parity-tested vs the
    dilated form in tests/test_ops_parity.py)."""
    from montage_gan_tpu.ops.conv2d_resample import _up_conv_subpixel
    return _up_conv_subpixel(x, w, 2)


def plain_im2col(x, w):
    """3x3 SAME conv as one explicit matmul: unfold 9 shifted views of x
    into the contraction axis.  Same math as ``dense(x, w)``; probes whether
    the MXU matmul path beats the conv emitter at these shapes (measured
    bf16 matmul ~111 TF/s vs conv ~74 TF/s on this v5e)."""
    n, h, ww, cin = x.shape
    kh, kw, _, cout = w.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + ww, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)           # [N,H,W,kh*kw*cin]
    return (patches.reshape(n * h * ww, kh * kw * cin)
            @ w.reshape(kh * kw * cin, cout)).reshape(n, h, ww, cout)


def main():
    print(f"devices: {jax.devices()}")
    B = 16  # the production local-phase microbatch
    rows = []
    # (name, H, cin, cout, kind)
    shapes = [
        ("g256 conv1", 256, 64, 64, "plain"),
        ("g128 conv1", 128, 128, 128, "plain"),
        ("g64 conv1", 64, 256, 256, "plain"),
        ("g32 conv1", 32, 512, 512, "plain"),
        ("g128->256 conv0", 128, 128, 64, "up2"),
        ("g64->128 conv0", 64, 256, 128, "up2"),
        ("g32->64 conv0", 32, 512, 256, "up2"),
        ("d256->128 down", 256, 64, 128, "down2"),
        ("d64->32 down", 64, 256, 512, "down2"),
    ]
    key = jax.random.PRNGKey(0)
    for name, h, cin, cout, kind in shapes:
        kx, kw_, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, (B, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(kw_, (3, 3, cin, cout), jnp.bfloat16)
        if kind == "plain":
            variants = {"dense": jax.jit(lambda x, w: dense(x, w)),
                        "im2col": jax.jit(plain_im2col)}
            flops = 2 * B * h * h * cin * cout * 9
        elif kind == "up2":
            variants = {
                "lhs_dilated": jax.jit(up2_dilated),
                "subpixel": jax.jit(up2_subpixel),
            }
            flops = 2 * B * h * h * cin * cout * 9  # 9 taps at LOW res
        else:
            variants = {"strided": jax.jit(
                lambda x, w: dense(x, w, stride=2))}
            flops = 2 * B * (h // 2) ** 2 * cin * cout * 9
        for vname, fn in variants.items():
            # forward
            t_f = _timeit(fn, x, w)
            # fwd+bwd (grads wrt x and w — the training cost)
            g = jax.jit(jax.grad(
                lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32)),
                argnums=(0, 1)))
            t0 = time.time()
            gx, gw = g(x, w)
            _sync(gx)
            t_warm = time.time() - t0
            t_b = _timeit(lambda x, w: g(x, w)[0], x, w)
            rows.append((name, vname, flops / t_f / 1e12,
                         3 * flops / t_b / 1e12, t_f, t_b))
            print(f"{name:18s} {vname:12s} fwd {flops / t_f / 1e12:6.1f} TF/s"
                  f"  fwd+bwd {3 * flops / t_b / 1e12:6.1f} TF/s"
                  f"  ({t_f * 1e3:.1f} / {t_b * 1e3:.1f} ms,"
                  f" bwd warm {t_warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
