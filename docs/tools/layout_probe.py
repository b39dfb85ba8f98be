"""On-chip measurement of the C=4 image-layout relayouts around the Mosaic
warp kernel (the r5 pool: pad+pack 5.7 ms, untile 6.5 ms per forward call at
the 256-px ADA shape — docs/PERF.md "Mosaic warp engine").

Candidates measured, all at the 256-px geometry ([16,396,396,4] warp input,
524x524 warp output, 256x256 final):

  pack        NHWC [N,396,396,4] -> bf16 packed [N,400,1664]   (current entry)
  untile_nhwc [T,C,P] planar tiles -> NHWC [N,524,524,4]       (current exit)
  untile_plan [T,C,P] planar tiles -> planar [N,4,524,524]     (candidate)
  plan2nhwc   [N,4,256,256] -> [N,256,256,4]                   (exit transpose)
  nhwc2plan   [N,256,256,4] -> [N,4,256,256]                   (entry transpose)
  down_nhwc   downsample2d on NHWC (current)
  down_plan   matmul downsample on planar (candidate)
  color_nhwc  color-matrix stage on NHWC via [N,HW,C] einsum (current)
  color_plan  color-matrix stage on planar via [3,3]@[3,HW] (candidate)
  fromrgb_*   1x1 conv C=4->128 on NHWC vs planar-matmul

Chained-scan timing with a single readback (see warp_sweep.chained_time).
Run on the real chip, ONE process: python docs/tools/layout_probe.py
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

from montage_gan_tpu.ops.upfirdn2d import downsample2d
from montage_gan_tpu.ops.filters import setup_filter
from montage_gan_tpu.training.augment import WAVELETS

N, C = 16, 4
H_IN, W_IN = 396, 396        # warp input (reflect-padded 256-px crop)
H2, W2 = 524, 524            # warp output (2x canvas)
HF, WF = 256, 256            # final
TILE = 48
NTI = -(-H2 // TILE)
HP = NTI * TILE
P = TILE * TILE
TPS = NTI * NTI
HZ = setup_filter(WAVELETS['sym6'])
HZ_PAD = HZ.shape[0] // 4

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
            out = fn(x0 + eps.astype(x0.dtype))
            return jnp.asarray(out, jnp.float32).reshape(-1)[0] * 1e-30, None

        eps, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return eps

    run = jax.jit(chained)
    float(jax.device_get(run(x)))
    t0 = time.time()
    float(jax.device_get(run(x)))
    return max((time.time() - t0) - _rtt(), 1e-9) / iters


def bench(name, fn, x, iters=ITERS):
    t = chained_time(fn, x, iters)
    print(f"{name:16s} {t*1e3:7.2f} ms", flush=True)
    return t


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    # ---- entry pack (current): NHWC f32 -> padded packed bf16
    x_in = jnp.asarray(rng.randn(N, H_IN, W_IN, C), jnp.float32)
    hp8 = -(-H_IN // 8) * 8
    wp32 = -(-W_IN // 32) * 32

    def pack(x):
        xp = jnp.pad(x.astype(jnp.bfloat16),
                     ((0, 0), (0, hp8 - H_IN), (0, wp32 - W_IN), (0, 0)))
        return xp.reshape(N, hp8, wp32 * C)

    bench('pack', pack, x_in)

    # ---- exit untile: [T, C, P] -> NHWC vs planar
    tiles = jnp.asarray(rng.randn(N * TPS, C, P), jnp.float32)

    def untile_nhwc(t):
        o = t.reshape(N, NTI, NTI, C, TILE, TILE)
        o = o.transpose(0, 1, 4, 2, 5, 3).reshape(N, HP, HP, C)
        return o[:, :H2, :W2]

    def untile_plan(t):
        o = t.reshape(N, NTI, NTI, C, TILE, TILE)
        o = o.transpose(0, 3, 1, 4, 2, 5).reshape(N, C, HP, HP)
        return o[:, :, :H2, :W2]

    bench('untile_nhwc', untile_nhwc, tiles)
    bench('untile_plan', untile_plan, tiles)

    # ---- transposes at the final shape
    x_pl = jnp.asarray(rng.randn(N, C, HF, WF), jnp.float32)
    x_nh = jnp.asarray(rng.randn(N, HF, WF, C), jnp.float32)
    bench('plan2nhwc', lambda x: x.transpose(0, 2, 3, 1), x_pl)
    bench('nhwc2plan', lambda x: x.transpose(0, 3, 1, 2), x_nh)

    # wide-channel comparison (cost after fromrgb)
    x_pl128 = jnp.asarray(rng.randn(N, 128, 128, 128), jnp.float32)
    bench('plan2nhwc_c128', lambda x: x.transpose(0, 2, 3, 1), x_pl128)

    # ---- downsample: NHWC conv vs planar matmul
    x2_nh = jnp.asarray(rng.randn(N, H2, W2, C), jnp.float32)
    x2_pl = jnp.asarray(rng.randn(N, C, H2, W2), jnp.float32)

    def down_nhwc(x):
        return downsample2d(x, HZ, down=2, padding=-HZ_PAD * 2,
                            flip_filter=True)

    # matmul downsample: out[q] = sum_j f[j] * x[2q + j - 2*hz_pad + off]
    # (exact same index algebra as downsample2d with padding=-2*hz_pad,
    #  flip_filter=True; validated below)
    taps = HZ.shape[0]
    f1 = np.asarray(HZ, np.float32)  # flip_filter=True => correlation order
    # downsample2d(padding=-2*HZ_PAD) => upfirdn pad p0 = -2*HZ_PAD +
    # (taps - 2 + 1)//2; out[q] = sum_j f[j] * x[2q + j - p0]
    P0 = -2 * HZ_PAD + (taps - 2 + 1) // 2

    def make_D(n_out, n_in):
        D = np.zeros((n_out, n_in), np.float32)
        for q in range(n_out):
            for j in range(taps):
                s = 2 * q + j - P0
                if 0 <= s < n_in:
                    D[q, s] += f1[j]
        return jnp.asarray(D)

    Dy = make_D(HF, H2)
    Dx = make_D(WF, W2)

    def down_plan(x):
        t = jnp.einsum('qh,nchw->ncqw', Dy, x,
                       precision=lax.Precision.DEFAULT)
        return jnp.einsum('rw,nchw->nchr', Dx, t,
                          precision=lax.Precision.DEFAULT)

    bench('down_nhwc', down_nhwc, x2_nh)
    bench('down_plan', down_plan, x2_pl)

    # numerics: down_plan == down_nhwc (same data, transposed)
    a = jax.jit(down_nhwc)(x2_nh)
    b = jax.jit(down_plan)(x2_nh.transpose(0, 3, 1, 2))
    d = float(jnp.max(jnp.abs(a - b.transpose(0, 2, 3, 1))))
    print(f"# down_plan vs down_nhwc maxdiff: {d:.2e} "
          f"(shapes {a.shape} vs {b.shape})", flush=True)

    # ---- color stage
    Cm = jnp.asarray(rng.randn(N, 4, 4), jnp.float32)

    def color_nhwc(x):
        flat = x.reshape(N, HF * WF, C)
        rgb = jnp.einsum('nab,npb->npa', Cm[:, :3, :3], flat[..., :3]) \
            + Cm[:, None, :3, 3]
        flat = jnp.concatenate([rgb, flat[..., 3:]], axis=-1)
        return flat.reshape(N, HF, WF, C)

    def color_plan(x):
        flat = x.reshape(N, C, HF * WF)
        rgb = jnp.einsum('nab,nbp->nap', Cm[:, :3, :3], flat[:, :3]) \
            + Cm[:, :3, 3][:, :, None]
        return jnp.concatenate([rgb, flat[:, 3:]], axis=1).reshape(
            N, C, HF, WF)

    bench('color_nhwc', color_nhwc, x_nh)
    bench('color_plan', color_plan, x_pl)

    # ---- fromrgb: 1x1 conv C=4 -> 128
    Wc = jnp.asarray(rng.randn(1, 1, C, 128), jnp.float32) * 0.1

    def fromrgb_nhwc(x):
        return lax.conv_general_dilated(
            x, Wc, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def fromrgb_plan(x):
        flat = x.reshape(N, C, HF * WF)
        y = jnp.einsum('oc,ncp->nop', Wc[0, 0].T, flat)
        return y.reshape(N, 128, HF, WF).transpose(0, 2, 3, 1)

    bench('fromrgb_nhwc', fromrgb_nhwc, x_nh)
    bench('fromrgb_plan', fromrgb_plan, x_pl)

    # ---- imgfilter: NHWC depthwise conv vs planar matmul (per-sample f)
    fb = jnp.asarray(rng.randn(N, 17), jnp.float32)
    padf = 17 // 2

    def filt_nhwc(x):
        xp = jnp.pad(x, [(0, 0), (padf, padf), (padf, padf), (0, 0)],
                     mode='reflect')

        def one(img, f1d):
            kx = jnp.tile(f1d[None, :, None, None], (1, 1, 1, C))
            ky = jnp.tile(f1d[:, None, None, None], (1, 1, 1, C))
            y = lax.conv_general_dilated(img[None], kx, (1, 1), 'VALID',
                                         dimension_numbers=('NHWC', 'HWIO',
                                                            'NHWC'),
                                         feature_group_count=C)
            y = lax.conv_general_dilated(y, ky, (1, 1), 'VALID',
                                         dimension_numbers=('NHWC', 'HWIO',
                                                            'NHWC'),
                                         feature_group_count=C)
            return y[0]

        return jax.vmap(one)(xp, fb)

    def filt_plan(x):
        xp = jnp.pad(x, [(0, 0), (0, 0), (padf, padf), (padf, padf)],
                     mode='reflect')
        # per-sample banded matrices [B, HF, HF+2p] built from the 17-tap f
        i = np.arange(HF)[:, None]
        j = np.arange(HF + 2 * padf)[None, :]
        sel = ((j - i >= 0) & (j - i < 17))
        idx = np.where(sel, j - i, 0)
        M = fb[:, idx] * jnp.asarray(sel, jnp.float32)[None]   # [B,HF,HF+2p]
        t = jnp.einsum('nqh,nchw->ncqw', M, xp,
                       precision=lax.Precision.DEFAULT)
        return jnp.einsum('nrw,ncqw->ncqr', M, t,
                          precision=lax.Precision.DEFAULT)

    bench('filt_nhwc', filt_nhwc, x_nh)
    bench('filt_plan', filt_plan, x_pl)


if __name__ == '__main__':
    main()
