"""Exact bilinear (and FIR-fused) affine warp as tiled dense matmuls.

TWO ENGINES live behind the public ``affine_warp``:

* the **Mosaic engine** (``ops/pallas/warp_kernel.py``) — hand-scheduled
  Pallas kernels; the DEFAULT on TPU backends since r5 (``MGT_WARP_ENGINE``,
  measured 33.6 vs 69.1 ms fwd+bwd at the 256-px ADA shape).  Its transpose
  is the EXACT adjoint of its forward for every theta (the windows'
  cotangents accumulate in a VMEM-resident plane), so the ``in``-adjoint
  coverage contract documented below does NOT apply in production on TPU;
* the **XLA engine** (this file) — the portable implementation and the CPU/
  test oracle; everything below describes it.  Its default ``in`` transpose
  carries the measured coverage contract; ``MGT_WARP_ADJOINT=out`` selects
  its exact-but-slower adjoint.

Computes the same result as ``grid_sample(x, affine_grid(theta, Ho, Wo))``
(torch ``align_corners=False`` bilinear with zeros padding — the contract of
reference ``torch_utils/ops/grid_sample_gradfix.py:28`` as used by the ADA
geometric branch, reference ``training/augment.py:338-339``) but without any
gather/scatter:

    out[p] = sum_{k,l} hat(sy_p - k) * hat(sx_p - l) * x[k, l]

where ``hat(t) = max(0, 1 - |t|)`` is the linear-interpolation kernel.  Each
row of the hat matrices has only two nonzeros, but on TPU a *dense* matmul on
the MXU beats a sparse gather by a wide margin, and — crucially — the
transpose (the VJP) is more dense matmuls instead of a scatter-add.  Measured
on v5e at the ADA augment shapes ([16, 792, 792, 4] → 524²): gather
grid_sample = 194 ms fwd / 1445 ms grad; this engine ≈ 35/~110 ms.

Fused upsample (``up=2, up_filter=f``): the ADA geometric branch samples a
2× ``upsample2d`` of the input (reference ``training/augment.py:331-339``).
``warp(upsample2d(x, f, up)) ≡ warp(x)`` with the bilinear hat replaced by
the *piecewise-linear interpolant of f* evaluated at stride-``up`` tap
positions:

    sum_m hat(s_p - m) * (up2 x)[m] = sum_l K(s_p - up·l + p0 - up + 1) x[l],
    K(u) = up · sum_j hat(u - j) f[j]

(``upsample2d`` places taps at ``m = up·l - p0 + up - 1 + j`` with
``p0 = (T + up - 1)//2`` and per-axis gain ``up`` — pinned by a calibration
test).  This is an identity, not an approximation — including the border
crop: ``upfirdn2d`` discards convolution tails outside ``[0, up·L)``, which
the weight builder reproduces by masking taps whose virtual position falls
off the plane.  The fused form warps the 1×-resolution input directly: ~4×
fewer window FLOPs and no up2 pass at all.

Forward tiling: the output is cut into ``tile``×``tile`` tiles; for each tile
the source coordinates (affine ⇒ extremes at tile corners) select a
``block``×``block`` input window via ``dynamic_slice``.  The weights are
built densely against the window's row/column iota, so the contraction is a
``[P, block] @ [block, block·C]`` matmul per tile (P = tile²), scanned over
(tile-row × batch) with the tiles of one row vmapped.

Transpose (the VJP wrt x) — two engines, ``MGT_WARP_ADJOINT``:

``in`` (default): *gather-side* mirror image — the INPUT plane is cut into
``tile_t``×``tile_t`` tiles; for each input tile the window of the
output-cotangent plane whose points can touch it (the preimage of the
support-expanded tile rect under the pixel-space affine, located via
theta⁻¹) is sliced, and

    dx[k, l] = sum_q wy[q, k] * wx[q, l] * g[q]

is a dense ``[tile, Q] @ [Q, tile·C]`` contraction per tile (Q = window
points).  Every output write is a disjoint input tile — no accumulation
pass, no serial loop — but Q = block_t² window rows must be re-weighted
per input tile (~25× the forward's weight evaluations at the production
tune), and the window clamping makes the adjoint exact only within the
coverage contract below.

``out``: walk the FORWARD's tile list again and apply the exact adjoint of
each tile's two contractions,
``dX_win[h,w,c] = Σ_p wy[p,h]·wx[p,w]·g[p,c]`` — the same P = tile² weight
rows the forward built, so the result is the adjoint of the clamped-window
forward BY CONSTRUCTION for every theta (nothing is ever dropped; the
coverage contract below applies only to the ``in`` engine).  The
overlapping windows then accumulate into the input plane with a sequential
in-place dynamic-update-slice scan, bucketed over ``MGT_WARP_ACC_LANES``
independent planes; see ``_warp_transpose_outtiled``.  Despite ~13× fewer
weight-evaluation FLOPs it measures SLOWER on v5e at the ADA shape — the
serial accumulation chain dominates (warp-only fwd+bwd 107–112 ms across
lane counts vs 89 ms for ``in``; full bgcfnc pipe bwd 143 vs 113 ms,
grad-of-grad 278 vs 217 ms) — which is why the approximate-but-measured
``in`` engine stays the default and ``out`` is the zero-loss option for
heavier-tailed transform laws.

Coverage contract of the default ``in`` engine (per direction, NOT
symmetric — the ``out`` adjoint is exact for every theta and has
no transpose-side bound): the forward window of
``block`` stored rows covers an output tile whose source footprint fits,
i.e. per-axis |J| row sums up to ``≈ (block − supp − 1)·up/tile``
(*minification* bound); the transpose window of ``block_t`` output rows
covers an input tile touched by ≤ ``block_t`` output rows, i.e. |J⁻¹| row
sums up to ``≈ block_t / (up·(tile_t − 1) + n_taps + 1)`` (*magnification*
bound).  Beyond its bound a window clamps and the uncovered taps read
zeros instead of the true values — the forward then drops input pixels,
and the transpose drops cotangent mass, so the VJP is the exact adjoint of
the computed forward only while BOTH bounds hold.  At the ADA call site
(training/augment.py: tile=32, block=64, tile_t=32, block_t=160, up=2,
12 taps) the forward bound is ≈3.5 and the transpose bound ≈2.13.

MEASURED contract under ADA's bgcfnc transform law at the 256-px shape
(10⁵ draws through the production sampler, conservative position-worst-
case check — tests/test_affine_warp.py::test_coverage_violation_rate):
forward violations 0; transpose violations 0.87% of samples at p=1 and
0.24% at the AIO production ceiling p=0.6 (aug_p_max).  Severity is
tail-dominated: the MEDIAN violator loses <0.1% of that sample's
augment-path gradient (the check overcounts near-misses), and the worst
draw in 10⁵ loses ~40% of that one sample's contribution (≈1.3% of a
batch-32 gradient, expected batch-gradient corruption ~1e-6 relative).
``coverage_excess`` computes the per-sample check; raising ``block_t``
buys coverage at ~linear cost in the transpose's window area
(block_t 192 → 0.05% rate at p=1, 224 → 2e-5, 256 → 0 in 10⁵), and the
ADA call site exposes ``MGT_WARP_GUARD=1`` — a per-batch exact-gather
fallback for out-of-contract thetas.  Callers with heavier-tailed
transform laws should raise ``block``/``block_t``, enable the guard, or
switch to the exact ``MGT_WARP_ADJOINT=out`` engine (~27% slower bwd).

Differentiation: the op is linear in ``x``; forward and transpose are a
mutually-referencing ``jax.custom_vjp`` pair (the round-1 upfirdn2d pattern,
ops/pallas/upfirdn2d_kernel.py:192-219), so JAX differentiates it to any
order (R1 needs grad-of-grad through the augment pipe, reference
``custom/loss_aio.py:168-179``); grad-of-grad is the forward again, on the
MXU.

``theta`` is treated as a constant (``stop_gradient``): every caller derives
it from RNG draws, never from trained parameters.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def use_matmul_warp() -> bool:
    """Implementation switch for affine warps (mirrors the reference's
    ``impl='cuda'|'ref'`` dual-path pattern, bias_act.py:103-105).

    ``MGT_WARP_IMPL``: ``matmul`` | ``gather`` | ``auto`` (default).  Auto
    picks the dense matmul engine on TPU (where gather/scatter lowering
    is catastrophic) and the gather path elsewhere (CPU tests, parity vs
    torch).
    """
    impl = os.environ.get('MGT_WARP_IMPL', 'auto')
    if impl == 'matmul':
        return True
    if impl == 'gather':
        return False
    return jax.default_backend() == 'tpu'


class _Spec(NamedTuple):
    n: int
    h: int            # stored (1×) input spatial size
    w: int
    c: int
    out_h: int        # output spatial size
    out_w: int
    tile: int         # forward: output tile edge
    block: int        # forward: input window edge (in stored-l units)
    tile_t: int       # transpose: input tile edge
    block_t: int      # transpose: output-cotangent window edge
    chunk: int        # forward: tiles per scan step
    chunk_t: int      # transpose: tiles per scan step
    up: int           # virtual upsample factor (1 = plain bilinear)
    taps: Optional[Tuple[float, ...]]   # FIR taps of the fused upsample
    precision: lax.Precision
    wprec: lax.Precision  # precision of the weight-build einsum (H @ T)

    @property
    def hv(self) -> int:          # virtual (upsampled) input extent
        return self.h * self.up

    @property
    def wv(self) -> int:
        return self.w * self.up

    @property
    def n_taps(self) -> int:      # kernel tap count (1 = plain hat)
        return 1 if self.taps is None else len(self.taps)

    @property
    def p0(self) -> int:          # upsample2d's leading pad (calibrated)
        return 0 if self.taps is None else (self.n_taps + self.up - 1) // 2

    @property
    def coord_shift(self) -> float:
        # s' = (s + p0 - up + 1) / up maps virtual-pixel coords to
        # stored-l units such that weight = up·K(up·(s' - l)).
        return float(self.p0 - self.up + 1)


def _hat(dist: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _flat_batch_indices(nti: int, n: int, ntj: int) -> jax.Array:
    """Batch index of each tile in the shared flat [NTI, N, NTJ] tile
    ordering (the load-bearing convention both the forward's and the
    transpose's scan/reshape pair rely on)."""
    return jnp.tile(jnp.repeat(jnp.arange(n, dtype=jnp.int32), ntj), (nti,))


@functools.lru_cache(maxsize=None)
def _filter_matrix(taps: Tuple[float, ...], up: int, B: int) -> np.ndarray:
    """Static banded matrix ``T[mi, b] = up·f[mi − up·b]`` mapping virtual
    taps (relative index mi in a window of ``Mv = up·(B−1) + n_taps``) to
    the window's ``B`` stored taps."""
    n_taps = len(taps)
    mv = up * (B - 1) + n_taps
    t = np.zeros((mv, B), dtype=np.float32)
    for b in range(B):
        t[up * b:up * b + n_taps, b] = np.asarray(taps, np.float32) * up
    return t


def _weights(spec: _Spec, sp, l0, B: int, axis_virtual_len: int) -> jax.Array:
    """Dense weight matrix between points and stored-plane taps.

    Args:
        sp: ``[..., P]`` point source coordinates in stored-l units (s').
        l0: ``[...]`` window base — absolute index of the first stored tap
            (f32 or int); the window's taps are ``l0 … l0+B−1`` (contiguous).
        B: window length (static).
        axis_virtual_len: virtual plane extent along this axis (``up·L``).
    Returns:
        ``[..., P, B]`` weights: plain hat when ``taps is None``, else the
        fused kernel ``up·Σ_j hat(up·(s'−l) − j)·f[j]`` with taps masked to
        the virtual plane (upfirdn2d's border crop).

    Fused form: rather than evaluating the n_taps-piece kernel directly
    (n_taps VPU passes over [P, B] — measured as the engine's bottleneck at
    the ADA call's 12-tap sym6 filter), factorize it exactly as

        w = H @ T,   H[p, mi] = hat(v_p − (m0 + mi)) · in_plane(m0 + mi),
                     T[mi, b] = up·f[mi − up·b]  (static, cached),

    with ``v = up·s' + c0``, ``m0 = up·l0 + c0`` (virtual window base): ONE
    hat evaluation over the up-resolved window plus a small static matmul
    on the MXU.  Algebraically identical (substitute ``j = mi − up·b``).
    """
    l0 = jnp.asarray(l0, jnp.float32)
    if spec.taps is None:
        labs = l0[..., None] + jnp.arange(B, dtype=jnp.float32)
        return _hat(sp[..., :, None] - labs[..., None, :])
    c0 = spec.up - 1 - spec.p0   # virtual tap base: m = up·l + c0 + j
    mv = spec.up * (B - 1) + spec.n_taps
    t_mat = jnp.asarray(_filter_matrix(spec.taps, spec.up, B))
    v = spec.up * sp + float(c0)                              # [..., P]
    m_abs = (spec.up * l0 + float(c0))[..., None] \
        + jnp.arange(mv, dtype=jnp.float32)                   # [..., Mv]
    in_plane = ((m_abs >= 0.0)
                & (m_abs < float(axis_virtual_len))).astype(jnp.float32)
    h = _hat(v[..., :, None] - m_abs[..., None, :]) \
        * in_plane[..., None, :]                              # [..., P, Mv]
    # Weight fidelity wants ~f32 (HIGH, the default); DEFAULT (single-pass
    # bf16) costs ~0.4% relative weight error — noise-level against ADA's
    # own corruptions (σ=0.1 noise stage) and sweepable per geometry
    # ('weight_precision' in WARP_TUNE) where the transpose's [Q, Mv]
    # weight build dominates.
    return jnp.einsum('...pm,mb->...pb', h, t_mat, precision=spec.wprec)


def _support(spec: _Spec) -> Tuple[float, float]:
    """Stored-l support of the kernel around s': contributing taps satisfy
    ``s' - lo < l < s' + hi``."""
    # u = up·(s' − l) ∈ (−1, n_taps) ⇒ l ∈ (s' − n_taps/up, s' + 1/up)
    return spec.n_taps / spec.up, 1.0 / spec.up


def _source_coords(spec: _Spec, theta, hp: int, wp: int):
    """Stored-l-unit source coordinates of every (padded-)output pixel.

    align_corners=False over the *virtual* plane: normalized ±1 ↦ outer
    pixel edges of the ``up·L`` extent; then shifted into stored-l units.
    Returns ``spx, spy`` of shape ``[N, hp, wp]`` (f32).
    """
    xo = (2.0 * jnp.arange(wp, dtype=jnp.float32) + 1.0) / spec.out_w - 1.0
    yo = (2.0 * jnp.arange(hp, dtype=jnp.float32) + 1.0) / spec.out_h - 1.0
    xx = jnp.broadcast_to(xo[None, :], (hp, wp))
    yy = jnp.broadcast_to(yo[:, None], (hp, wp))
    a = theta[:, None, None, :, :]  # [N,1,1,2,3]
    sx = ((a[..., 0, 0] * xx + a[..., 0, 1] * yy + a[..., 0, 2]) + 1.0) \
        * (spec.wv * 0.5) - 0.5
    sy = ((a[..., 1, 0] * xx + a[..., 1, 1] * yy + a[..., 1, 2]) + 1.0) \
        * (spec.hv * 0.5) - 0.5
    shift = spec.coord_shift
    inv = 1.0 / spec.up
    return (sx + shift) * inv, (sy + shift) * inv


# --------------------------- forward (sampling) ---------------------------

def _chunked_scan(tile_fn, xs_flat, n_tiles: int, chunk: int):
    """Map ``tile_fn`` over a flat tile list in chunks of ``chunk`` tiles
    per ``lax.scan`` step (tiles within a chunk are vmapped).

    One tile per scan step serializes hundreds of tiny
    DMA→VPU→MXU→VPU rounds and the step latency dominates the kernel
    (measured 5× slower than the same FLOPs chunked); chunking batches the
    window DMAs and gives the MXU full-size batched contractions.  The tail
    chunk is padded with duplicates of tile 0 and the padding dropped.
    """
    n_chunks = -(-n_tiles // chunk)
    pad = n_chunks * chunk - n_tiles

    def pad_chunk(a):
        if pad:
            a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    xs = tuple(pad_chunk(a) for a in xs_flat)

    def one_chunk(_, args):
        return _, jax.vmap(tile_fn)(*args)

    _, out = lax.scan(one_chunk, 0, xs)
    out = out.reshape((n_chunks * chunk,) + out.shape[2:])
    return out[:n_tiles] if pad else out


def _warp_tiled(spec: _Spec, x, theta):
    """Output-tiled dense sampling: [N,H,W,C] f32 → [N,out_h,out_w,C]."""
    n, h, w, c = spec.n, spec.h, spec.w, spec.c
    tile = spec.tile
    bh = min(spec.block, h)
    bw = min(spec.block, w)
    nti = -(-spec.out_h // tile)
    ntj = -(-spec.out_w // tile)
    hp, wp = nti * tile, ntj * tile
    p = tile * tile
    lo, _ = _support(spec)

    spx, spy = _source_coords(spec, theta, hp, wp)

    # Flat tile list ordered [NTI, N, NTJ] (kept from the row-scan layout so
    # the inverse reshape below stays simple).
    def tiles_of(s):
        t = s.reshape(n, nti, tile, ntj, tile)
        return t.transpose(1, 0, 3, 2, 4).reshape(nti * n * ntj, p)

    sx_t, sy_t = tiles_of(spx), tiles_of(spy)
    # Window origins per tile: lowest contributing tap is
    # floor(min s' − lo) + 1 (affine ⇒ the extremes sit at tile corners,
    # but min over all P points is just as cheap and more robust).
    w0 = jnp.clip(jnp.floor(jnp.min(sx_t, axis=-1) - lo).astype(jnp.int32)
                  + 1, 0, w - bw)                             # [T]
    h0 = jnp.clip(jnp.floor(jnp.min(sy_t, axis=-1) - lo).astype(jnp.int32)
                  + 1, 0, h - bh)
    bidx = _flat_batch_indices(nti, n, ntj)

    def one_tile(sx_r, sy_r, h0_s, w0_s, b):      # [P], [P], scalars
        blk = lax.dynamic_slice(x, (b, h0_s, w0_s, 0), (1, bh, bw, c))[0]
        wx = _weights(spec, sx_r[None], w0_s[None], bw, spec.wv)[0]
        wy = _weights(spec, sy_r[None], h0_s[None], bh, spec.hv)[0]
        # Contract columns on the MXU, then rows on the VPU.
        z = jnp.einsum('pw,hwc->phc', wx, blk,
                       precision=spec.precision)  # [P, bh, C]
        return jnp.einsum('ph,phc->pc', wy, z,
                          precision=spec.precision)  # [P, C]

    rows = _chunked_scan(one_tile, (sx_t, sy_t, h0, w0, bidx),
                         nti * n * ntj, min(spec.chunk, nti * n * ntj))
    out = rows.reshape(nti, n, ntj, tile, tile, c)
    out = out.transpose(1, 0, 3, 2, 4, 5).reshape(n, hp, wp, c)
    return out[:, :spec.out_h, :spec.out_w]


# -------------------- transpose (gather-side splatting) --------------------

def _warp_transpose_tiled(spec: _Spec, g, theta):
    """Adjoint wrt x, input-tiled: [N,out_h,out_w,C] f32 → [N,H,W,C] f32.

    Input tiles partition the plane, so every per-tile result is written
    disjointly (a reshape, not a scatter).  The output-plane window feeding
    one input tile is located by mapping the tile's support-expanded corners
    through the inverse of the (virtual) pixel-space affine.
    """
    n, h, w, c = spec.n, spec.h, spec.w, spec.c
    tile = spec.tile_t
    out_h, out_w = spec.out_h, spec.out_w
    gbh = min(spec.block_t, out_h)
    gbw = min(spec.block_t, out_w)
    nti = -(-h // tile)
    ntj = -(-w // tile)
    hip, wip = nti * tile, ntj * tile
    q = gbh * gbw
    lo, hi = _support(spec)

    # Source coords of the *actual* output grid — shared formula with the
    # forward, so the adjoint weights match the forward weights exactly.
    spx, spy = _source_coords(spec, theta, out_h, out_w)

    # Virtual-pixel-space affine s_pix = A_pix · p_pix + b_pix, from the
    # normalized theta (out pixel (xo,yo) → virtual in pixel (sx,sy));
    # inverted, it maps input-tile corners back to output-plane positions.
    hv, wv = spec.hv, spec.wv
    axx = theta[:, 0, 0] * (wv / out_w)
    axy = theta[:, 0, 1] * (wv / out_h)
    ayx = theta[:, 1, 0] * (hv / out_w)
    ayy = theta[:, 1, 1] * (hv / out_h)
    bx = ((theta[:, 0, 0] * (1.0 / out_w - 1.0)
           + theta[:, 0, 1] * (1.0 / out_h - 1.0) + theta[:, 0, 2]) + 1.0) \
        * (wv * 0.5) - 0.5
    by = ((theta[:, 1, 0] * (1.0 / out_w - 1.0)
           + theta[:, 1, 1] * (1.0 / out_h - 1.0) + theta[:, 1, 2]) + 1.0) \
        * (hv * 0.5) - 0.5
    det = axx * ayy - axy * ayx
    # Guard (near-)singular thetas: a degenerate affine collapses the image
    # to a line, so any clamped window is as good as another — keep the
    # corner math finite instead of propagating inf/NaN into the int32
    # window origins (gather grid_sample degrades gracefully here too).
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12),
                    det)
    ixx, ixy = ayy / det, -axy / det
    iyx, iyy = -ayx / det, axx / det

    # Stored-tile corner coords expanded to the kernel support, expressed in
    # VIRTUAL pixel units (the inverse affine's domain): a tap at stored l
    # is touched by points with s' ∈ (l − hi, l + lo), i.e. virtual
    # s ∈ (up·(l − hi) − shift, up·(l + lo) − shift).
    shift = spec.coord_shift
    k0f = (jnp.arange(nti, dtype=jnp.float32) * tile)
    l0f = (jnp.arange(ntj, dtype=jnp.float32) * tile)
    up = float(spec.up)
    ky = jnp.stack([up * (k0f - hi) - shift,
                    up * (k0f + tile - 1 + lo) - shift], -1)   # [nti, 2]
    lx = jnp.stack([up * (l0f - hi) - shift,
                    up * (l0f + tile - 1 + lo) - shift], -1)   # [ntj, 2]

    def corners(cx, cy):
        # [N, nti, ntj, 2(kcorner), 2(lcorner)]
        return (cx[:, None, None, None, None]
                * (lx[None, None, :, None, :] - bx[:, None, None, None, None])
                + cy[:, None, None, None, None]
                * (ky[None, :, None, :, None] - by[:, None, None, None, None]))

    v = corners(ixx, ixy)   # output col of each input corner
    u = corners(iyx, iyy)   # output row
    v0 = jnp.clip(jnp.floor(jnp.min(v, axis=(-1, -2))).astype(jnp.int32),
                  0, out_w - gbw)                          # [N, nti, ntj]
    u0 = jnp.clip(jnp.floor(jnp.min(u, axis=(-1, -2))).astype(jnp.int32),
                  0, out_h - gbh)

    u0_t = u0.transpose(1, 0, 2).reshape(-1)     # flat [NTI·N·NTJ]
    v0_t = v0.transpose(1, 0, 2).reshape(-1)
    bidx = _flat_batch_indices(nti, n, ntj)
    k0_t = jnp.repeat(jnp.arange(nti, dtype=jnp.int32) * tile, n * ntj)
    l0_t = jnp.tile(jnp.arange(ntj, dtype=jnp.int32) * tile, (nti * n,))

    def one_tile(u0_s, v0_s, b, krow, lcol):
        g_w = lax.dynamic_slice(g, (b, u0_s, v0_s, 0),
                                (1, gbh, gbw, c))[0].reshape(q, c)
        sx_w = lax.dynamic_slice(spx, (b, u0_s, v0_s),
                                 (1, gbh, gbw))[0].reshape(q)
        sy_w = lax.dynamic_slice(spy, (b, u0_s, v0_s),
                                 (1, gbh, gbw))[0].reshape(q)
        wy = _weights(spec, sy_w[None], krow[None], tile, spec.hv)[0]
        wx = _weights(spec, sx_w[None], lcol[None], tile, spec.wv)[0]
        zq = wx[:, :, None] * g_w[:, None, :]          # [Q, tile, C]
        return jnp.einsum('qk,qlc->klc', wy, zq,
                          precision=spec.precision)    # [tile, tile, C]

    n_tiles = nti * n * ntj
    rows = _chunked_scan(one_tile, (u0_t, v0_t, bidx, k0_t, l0_t),
                         n_tiles, min(spec.chunk_t, n_tiles))
    dx = rows.reshape(nti, n, ntj, tile, tile, c)
    dx = dx.transpose(1, 0, 3, 2, 4, 5).reshape(n, hip, wip, c)
    return dx[:, :h, :w]


def _warp_transpose_outtiled(spec: _Spec, g, theta):
    """EXACT adjoint of ``_warp_tiled``, output-tiled: [N,out_h,out_w,C] f32
    → [N,H,W,C] f32.

    Walks the forward's own tile list — same windows (h0/w0), same weight
    matrices — and per output tile computes the adjoint of its two
    contractions, ``dX_window[h,w,c] = Σ_p wy[p,h]·wx[p,w]·g[p,c]``, then
    accumulates the (overlapping) windows into the input plane with a
    sequential in-place dynamic-update-slice scan.

    The structural win over the input-tiled transpose
    (``_warp_transpose_tiled``): it is the adjoint of the clamped-window
    forward BY CONSTRUCTION — whatever taps the forward computed get their
    exact cotangents, for EVERY theta.  The transpose-side coverage
    contract (``block_t`` windows, measured 0.87% violation rate at p=1 —
    see module docstring) simply does not apply; nothing is ever dropped.

    Per-tile work is the forward's P = tile² weight rows instead of the
    input-tiled q = block_t² window rows (1024 vs 25600 at the production
    tune): ~13× fewer weight evaluations and contraction FLOPs — but the
    serial window-accumulation pass dominates on v5e and the engine
    measures ~20-30% slower end-to-end than ``in`` (numbers in the module
    docstring), so it is opt-in (``MGT_WARP_ADJOINT=out``): the exactness
    option, not the speed option.
    """
    n, h, w, c = spec.n, spec.h, spec.w, spec.c
    tile = spec.tile
    bh = min(spec.block, h)
    bw = min(spec.block, w)
    nti = -(-spec.out_h // tile)
    ntj = -(-spec.out_w // tile)
    hp, wp = nti * tile, ntj * tile
    p = tile * tile
    lo, _ = _support(spec)

    spx, spy = _source_coords(spec, theta, hp, wp)

    def tiles_of(s):
        t = s.reshape(n, nti, tile, ntj, tile)
        return t.transpose(1, 0, 3, 2, 4).reshape(nti * n * ntj, p)

    sx_t, sy_t = tiles_of(spx), tiles_of(spy)
    w0 = jnp.clip(jnp.floor(jnp.min(sx_t, axis=-1) - lo).astype(jnp.int32)
                  + 1, 0, w - bw)
    h0 = jnp.clip(jnp.floor(jnp.min(sy_t, axis=-1) - lo).astype(jnp.int32)
                  + 1, 0, h - bh)
    bidx = _flat_batch_indices(nti, n, ntj)

    # adjoint of the forward's trailing slice: zero-pad g to the tile grid
    g = jnp.pad(g, ((0, 0), (0, hp - spec.out_h), (0, wp - spec.out_w),
                    (0, 0)))
    g_t = (g.reshape(n, nti, tile, ntj, tile, c)
           .transpose(1, 0, 3, 2, 4, 5).reshape(nti * n * ntj, p, c))

    def one_tile(sx_r, sy_r, h0_s, w0_s, g_r):  # [P], [P], scalars, [P,C]
        wx = _weights(spec, sx_r[None], w0_s[None], bw, spec.wv)[0]
        wy = _weights(spec, sy_r[None], h0_s[None], bh, spec.hv)[0]
        # adjoint of (einsum('pw,hwc->phc') ∘ einsum('ph,phc->pc')):
        zq = wx[:, :, None] * g_r[:, None, :]            # [P, bw, C]
        return jnp.einsum('ph,pwc->hwc', wy, zq,
                          precision=spec.precision)      # [bh, bw, C]

    n_tiles = nti * n * ntj
    dwins = _chunked_scan(one_tile, (sx_t, sy_t, h0, w0, g_t),
                          n_tiles, min(spec.chunk, n_tiles))

    # Accumulation: windows of the SAME sample can overlap under any theta
    # (they track the source region), so same-plane updates must serialize —
    # but a scan of one slice-add per step is LATENCY-bound (~19 µs/step
    # measured, the reason the round-2 scatter-add lost).  Bucket the tiles
    # round-robin over K independent accumulator planes carried as a TUPLE:
    # the K in-place updates inside one scan step touch K different buffers,
    # so XLA overlaps them, cutting the serial chain K× for K-1 extra plane
    # reductions at the end.  K is sweepable at trace time.
    lanes = max(1, int(os.environ.get('MGT_WARP_ACC_LANES', '8')))
    n_steps = -(-n_tiles // lanes)
    pad = n_steps * lanes - n_tiles

    def lane_shape(a, fill):
        if pad:
            filler = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, filler])
        return a.reshape((n_steps, lanes) + a.shape[1:])

    # zero windows at origin (0,0,0) pad harmlessly: they add zeros
    wins_r = lane_shape(dwins, 0)
    h0_r = lane_shape(h0, 0)
    w0_r = lane_shape(w0, 0)
    b_r = lane_shape(bidx, 0)

    def acc(carry, args):
        wins, h0s, w0s, bs = args
        out = []
        for k in range(lanes):
            dxk = carry[k]
            start = (bs[k], h0s[k], w0s[k], 0)
            cur = lax.dynamic_slice(dxk, start, (1, bh, bw, c))
            out.append(lax.dynamic_update_slice(dxk, cur + wins[k][None],
                                                start))
        return tuple(out), None

    carry0 = tuple(jnp.zeros((n, h, w, c), jnp.float32)
                   for _ in range(lanes))
    carry, _ = lax.scan(acc, carry0, (wins_r, h0_r, w0_r, b_r))
    dx = carry[0]
    for k in range(1, lanes):
        dx = dx + carry[k]
    return dx


def _adjoint_impl():
    """``MGT_WARP_ADJOINT``: ``in`` (input-tiled transpose with
    the measured block_t coverage contract) | ``out``
    (exact adjoint of the tiled forward for every theta, ~27% slower bwd
    than ``in`` in the XLA engine).  Read at trace time.  Ignored when the
    Mosaic engine is active (its transpose is always the exact adjoint)."""
    return os.environ.get('MGT_WARP_ADJOINT', 'in')


def _use_mosaic_engine() -> bool:
    """``MGT_WARP_ENGINE``: ``mosaic`` | ``xla`` | ``auto`` (default).

    ``mosaic`` routes the tiled forward AND its transpose through the
    hand-scheduled Pallas kernels (ops/pallas/warp_kernel.py): VMEM-resident
    weight build + contractions, double-buffered window DMA, and an
    always-exact adjoint (window cotangents accumulate in a VMEM-resident
    plane, so the ``in`` engine's coverage contract disappears).  ``auto``
    picks mosaic on TPU backends (measured faster at every production ADA
    geometry on v5e — see docs/PERF.md r5) and the XLA engine elsewhere
    (CPU tests run the kernels via interpret mode explicitly).  Read at
    trace time."""
    eng = os.environ.get('MGT_WARP_ENGINE', 'auto')
    if eng == 'mosaic':
        return True
    if eng == 'xla':
        return False
    return _MOSAIC_AUTO and jax.default_backend() == 'tpu'


# auto-engine resolution on TPU backends: True since the Mosaic kernels
# measured 33.6 vs 69.1 ms fwd+bwd against the XLA engine at the 256-px
# production ADA shape with an always-exact adjoint
# (docs/PERF.md r5 "Mosaic warp engine")
_MOSAIC_AUTO = True


# ----------------------- mutually-adjoint vjp pair ------------------------

def _mosaic_dtype():
    """``MGT_WARP_MOSAIC_DTYPE``: ``bfloat16`` (default — the production
    single-pass operating point, same error class as the XLA engine's
    ``precision/weight_precision = DEFAULT`` on TPU) | ``float32`` (exact
    algorithm checks in tests)."""
    return jnp.dtype(os.environ.get('MGT_WARP_MOSAIC_DTYPE', 'bfloat16'))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _warp(spec: _Spec, x, theta):
    if _use_mosaic_engine():
        from .pallas.warp_kernel import warp_forward_pallas
        return warp_forward_pallas(x, theta, spec.out_h, spec.out_w,
                                   tile=spec.tile, block=spec.block,
                                   up=spec.up, taps=spec.taps,
                                   compute_dtype=_mosaic_dtype())
    return _warp_tiled(spec, x, theta)


def _warp_fwd(spec, x, theta):
    return _warp(spec, x, theta), theta


def _warp_bwd(spec, theta, g):
    return _warpT(spec, g.astype(jnp.float32), theta), jnp.zeros_like(theta)


_warp.defvjp(_warp_fwd, _warp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _warpT(spec: _Spec, g, theta):
    if _use_mosaic_engine():
        from .pallas.warp_kernel import warp_transpose_pallas
        return warp_transpose_pallas(g, theta, spec.h, spec.w,
                                     tile=spec.tile, block=spec.block,
                                     up=spec.up, taps=spec.taps,
                                     compute_dtype=_mosaic_dtype())
    if _adjoint_impl() == 'in':
        return _warp_transpose_tiled(spec, g, theta)
    return _warp_transpose_outtiled(spec, g, theta)


def _warpT_fwd(spec, g, theta):
    return _warpT(spec, g, theta), theta


def _warpT_bwd(spec, theta, dd):
    # transpose of the transpose = the forward sampling, applied to dd
    return _warp(spec, dd.astype(jnp.float32), theta), jnp.zeros_like(theta)


_warpT.defvjp(_warpT_fwd, _warpT_bwd)


# --------------------------- coverage contract ----------------------------

def coverage_excess(theta: jax.Array, in_h: int, in_w: int,
                    out_h: int, out_w: int, *,
                    tile: int = 32, block: int = 128,
                    tile_t: Optional[int] = None,
                    block_t: Optional[int] = None,
                    up: int = 1, n_taps: int = 1) -> Tuple[jax.Array,
                                                           jax.Array]:
    """Per-sample coverage-bound excess of both warp directions (≤ 0 = the
    engine's windows provably cover every tile's footprint; > 0 = some
    window MAY clamp and drop taps/cotangent mass — see the module
    docstring's coverage contract).

    The check is position-independent (the footprint *span* of an affine
    map is the same for every tile) and uses the integer-grid worst case
    over fractional positions, so it can only overcount violations, never
    miss one.  Works on numpy or traced arrays (pure jnp math, [N] out) —
    shared by the measurement test (tests/test_affine_warp.py) and the
    optional runtime guard at the ADA call site (training/augment.py,
    ``MGT_WARP_GUARD``).

    Args mirror ``affine_warp``; ``n_taps`` is ``len(up_filter)`` (1 for
    the plain bilinear hat).  Returns ``(fwd_excess, bwd_excess)`` in
    stored-tap / cotangent-row units respectively.
    """
    tile_t = tile_t or tile
    block_t = block_t or block
    lo = n_taps / up
    hi = 1.0 / up
    hv, wv = in_h * up, in_w * up
    bw, bh = min(block, in_w), min(block, in_h)
    gbh, gbw = min(block_t, out_h), min(block_t, out_w)
    theta = jnp.asarray(theta, jnp.float32)
    a = jnp.abs(theta)

    # Forward: source-footprint span of one output tile, in stored units.
    # d(sx_stored)/d(out_px_x) = a00·wv/(up·out_w) etc. (_source_coords).
    sx_span = (a[:, 0, 0] * wv / out_w + a[:, 0, 1] * wv / out_h) \
        * (tile - 1) / up
    sy_span = (a[:, 1, 0] * hv / out_w + a[:, 1, 1] * hv / out_h) \
        * (tile - 1) / up
    # taps needed ≤ span + lo + hi + 1 (integer-grid worst case); a window
    # that already covers the whole plane (bw == in_w) cannot clamp
    fwd = jnp.maximum(
        jnp.where(bw < in_w, sx_span + lo + hi + 1.0 - bw, 0.0),
        jnp.where(bh < in_h, sy_span + lo + hi + 1.0 - bh, 0.0))

    # Transpose: output-plane span (pixels) of the preimage of one
    # support-expanded input tile, via the inverse pixel-space Jacobian.
    jxx = theta[:, 0, 0] * wv / (up * out_w)
    jxy = theta[:, 0, 1] * wv / (up * out_h)
    jyx = theta[:, 1, 0] * hv / (up * out_w)
    jyy = theta[:, 1, 1] * hv / (up * out_h)
    det = jxx * jyy - jxy * jyx
    det = jnp.where(jnp.abs(det) < 1e-12,
                    jnp.where(det < 0, -1e-12, 1e-12), det)
    span = tile_t - 1 + lo + hi   # stored units, both axes
    need_x = (jnp.abs(jyy / det) + jnp.abs(jxy / det)) * span + 1.0
    need_y = (jnp.abs(jyx / det) + jnp.abs(jxx / det)) * span + 1.0
    bwd = jnp.maximum(
        jnp.where(gbw < out_w, need_x - gbw, 0.0),
        jnp.where(gbh < out_h, need_y - gbh, 0.0))
    return fwd, bwd


# ------------------------------- public op --------------------------------

def affine_warp(x: jax.Array, theta: jax.Array, out_h: int, out_w: int,
                *, tile: int = 32, block: int = 128,
                tile_t: Optional[int] = None, block_t: Optional[int] = None,
                chunk: int = 64, chunk_t: int = 16,
                up: int = 1, up_filter=None,
                precision: lax.Precision = lax.Precision.HIGH,
                weight_precision: lax.Precision = lax.Precision.HIGH
                ) -> jax.Array:
    """Bilinear-sample NHWC ``x`` (optionally through a virtual ``up``×
    FIR upsample) on the affine grid of ``theta``.

    Args:
        x: ``[N, H, W, C]`` input images.
        theta: ``[N, 2, 3]`` inverse transforms in the normalized
            ``affine_grid`` convention (output coords → input coords), over
            the *virtual* ``[up·H, up·W]`` plane when ``up > 1``.
        out_h, out_w: output spatial size.
        tile / block: forward output-tile and input-window edges.
        tile_t / block_t: transpose input-tile and cotangent-window edges
            (default: same as tile/block).
        chunk / chunk_t: tiles per scan step in the forward / transpose
            (throughput vs. transient-memory knob; see _chunked_scan).
        up, up_filter: when ``up > 1``, the result equals
            ``affine_warp(upsample2d(x, up_filter, up), theta, ...)``
            exactly, computed at 1× resolution (see module docstring).
        precision: matmul precision for the image contractions.  ``HIGH``
            (3-pass bf16) keeps ~fp32 accuracy; use ``HIGHEST`` for
            bit-parity tests against the gather reference.
        weight_precision: precision of the weight-build matmul (H @ T,
            see ``_weights``) — ``HIGH`` default; ``DEFAULT`` trades
            ~0.4% relative weight error for a single-pass matmul.
    Returns:
        ``[N, out_h, out_w, C]``, exactly ``grid_sample(x_up,
        affine_grid(...))`` within the coverage contract.
    """
    n, h, w, c = x.shape
    theta = lax.stop_gradient(theta.astype(jnp.float32))
    taps = None
    if up > 1:
        assert up_filter is not None, 'up > 1 requires up_filter taps'
        f = np.asarray(up_filter, dtype=np.float64)
        assert f.ndim == 1, 'fused upsample requires a separable 1-D filter'
        taps = tuple(float(v) for v in f)
    else:
        assert up_filter is None, 'up_filter requires up > 1 (a filter ' \
            'with up=1 would be silently ignored)'
    spec = _Spec(n, h, w, c, out_h, out_w, tile, block,
                 tile_t or tile, block_t or block, chunk, chunk_t,
                 up, taps, precision, weight_precision)
    if min(spec.block, h) >= h and min(spec.block, w) >= w:
        # Tiny canvas: one full-input window, no slicing machinery.
        return _warp_full(spec, x, theta)
    out = _warp(spec, x.astype(jnp.float32), theta)
    return out.astype(x.dtype)


def _warp_full(spec: _Spec, x, theta) -> jax.Array:
    """Whole-input dense warp for canvases at or below the block size."""
    n, h, w, c = spec.n, spec.h, spec.w, spec.c
    out_h, out_w = spec.out_h, spec.out_w
    spx, spy = _source_coords(spec, theta, out_h, out_w)
    p = out_h * out_w
    wx = _weights(spec, spx.reshape(n, p), jnp.zeros((1,)), w, spec.wv)
    wy = _weights(spec, spy.reshape(n, p), jnp.zeros((1,)), h, spec.hv)
    z = jnp.einsum('npw,nhwc->nphc', wx, x.astype(jnp.float32),
                   precision=spec.precision)
    out = jnp.einsum('nph,nphc->npc', wy, z, precision=spec.precision)
    return out.reshape(n, out_h, out_w, -1).astype(x.dtype)
