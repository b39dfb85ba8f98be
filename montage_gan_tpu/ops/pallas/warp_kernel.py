"""Mosaic (Pallas TPU) engine for the dense affine warp: forward sampling and
the EXACT transpose, as hand-scheduled VMEM-resident kernels.

Same op contract as the XLA-composed engine in ``ops/affine_warp.py`` (the
ADA geometric branch's ``grid_sample(upsample2d(x), affine_grid(theta))``,
reference ``training/augment.py:331-339`` / ``torch_utils/ops/
grid_sample_gradfix.py:28``), with two structural differences:

* **Forward** (``warp_forward_pallas``): one grid step per output tile; the
  data-dependent input window is DMA'd HBM→VMEM inside the kernel (double-
  buffered across grid steps), the fused-upsample weight matrices are built
  in VMEM (hat evaluation on the VPU + the static filter-matrix contraction
  on the MXU, single-pass bf16 — the r4 ``weight_precision=DEFAULT`` sweep
  winner), and the sampling contractions run back-to-back on the MXU with
  no HBM round-trips for any intermediate.  The XLA engine leaves ~85% of
  the MXU idle on these shapes (18.5 ms measured at the 256-px ADA shape
  ≈ 13% of bf16 peak); this kernel exists to close that gap.

* **Transpose** (``warp_transpose_pallas``): the adjoint of the tiled
  forward BY CONSTRUCTION — it walks the forward's own tile list (same
  precomputed windows, same weight math) and accumulates each tile's
  window cotangent into a per-sample plane that stays resident in VMEM for
  the whole sample (the kernel's output block, revisited across the
  sample's grid steps).  Overlapping windows therefore accumulate at VPU
  speed with no serialized dynamic-update-slice chain — the exact thing
  that made the XLA ``out`` engine lose to the approximate ``in`` engine
  (ops/affine_warp.py ``_warp_transpose_outtiled``: measured ~19 µs per
  serialized slice-add).  Exact for EVERY theta: the transpose-side
  coverage contract of the ``in`` engine does not apply here.

Layout design (the part that makes it fast — and satisfies Mosaic's DMA
tiling rules, which require slice offsets/shapes on the sublane dim to be
multiples of 8 and on the lane dim multiples of 128):

* the image plane is addressed as ``[N, H, W·C]`` — W and C packed into the
  lane dimension in their native NHWC interleave.  A window's lane offset
  is ``w0·C``, so for C=4 the window origin only needs 32-alignment in
  W units (vs 128 for a channel-planar layout), and window slices are
  ``[bh, bw·C]`` with ``bw·C`` a lane-tile multiple;
* the y-contraction runs FIRST as one matmul over all channels at once
  (``wy[P,bh] @ win[bh, bw·C]``), then the x-weights are lane-expanded to
  the (w, c) interleave by a static 0/1 expansion matmul and the channel
  sums extracted with a static selector matmul — no per-channel loop, no
  strided lane access anywhere;
* window origins are floored to the alignment grid and windows widened by
  one grid step; taps outside the true plane get zero weight from the
  in-plane mask, so alignment changes nothing semantically;
* forward and transpose read the SAME precomputed per-tile origins, which
  makes the transpose the exact adjoint of the forward irrespective of
  floating-point corner details;
* all heavy matmuls are bf16×bf16 (``compute_dtype``; tests run float32 to
  pin the algorithm separately from the production operating point).

The weight mathematics is shared with the XLA engine (``_filter_matrix``,
support/coord conventions imported from ``ops.affine_warp``), so the two
engines agree to matmul rounding.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(a: int, m: int) -> int:
    return -(-a // m) * m


# ---------------------------------------------------------------------------
# Static geometry shared by both kernels (and with the XLA engine)
# ---------------------------------------------------------------------------

class _Geom:
    """Static tiling geometry for one (shapes, tune) combination."""

    def __init__(self, n: int, h: int, w: int, c: int, out_h: int, out_w: int,
                 tile: int, block: int, up: int,
                 taps: Optional[Tuple[float, ...]],
                 compute_dtype=jnp.bfloat16):
        self.compute_dtype = compute_dtype
        self.n, self.h, self.w, self.c = n, h, w, c
        self.out_h, self.out_w = out_h, out_w
        self.tile = tile
        self.up = up
        # taps=None (plain bilinear hat) is exactly the 1-tap box filter at
        # up=1 in the fused-kernel algebra (K == hat) — single code path.
        self.taps = taps if taps is not None else (1.0,)
        self.n_taps = len(self.taps)

        # Mosaic DMA/vector slices of tiled buffers must be tile-aligned:
        # sublane (dim -2) offsets and shapes in multiples of 8, lane
        # (dim -1) in multiples of 128.  With (W, C) packed into lanes the
        # W-unit alignment grid is 128/gcd(128, C) — 32 for RGBA.
        self.ah = 8
        self.aw = 128 // math.gcd(128, c)
        bh = min(block, h)
        bw = min(block, w)
        self.h_pad = _rup(h, self.ah)
        self.w_pad = _rup(max(w, self.aw), self.aw)
        self.bh = self.h_pad if bh >= h else min(
            _rup(bh + self.ah - 1, self.ah), self.h_pad)
        self.bw = self.w_pad if bw >= w else min(
            _rup(bw + self.aw - 1, self.aw), self.w_pad)
        self.nti = -(-out_h // tile)
        self.ntj = -(-out_w // tile)
        self.hp = self.nti * tile
        self.wp = self.ntj * tile
        self.p = tile * tile
        self.tps = self.nti * self.ntj            # tiles per sample
        # fused-upsample coordinate conventions (ops/affine_warp.py _Spec)
        self.p0 = (self.n_taps + up - 1) // 2 if self.n_taps > 1 else 0
        self.coord_shift = float(self.p0 - up + 1)
        self.c0 = up - 1 - self.p0
        self.lo = self.n_taps / up                # kernel support below s'
        self.mv_y = up * (self.bh - 1) + self.n_taps
        self.mv_x = up * (self.bw - 1) + self.n_taps


def _filter_matrix(taps, up, B) -> np.ndarray:
    from ..affine_warp import _filter_matrix as fm
    return fm(tuple(float(t) for t in taps), up, B)


def _selector(g: _Geom) -> np.ndarray:
    """Static ``[bw·C, C]`` 0/1 matrix extracting per-channel sums from the
    (w, c)-interleaved lane axis."""
    s = np.zeros((g.bw * g.c, g.c), np.float32)
    for wc in range(g.bw * g.c):
        s[wc, wc % g.c] = 1.0
    return s


def _expander(g: _Geom) -> np.ndarray:
    """Static ``[bw, bw·C]`` 0/1 matrix element-repeating each w-lane C
    times — the (w, c) interleave of the packed image lanes.  (A matmul
    because ``pltpu.repeat`` is a TILE repeat, x[i % n], not an element
    repeat.)"""
    e = np.zeros((g.bw, g.bw * g.c), np.float32)
    for w in range(g.bw):
        e[w, w * g.c:(w + 1) * g.c] = 1.0
    return e


def _perm_blocked_to_interleaved(g: _Geom) -> np.ndarray:
    """Static ``[C·bw, bw·C]`` permutation: channel-blocked columns
    ``c·bw + w`` → NHWC-interleaved ``w·C + c``."""
    p = np.zeros((g.c * g.bw, g.bw * g.c), np.float32)
    for cc in range(g.c):
        for w in range(g.bw):
            p[cc * g.bw + w, w * g.c + cc] = 1.0
    return p


def _affine_coeffs(g: _Geom, theta: jax.Array) -> jax.Array:
    """Per-sample stored-l-unit affine ``s'(u, v) = A·(v, u) + B`` for the
    padded output grid — the closed form of ``affine_warp._source_coords``:

        sx' = Axx·v + Axy·u + Bx,   sy' = Ayx·v + Ayy·u + By

    Returns ``[N, 6]`` f32 rows ``(Axx, Axy, Bx, Ayx, Ayy, By)``.
    """
    wv = g.w * g.up
    hv = g.h * g.up
    a = theta.astype(jnp.float32)
    inv_up = 1.0 / g.up
    axx = a[:, 0, 0] * (wv / g.out_w) * inv_up
    axy = a[:, 0, 1] * (wv / g.out_h) * inv_up
    ayx = a[:, 1, 0] * (hv / g.out_w) * inv_up
    ayy = a[:, 1, 1] * (hv / g.out_h) * inv_up
    bx = (((a[:, 0, 0] * (1.0 / g.out_w - 1.0)
            + a[:, 0, 1] * (1.0 / g.out_h - 1.0) + a[:, 0, 2]) + 1.0)
          * (wv * 0.5) - 0.5 + g.coord_shift) * inv_up
    by = (((a[:, 1, 0] * (1.0 / g.out_w - 1.0)
            + a[:, 1, 1] * (1.0 / g.out_h - 1.0) + a[:, 1, 2]) + 1.0)
          * (hv * 0.5) - 0.5 + g.coord_shift) * inv_up
    return jnp.stack([axx, axy, bx, ayx, ayy, by], axis=-1)


def _tile_origins(g: _Geom, coeffs: jax.Array):
    """Aligned window origin (h0, w0) of every tile, flat (n, i, j) order.

    The footprint extremes of an affine map sit at tile corners; the raw
    base is ``clip(floor(min s' − lo) + 1, 0, pad − block)`` — the XLA
    engine's rule (affine_warp._warp_tiled) — then floored to the DMA
    alignment grid (coverage-preserving: _Geom widened the windows by one
    grid step, and ``pad − block`` is itself grid-aligned).  Computed once
    in XLA and read by BOTH kernels, which is what makes the transpose the
    exact adjoint of the forward irrespective of float corner details.
    """
    n = g.n
    oy = (jnp.arange(g.nti, dtype=jnp.float32) * g.tile)       # [nti]
    ox = (jnp.arange(g.ntj, dtype=jnp.float32) * g.tile)       # [ntj]
    uc = jnp.stack([oy, oy + (g.tile - 1)], -1)                # [nti, 2]
    vc = jnp.stack([ox, ox + (g.tile - 1)], -1)                # [ntj, 2]
    cf = coeffs.reshape(n, 1, 1, 1, 1, 6)
    u = uc.reshape(1, g.nti, 1, 2, 1)
    v = vc.reshape(1, 1, g.ntj, 1, 2)
    sx = cf[..., 0] * v + cf[..., 1] * u + cf[..., 2]          # [n,i,j,2,2]
    sy = cf[..., 3] * v + cf[..., 4] * u + cf[..., 5]
    min_sx = jnp.min(sx, axis=(-1, -2))
    min_sy = jnp.min(sy, axis=(-1, -2))
    w0 = jnp.clip(jnp.floor(min_sx - g.lo).astype(jnp.int32) + 1, 0,
                  max(g.w_pad - g.bw, 0))
    h0 = jnp.clip(jnp.floor(min_sy - g.lo).astype(jnp.int32) + 1, 0,
                  max(g.h_pad - g.bh, 0))
    h0 = (h0 // g.ah) * g.ah
    w0 = (w0 // g.aw) * g.aw
    return h0.reshape(-1), w0.reshape(-1)                      # [n·tps]


# ---------------------------------------------------------------------------
# In-kernel weight construction
# ---------------------------------------------------------------------------

def _point_coords(g: _Geom, coeffs_row, oy, ox, shape):
    """Stored-l source coords of the tile's P points as ``shape``-shaped
    arrays (either ``[P, 1]`` or ``[1, P]``), from flat-index iota."""
    dim = 0 if shape[1] == 1 else 1
    p_idx = lax.broadcasted_iota(jnp.int32, shape, dim)
    pu_i = p_idx // g.tile
    pv_i = p_idx - pu_i * g.tile
    u = pu_i.astype(jnp.float32) + oy
    v = pv_i.astype(jnp.float32) + ox
    sx = coeffs_row[0] * v + coeffs_row[1] * u + coeffs_row[2]
    sy = coeffs_row[3] * v + coeffs_row[4] * u + coeffs_row[5]
    return sx, sy


def _weights_pm(g: _Geom, sp, l0f, B, mv, t_ref, axis_virtual_len):
    """``[P, B]`` weight matrix (points on sublanes): hat matrix ``[P, Mv]``
    (VPU) then the static filter-matrix contraction (MXU, single-pass
    ``compute_dtype`` — the production ``weight_precision=DEFAULT``)."""
    mi = lax.broadcasted_iota(jnp.int32, (1, mv), 1).astype(jnp.float32)
    dv = g.up * (sp - l0f)                                     # [P, 1]
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(dv - mi))             # [P, Mv]
    m_abs = g.up * l0f + g.c0 + mi                             # [1, Mv]
    in_plane = ((m_abs >= 0.0) & (m_abs < axis_virtual_len))
    h = (hat * in_plane.astype(jnp.float32)).astype(g.compute_dtype)
    return jax.lax.dot_general(
        h, t_ref[:].astype(g.compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT).astype(g.compute_dtype)  # [P, B]


def _weights_mp(g: _Geom, sp, l0f, B, mv, t_t_ref, axis_virtual_len):
    """``[B, P]`` weight matrix (points on lanes) — the transposed
    orientation, built directly so the transpose kernel's contraction needs
    no in-VMEM transposition."""
    mi = lax.broadcasted_iota(jnp.int32, (mv, 1), 0).astype(jnp.float32)
    dv = g.up * (sp - l0f)                                     # [1, P]
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(dv - mi))             # [Mv, P]
    m_abs = g.up * l0f + g.c0 + mi                             # [Mv, 1]
    in_plane = ((m_abs >= 0.0) & (m_abs < axis_virtual_len))
    h = (hat * in_plane.astype(jnp.float32)).astype(g.compute_dtype)
    return jax.lax.dot_general(
        t_t_ref[:].astype(g.compute_dtype), h,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT).astype(g.compute_dtype)  # [B, P]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def warp_forward_pallas(x: jax.Array, theta: jax.Array, out_h: int,
                        out_w: int, *, tile: int, block: int, up: int,
                        taps: Optional[Tuple[float, ...]],
                        compute_dtype=jnp.bfloat16) -> jax.Array:
    """Tiled dense warp forward on the MXU: ``[N,H,W,C] → [N,out_h,out_w,C]``
    (f32 in/out; internals in ``compute_dtype``)."""
    n, h, w, c = x.shape
    g = _Geom(n, h, w, c, out_h, out_w, tile, block, up, taps,
              compute_dtype=compute_dtype)
    coeffs = _affine_coeffs(g, theta)
    h0s, w0s = _tile_origins(g, coeffs)
    tx = jnp.asarray(_filter_matrix(g.taps, g.up, g.bw))       # [Mv_x, bw]
    ty = jnp.asarray(_filter_matrix(g.taps, g.up, g.bh))       # [Mv_y, bh]
    sel = jnp.asarray(_selector(g))                            # [bw·C, C]
    exp = jnp.asarray(_expander(g))                            # [bw, bw·C]
    xp = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (0, g.h_pad - h), (0, g.w_pad - w), (0, 0)))
    x_packed = xp.reshape(n, g.h_pad, g.w_pad * c)
    bwc = g.bw * c

    hv = float(h * up)
    wv = float(w * up)
    tps = g.tps

    def kernel(coeffs_ref, h0_ref, w0_ref, tx_ref, ty_ref, sel_ref,
               exp_ref, x_ref, out_ref, xwin, sem):
        nb = pl.program_id(0)
        tj = pl.program_id(1)
        t = nb * tps + tj

        def dma(tt, slot):
            h0 = pl.multiple_of(h0_ref[tt], g.ah)
            w0l = pl.multiple_of(w0_ref[tt] * c, 128)
            return pltpu.make_async_copy(
                x_ref.at[tt // tps, pl.ds(h0, g.bh), pl.ds(w0l, bwc)],
                xwin.at[slot], sem.at[slot])

        @pl.when(t == 0)
        def _():
            dma(0, 0).start()

        @pl.when(t + 1 < g.n * tps)
        def _():
            dma(t + 1, (t + 1) % 2).start()

        dma(t, t % 2).wait()

        coeffs_row = [coeffs_ref[nb, k] for k in range(6)]
        oy = (tj // g.ntj) * g.tile
        ox = tj % g.ntj * g.tile
        sx, sy = _point_coords(g, coeffs_row, oy.astype(jnp.float32),
                               ox.astype(jnp.float32), (g.p, 1))
        h0f = h0_ref[t].astype(jnp.float32)
        w0f = w0_ref[t].astype(jnp.float32)
        wx = _weights_pm(g, sx, w0f, g.bw, g.mv_x, tx_ref, wv)  # [P, bw]
        wy = _weights_pm(g, sy, h0f, g.bh, g.mv_y, ty_ref, hv)  # [P, bh]

        # y-contraction over all channels at once: [P, bh] @ [bh, bw·C]
        z = jax.lax.dot_general(
            wy, xwin[t % 2],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)                 # [P, bw·C]
        # x-weights lane-expanded to the (w, c) interleave (static 0/1
        # expansion matmul), then the channel sums extracted with the
        # static selector matmul, producing the planar [C, P] block.
        wxe = jax.lax.dot_general(
            wx, exp_ref[:].astype(g.compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)                 # [P, bw·C]
        prod = (z * wxe).astype(g.compute_dtype)
        out_ref[0] = jax.lax.dot_general(
            sel_ref[:].astype(g.compute_dtype), prod,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)                 # [C, P]

    out_tiles = pl.pallas_call(
        kernel,
        grid=(n, tps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # coeffs
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h0s
            pl.BlockSpec(memory_space=pltpu.SMEM),             # w0s
            pl.BlockSpec(memory_space=pltpu.VMEM),             # tx
            pl.BlockSpec(memory_space=pltpu.VMEM),             # ty
            pl.BlockSpec(memory_space=pltpu.VMEM),             # selector
            pl.BlockSpec(memory_space=pltpu.VMEM),             # expander
            pl.BlockSpec(memory_space=pl.ANY),                 # x (HBM)
        ],
        out_specs=pl.BlockSpec(
            (1, c, g.p), lambda nb, tj: (nb * tps + tj, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * tps, c, g.p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, g.bh, bwc), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(coeffs, h0s, w0s, tx, ty, sel, exp, x_packed)

    out = out_tiles.reshape(n, g.nti, g.ntj, c, g.tile, g.tile)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(n, g.hp, g.wp, c)
    return out[:, :out_h, :out_w]


# ---------------------------------------------------------------------------
# Transpose kernel (exact adjoint of the forward)
# ---------------------------------------------------------------------------

def warp_transpose_pallas(gout: jax.Array, theta: jax.Array, in_h: int,
                          in_w: int, *, tile: int, block: int, up: int,
                          taps: Optional[Tuple[float, ...]],
                          compute_dtype=jnp.bfloat16) -> jax.Array:
    """Exact adjoint of ``warp_forward_pallas``: walks the forward's tile
    list (same precomputed windows and weight math) and accumulates every
    tile's window cotangent into a VMEM-resident per-sample plane.

    ``gout``: ``[N, out_h, out_w, C]`` cotangent of the forward output.
    Returns ``[N, in_h, in_w, C]`` f32.
    """
    n, out_h, out_w, c = gout.shape
    g = _Geom(n, in_h, in_w, c, out_h, out_w, tile, block, up, taps,
              compute_dtype=compute_dtype)
    coeffs = _affine_coeffs(g, theta)
    h0s, w0s = _tile_origins(g, coeffs)
    tx_t = jnp.asarray(_filter_matrix(g.taps, g.up, g.bw).T)   # [bw, Mv_x]
    ty = jnp.asarray(_filter_matrix(g.taps, g.up, g.bh))       # [Mv_y, bh]
    perm = jnp.asarray(_perm_blocked_to_interleaved(g))        # [C·bw, bw·C]
    bwc = g.bw * c

    # adjoint of the forward's trailing crop: zero-pad to the tile grid,
    # then pre-tile to channel-planar [T, C, P] blocks (pure XLA
    # reshape/transpose — the tiles are disjoint)
    gp = jnp.pad(gout.astype(jnp.float32),
                 ((0, 0), (0, g.hp - out_h), (0, g.wp - out_w), (0, 0)))
    g_tiles = (gp.reshape(n, g.nti, g.tile, g.ntj, g.tile, c)
               .transpose(0, 1, 3, 5, 2, 4)
               .reshape(n * g.tps, c, g.p))

    hv = float(in_h * up)
    wv = float(in_w * up)
    tps = g.tps

    def kernel(coeffs_ref, h0_ref, w0_ref, txt_ref, ty_ref, perm_ref,
               g_ref, out_ref):
        nb = pl.program_id(0)
        tj = pl.program_id(1)
        t = nb * tps + tj

        @pl.when(tj == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        coeffs_row = [coeffs_ref[nb, k] for k in range(6)]
        oy = (tj // g.ntj) * g.tile
        ox = tj % g.ntj * g.tile
        # wxT with points on lanes (matches the lane-oriented g rows);
        # wy with points on sublanes (the contraction's K dim)
        _, sy = _point_coords(g, coeffs_row, oy.astype(jnp.float32),
                              ox.astype(jnp.float32), (g.p, 1))
        sx_r, _ = _point_coords(g, coeffs_row, oy.astype(jnp.float32),
                                ox.astype(jnp.float32), (1, g.p))
        h0f = h0_ref[t].astype(jnp.float32)
        w0f = w0_ref[t].astype(jnp.float32)
        wxt = _weights_mp(g, sx_r, w0f, g.bw, g.mv_x, txt_ref, wv)  # [bw, P]
        wy = _weights_pm(g, sy, h0f, g.bh, g.mv_y, ty_ref, hv)      # [P, bh]

        wxt_f = wxt.astype(jnp.float32)
        vt = jnp.concatenate(
            [(wxt_f * g_ref[0, ch:ch + 1, :]).astype(g.compute_dtype)
             for ch in range(c)], axis=0)                       # [C·bw, P]
        dwt = jax.lax.dot_general(
            vt, wy, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)                 # [C·bw, bh]
        # transpose + channel-blocked → (w, c)-interleaved, in one static
        # permutation contraction on the MXU
        dwin = jax.lax.dot_general(
            dwt.astype(g.compute_dtype),
            perm_ref[:].astype(g.compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT)                 # [bh, bw·C]

        h0 = pl.multiple_of(h0_ref[t], g.ah)
        w0l = pl.multiple_of(w0_ref[t] * c, 128)
        cur = out_ref[0, pl.ds(h0, g.bh), pl.ds(w0l, bwc)]
        out_ref[0, pl.ds(h0, g.bh), pl.ds(w0l, bwc)] = cur + dwin

    out_packed = pl.pallas_call(
        kernel,
        grid=(n, tps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # coeffs
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h0s
            pl.BlockSpec(memory_space=pltpu.SMEM),             # w0s
            pl.BlockSpec(memory_space=pltpu.VMEM),             # tx^T
            pl.BlockSpec(memory_space=pltpu.VMEM),             # ty
            pl.BlockSpec(memory_space=pltpu.VMEM),             # perm
            pl.BlockSpec((1, c, g.p), lambda nb, tj: (nb * tps + tj, 0, 0),
                         memory_space=pltpu.VMEM),             # g tiles
        ],
        out_specs=pl.BlockSpec((1, g.h_pad, g.w_pad * c),
                               lambda nb, tj: (nb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, g.h_pad, g.w_pad * c),
                                       jnp.float32),
    )(coeffs, h0s, w0s, tx_t, ty, perm, g_tiles)

    out = out_packed.reshape(n, g.h_pad, g.w_pad, c)
    return out[:, :in_h, :in_w]
