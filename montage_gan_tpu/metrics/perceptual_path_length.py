"""Perceptual Path Length.

Contract parity with the reference's PPL sampler
(reference: metrics/perceptual_path_length.py:24-135): pairs of latents
interpolated with slerp in Z (or lerp in W), perturbed by +ε around a
random (sampling='full') or zero (sampling='end') t, both endpoints
synthesized, and the squared perceptual distance scaled by 1/ε²
accumulated; the reported value is the mean over the [1, 99]-percentile
filtered samples (perceptual_path_length.py:128-131).

W-space interpolation (the reference's ppl2_wend default,
perceptual_path_length.py:57-60) requires a ``map_fn``/``synth_fn`` split
of the generator: ``map_fn(z) → ws`` (any pytree of arrays with leading
batch dim) and ``synth_fn(ws) → image`` ([0, 1] NHWC).  The lerp happens
between the mapped endpoints.  Z-space interpolation slerps the latents
and maps both endpoints (perceptual_path_length.py:61-64).

The perceptual distance is pluggable: the reference uses VGG16-LPIPS
(unavailable offline); by default the deterministic random-feature distance
is used (relative numbers).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation, returning a UNIT vector like the reference
    (perceptual_path_length.py:24-33 normalizes the result; scale is
    irrelevant downstream because the mapping net RMS-normalizes z)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b_n - d * a_n
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = a_n * jnp.cos(p) + c * jnp.sin(p)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def _lerp_tree(w0, w1, t):
    """Per-sample lerp of two mapped-latent pytrees; ``t`` is [B, 1]."""
    def leaf(a, b):
        tt = t.reshape((t.shape[0],) + (1,) * (a.ndim - 1))
        return a + (b - a) * tt
    return jax.tree_util.tree_map(leaf, w0, w1)


def _crop(img):
    """The reference's asymmetric face crop (perceptual_path_length.py:76-78):
    rows c*3 : c*7, cols c*2 : c*6 with c = H // 8."""
    c = img.shape[1] // 8
    return img[:, c * 3:c * 7, c * 2:c * 6]


def compute_ppl(sample_pair_fn: Optional[Callable] = None,
                z_dim: int = 512,
                extractor=None,
                num_samples: int = 50000,
                epsilon: float = 1e-4,
                space: str = 'z',
                sampling: str = 'end',
                crop: bool = False,
                batch_size: int = 8,
                seed: int = 0,
                map_fn: Optional[Callable] = None,
                synth_fn: Optional[Callable] = None,
                mesh=None) -> float:
    """Args:
        map_fn / synth_fn: the split generator — ``map_fn(z) → ws`` and
            ``synth_fn(ws) → img`` (NHWC [0, 1]).  Required for space='w';
            preferred for space='z' too (matches the reference's
            map-both-endpoints semantics).
        sample_pair_fn: legacy z-space-only interface
            ``(z0, z1) → (img0, img1)`` over the two perturbed endpoints;
            used when map_fn/synth_fn are not given.
        space/sampling: 'z'|'w' × 'full'|'end' (reference variants
            ppl_{z,w}{full,end} and ppl2_wend).
    """
    assert space in ('z', 'w') and sampling in ('full', 'end')
    if space == 'w' and (map_fn is None or synth_fn is None):
        raise ValueError(
            "w-space PPL requires map_fn and synth_fn (the mapping/synthesis "
            "split); refusing to silently fall back to z-space "
            "interpolation under a w-space metric name")
    if map_fn is None and sample_pair_fn is None:
        raise ValueError("provide map_fn+synth_fn or sample_pair_fn")

    key = jax.random.PRNGKey(seed)
    dists = []
    done = 0
    while done < num_samples:
        key, k0, k1, kt = jax.random.split(key, 4)
        z0 = jax.random.normal(k0, (batch_size, z_dim))
        z1 = jax.random.normal(k1, (batch_size, z_dim))
        if sampling == 'full':
            t = jax.random.uniform(kt, (batch_size, 1))
        else:
            t = jnp.zeros((batch_size, 1))
        if mesh is not None:
            # batch-sharded endpoints → the whole pair pipeline (mapping,
            # lerp, synthesis, LPIPS distance) runs data-parallel over the
            # mesh (the reference's per-rank PPL sampler loop,
            # perceptual_path_length.py:121-125)
            from ..parallel.mesh import batch_sharding
            s = batch_sharding(mesh)
            z0, z1, t = (jax.device_put(np.asarray(a), s)
                         for a in (z0, z1, t))

        if space == 'w':
            w0, w1 = map_fn(z0), map_fn(z1)
            img0 = synth_fn(_lerp_tree(w0, w1, t))
            img1 = synth_fn(_lerp_tree(w0, w1, t + epsilon))
        else:
            zt0 = slerp(z0, z1, t)
            zt1 = slerp(z0, z1, t + epsilon)
            if map_fn is not None:
                img0 = synth_fn(map_fn(zt0))
                img1 = synth_fn(map_fn(zt1))
            else:
                img0, img1 = sample_pair_fn(zt0, zt1)

        if crop:
            img0, img1 = _crop(img0), _crop(img1)

        f0 = extractor(jnp.asarray(img0[..., :3]) * 255.0)
        f1 = extractor(jnp.asarray(img1[..., :3]) * 255.0)
        d = jnp.sum(jnp.square(f0 - f1), axis=-1) / (epsilon ** 2)
        dists.append(np.asarray(d))
        done += batch_size

    dist = np.concatenate(dists)[:num_samples]
    # reference filters to [lo, hi] percentiles (perceptual_path_length.py:128-131)
    lo = np.percentile(dist, 1, method='lower')
    hi = np.percentile(dist, 99, method='higher')
    return float(np.extract(np.logical_and(dist >= lo, dist <= hi),
                            dist).mean())
