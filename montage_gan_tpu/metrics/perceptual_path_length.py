"""Perceptual Path Length.

Contract parity with the reference's PPL sampler
(reference: metrics/perceptual_path_length.py:24-135): pairs of latents
interpolated with slerp in Z (or lerp in W), perturbed by ±ε/2 around a
random (or endpoint) t, both endpoints synthesized, and the squared
perceptual distance scaled by 1/ε² accumulated; the reported value is the
mean over the filtered samples (no percentile filtering in the '_wend'
variants, matching the reference's sampler defaults).

The perceptual distance is pluggable: the reference uses VGG16-LPIPS
(unavailable offline); by default the deterministic random-feature distance
is used (relative numbers).  Like the reference (SURVEY.md §2.8 note), PPL
operates on a single monolithic generator — here any ``(z, t_sign) →
image`` sampler; for MontageGAN pass the composited-ensemble sampler.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation (reference contract:
    perceptual_path_length.py:25-35)."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b_n - d * a_n
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = a_n * jnp.cos(p) + c * jnp.sin(p)
    return out * jnp.linalg.norm(a, axis=-1, keepdims=True)


def compute_ppl(sample_pair_fn: Callable,
                z_dim: int,
                extractor,
                num_samples: int = 2000,
                epsilon: float = 1e-4,
                space: str = 'z',
                sampling: str = 'end',
                crop: bool = False,
                batch_size: int = 8,
                seed: int = 0) -> float:
    """Args:
        sample_pair_fn: ``(z0, z1) → (img0, img1)`` where z* are the two
            perturbed interpolation endpoints (already eps apart in Z);
            images NHWC RGB-ish [0, 1].
        space/sampling: 'z'|'w' × 'full'|'end' (reference variants
            ppl_{z,w}{full,end}; 'w'-space interpolation must be handled by
            the caller's sample_pair_fn — pass space='w' only then).
    """
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
        zt0 = slerp(z0, z1, t)
        zt1 = slerp(z0, z1, t + epsilon)
        img0, img1 = sample_pair_fn(zt0, zt1)

        if crop:
            h, w = img0.shape[1], img0.shape[2]
            c0, c1 = h // 8 * 2, w // 8 * 2
            img0 = img0[:, c0:h - c0, c1:w - c1]
            img1 = img1[:, c0:h - c0, c1:w - c1]

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
