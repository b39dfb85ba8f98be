"""Serving export: freeze a trained generator into a portable StableHLO
artifact with ``jax.export``.

The reference's deployment story is "load the Python pickle and run torch"
(generate.py:86-124 — model code must ship with the weights).  The
TPU-native equivalent is an ahead-of-time lowered artifact: the full
inference composition (mapping → per-layer synthesis → STN placement →
composite/renderer) is traced ONCE, lowered to StableHLO for one or more
platforms, and serialized.  Serving then needs jax only as a runtime — no
model code, no checkpoint importers, no Python class versioning — and the
same artifact runs on TPU and CPU hosts.

The batch dimension is exported SYMBOLICALLY (``jax.export`` shape
polymorphism), so one artifact serves any batch size; everything else about
XLA's static-shape compilation model is preserved (each concrete batch size
triggers one compile at load time, cached thereafter).

Noise is deterministic by construction: the exported function takes a u32
seed scalar and derives per-call randomness inside the program
(``noise_mode='random'``), or ignores it (``'const'``/``'none'``) — the
artifact is a pure function either way.
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Tuple

import numpy as np

from ..models.ensemble import MontageConfig, MontageEnsemble

# Artifact container: a 16-byte magic/version header, a JSON metadata block,
# then the raw jax.export serialization.
_MAGIC = b'MGTSERVE\x00\x01\x00\x00\x00\x00\x00\x00'


def build_inference_fn(cfg: MontageConfig, ens: MontageEnsemble, tree,
                       *, truncation_psi: float = 1.0,
                       noise_mode: str = 'const',
                       composite: str = 'alpha') -> Callable:
    """The full generator composition as a pure ``fn(z, seed) → (placed,
    img)`` — identical math to cli/generate.py's sampling path (reference
    flow: generate.py:86-124 + custom/loss_aio.py:238-257).

    ``placed``: [B, L, H, W, 4] per-layer RGBA in [-1, 1] after STN
    placement; ``img``: [B, H, W, 4] composited montage in [0, 1].
    ``seed`` (u32 scalar) feeds synthesis noise when
    ``noise_mode='random'`` and is ignored otherwise.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.composite import alpha_composite
    from ..utils.image_utils import normalize_zero1

    use_renderer = composite == 'renderer' and 'renderer' in tree

    def fn(z, seed):
        rng = jax.random.PRNGKey(seed)
        if cfg.train_global:
            placed, _ = ens.run_global_g(tree, z, noise_rng=rng,
                                         noise_mode=noise_mode,
                                         truncation_psi=truncation_psi)
        else:
            ws = ens.mapping.apply(tree['mapping'], z,
                                   truncation_psi=truncation_psi)
            placed = ens.synthesize_layers(tree, ws, noise_rng=rng,
                                           noise_mode=noise_mode)
        placed = jnp.clip(placed, -1, 1)
        if use_renderer:
            img = normalize_zero1(ens.renderer.apply(tree['renderer'],
                                                     placed))
        else:
            img = alpha_composite(normalize_zero1(placed))
        return placed, img

    return fn


def export_generator(cfg: MontageConfig, ens: MontageEnsemble, tree, *,
                     truncation_psi: float = 1.0,
                     noise_mode: str = 'const',
                     composite: str = 'alpha',
                     platforms: Tuple[str, ...] = ('tpu', 'cpu'),
                     batch: Optional[int] = None) -> bytes:
    """Lower the generator to StableHLO and serialize.

    ``batch=None`` exports a symbolic batch dimension (one artifact, any
    batch size); a concrete int pins it.  ``platforms`` lists every backend
    the artifact must be loadable on.
    """
    import jax
    from jax import export as jexport

    fn = build_inference_fn(cfg, ens, tree, truncation_psi=truncation_psi,
                            noise_mode=noise_mode, composite=composite)
    if batch is None:
        (b,) = jexport.symbolic_shape('b')
    else:
        b = int(batch)
    z_spec = jax.ShapeDtypeStruct((b, cfg.z_dim), np.float32)
    seed_spec = jax.ShapeDtypeStruct((), np.uint32)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(
        z_spec, seed_spec)
    meta = {
        'z_dim': cfg.z_dim,
        'layer_names': list(cfg.layer_names),
        'base_resolution': cfg.base_resolution,
        'truncation_psi': truncation_psi,
        'noise_mode': noise_mode,
        'composite': composite,
        'platforms': list(platforms),
        'batch': batch,
        'outputs': ['placed [B,L,H,W,4] in [-1,1]', 'img [B,H,W,4] in [0,1]'],
    }
    meta_blob = json.dumps(meta).encode()
    payload = bytes(exported.serialize())
    return (_MAGIC + len(meta_blob).to_bytes(8, 'little') + meta_blob
            + payload)


def load_exported(data: bytes):
    """(metadata dict, callable) from an artifact produced by
    :func:`export_generator`.  The callable is jittable and runs on any
    platform the artifact was exported for."""
    from jax import export as jexport

    if data[:16] != _MAGIC:
        raise ValueError('not a montage_gan_tpu serving artifact '
                         '(bad magic)')
    n = int.from_bytes(data[16:24], 'little')
    meta = json.loads(data[24:24 + n].decode())
    exported = jexport.deserialize(bytearray(data[24 + n:]))
    return meta, exported.call


def export_file(path: str, *args, **kwargs) -> dict:
    """export_generator → file; returns the artifact metadata."""
    blob = export_generator(*args, **kwargs)
    with open(path, 'wb') as f:
        f.write(blob)
    n = int.from_bytes(blob[16:24], 'little')
    return json.loads(blob[24:24 + n].decode())


def load_file(path: str):
    with open(path, 'rb') as f:
        return load_exported(f.read())
