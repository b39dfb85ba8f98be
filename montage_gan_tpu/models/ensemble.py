"""The MontageGAN ensemble: shared mapping → N local synthesis nets → STN →
renderer/composite → global D.

This is the functional composition the reference builds imperatively in
custom/training_loop_aio.py:246-300 and drives through
custom/loss_aio.py:238-257 (run_global_G / run_global_D).  Module *definitions*
are static (hashable config); all state lives in the variables pytree, so the
whole ensemble can sit inside a single jitted/pjitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.composite import alpha_composite
from ..utils.calc_res import calc_init_res
from ..utils.image_utils import (make_batch_for_pos_estimator,
                                 normalize_minus11, normalize_zero1)
from .discriminator import Discriminator
from .mapping import GlobalMappingNetwork, MappingNetwork
from .renderer import build_renderer
from .stn import STN
from .synthesis import SynthesisNetwork

# The reference dataset's layer inventory (reference: custom/dataset_aio.py:21-85).
DEFAULT_LAYER_NAMES = ('hair_back', 'body', 'ear', 'face', 'eye',
                       'mouth', 'nose', 'hair_front', 'brow')
DEFAULT_LAYER_TARGETS = ((256, 256), (256, 256), (160, 224), (256, 256),
                         (96, 160), (64, 96), (64, 32), (256, 256), (64, 160))


@dataclasses.dataclass(frozen=True)
class MontageConfig:
    layer_names: Tuple[str, ...] = DEFAULT_LAYER_NAMES
    layer_targets: Tuple[Tuple[int, int], ...] = DEFAULT_LAYER_TARGETS
    base_resolution: int = 256
    img_channels: int = 4
    conv_config_index: int = 3   # AIO default (reference training_loop_aio.py:58)
    z_dim: int = 512
    w_dim: int = 512
    c_dim: int = 0               # conditioning label dim (train.py path)
    freeze_d_layers: int = 0     # Freeze-D (reference --freezed, train.py)
    mapping_num_layers: int = 8
    channel_base: int = 16384    # cfg 'aio': fmaps 0.5 × 32768 (train_aio.py:179,209)
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256
    mbstd_group_size: int = 4
    use_global_mapping: bool = True
    train_global: bool = True
    renderer_type: str = 'tanh'  # 'tanh' | 'subpixel' | 'none' (bypass)
    stn_stages: int = 5          # localization depth; 5 at 256px (reference)

    @property
    def num_layers(self) -> int:
        return len(self.layer_names)

    def layer_geometry(self, idx: int) -> Tuple[Tuple[int, int], int]:
        """(init_res, nominal_resolution) of layer idx."""
        init_res, res, _ = calc_init_res(list(self.layer_targets[idx]),
                                         conv_config_index=self.conv_config_index)
        return tuple(init_res), res

    @property
    def base_init_res(self) -> Tuple[int, int]:
        init_res, _, _ = calc_init_res([self.base_resolution, self.base_resolution],
                                       conv_config_index=self.conv_config_index)
        return tuple(init_res)


class MontageEnsemble:
    """Holds module definitions; parameters are passed functionally."""

    def __init__(self, cfg: MontageConfig):
        self.cfg = cfg
        self.local_gs: List[SynthesisNetwork] = []
        self.local_ds: List[Discriminator] = []
        for i in range(cfg.num_layers):
            init_res, res = cfg.layer_geometry(i)
            self.local_gs.append(SynthesisNetwork(
                img_resolution=res, img_channels=cfg.img_channels,
                w_dim=cfg.w_dim, init_res=init_res,
                conv_config_index=cfg.conv_config_index,
                channel_base=cfg.channel_base, channel_max=cfg.channel_max,
                num_fp16_res=cfg.num_fp16_res, conv_clamp=cfg.conv_clamp))
            self.local_ds.append(Discriminator(
                img_resolution=res, img_channels=cfg.img_channels,
                c_dim=cfg.c_dim,
                init_res=init_res, conv_config_index=cfg.conv_config_index,
                channel_base=cfg.channel_base, channel_max=cfg.channel_max,
                num_fp16_res=cfg.num_fp16_res, conv_clamp=cfg.conv_clamp,
                mbstd_group_size=cfg.mbstd_group_size,
                freeze_layers=cfg.freeze_d_layers))

        self.num_ws = max(g.num_ws for g in self.local_gs)
        if cfg.use_global_mapping:
            self.mapping = GlobalMappingNetwork(
                z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
                num_ws=self.num_ws, num_layers=cfg.mapping_num_layers,
                num_splits=cfg.num_layers)
        else:
            self.mapping = MappingNetwork(
                z_dim=cfg.z_dim, c_dim=cfg.c_dim, w_dim=cfg.w_dim,
                num_ws=self.num_ws, num_layers=cfg.mapping_num_layers)

        self.stn = None
        self.global_d = None
        if cfg.train_global:
            self.stn = STN(img_resolution=cfg.base_resolution,
                           img_channels=cfg.img_channels,
                           img_layers=cfg.num_layers,
                           num_stages=cfg.stn_stages)
            self.global_d = Discriminator(
                img_resolution=cfg.base_resolution,
                img_channels=cfg.img_channels,
                init_res=cfg.base_init_res,
                conv_config_index=cfg.conv_config_index,
                channel_base=cfg.channel_base, channel_max=cfg.channel_max,
                num_fp16_res=cfg.num_fp16_res, conv_clamp=cfg.conv_clamp,
                mbstd_group_size=cfg.mbstd_group_size)

        self.renderer = None
        if cfg.renderer_type != 'none':
            self.renderer = build_renderer(
                cfg.renderer_type, img_resolution=cfg.base_resolution,
                img_channels=cfg.img_channels, img_layers=cfg.num_layers)

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------

    def init_variables(self, key: jax.Array, batch: int = 1,
                       on_cpu: bool = True) -> Dict[str, Any]:
        """Initialize all module variables.

        ``on_cpu=True`` (default) runs the init traces eagerly on the CPU
        backend — initialization is O(20) separate forward graphs, which
        would otherwise each trigger a full accelerator compile; the real
        compile budget should go to the jitted train/sample step instead.
        """
        if on_cpu:
            # local_devices, not devices: in multi-process runs the global
            # device list leads with process 0's devices — placing init on
            # another host's device yields non-addressable arrays
            cpu = jax.local_devices(backend='cpu')[0]
            with jax.default_device(cpu):
                return self.init_variables(key, batch=batch, on_cpu=False)
        cfg = self.cfg
        keys = jax.random.split(key, 5 + 2 * cfg.num_layers)
        z = jnp.zeros((batch, cfg.z_dim))
        c = jnp.zeros((batch, cfg.c_dim)) if cfg.c_dim > 0 else None
        variables: Dict[str, Any] = {}
        variables['mapping'] = self.mapping.init(
            {'params': keys[0]}, z, c)
        variables['local_g'] = []
        variables['local_d'] = []
        for i in range(cfg.num_layers):
            g = self.local_gs[i]
            ws = jnp.zeros((batch, g.num_ws, cfg.w_dim))
            kg = jax.random.fold_in(keys[1], i)
            variables['local_g'].append(g.init(
                {'params': kg, 'noise': jax.random.fold_in(kg, 7)},
                ws, noise_mode='const'))
            th, tw = cfg.layer_targets[i]
            img = jnp.zeros((batch, th, tw, cfg.img_channels))
            variables['local_d'].append(self.local_ds[i].init(
                {'params': jax.random.fold_in(keys[2], i)}, img, c))
        if self.stn is not None:
            stack = jnp.zeros((batch, cfg.num_layers, cfg.base_resolution,
                               cfg.base_resolution, cfg.img_channels))
            variables['stn'] = self.stn.init({'params': keys[3]}, stack)
            base = jnp.zeros((batch, cfg.base_resolution, cfg.base_resolution,
                              cfg.img_channels))
            variables['global_d'] = self.global_d.init(
                {'params': jax.random.fold_in(keys[3], 1)}, base)
        if self.renderer is not None:
            stack = jnp.zeros((batch, cfg.num_layers, cfg.base_resolution,
                               cfg.base_resolution, cfg.img_channels))
            variables['renderer'] = self.renderer.init({'params': keys[4]}, stack)
        return variables

    # ------------------------------------------------------------------
    # Forward paths (functional; mirror loss_aio.run_global_G / run_global_D)
    # ------------------------------------------------------------------

    def ws_for_layer(self, ws: jax.Array, layer_idx, num_ws: Optional[int] = None) -> jax.Array:
        """Slice the (global) mapping output for one layer
        (reference: custom/loss_aio.py:69-71).

        ``layer_idx`` may be a traced scalar (geometry-shared compiled
        phases); ``num_ws`` must then be given statically (it is equal
        within a geometry group)."""
        if num_ws is None:
            num_ws = self.local_gs[int(layer_idx)].num_ws
        if ws.ndim == 4:  # [B, L, num_ws, w]
            ws = jnp.take(ws, layer_idx, axis=1)
        return ws[:, :num_ws]

    def synthesize_layers(self,
                          variables: Dict[str, Any],
                          ws: jax.Array,
                          noise_rng: Optional[jax.Array] = None,
                          noise_mode: str = 'random') -> jax.Array:
        """All local Gs → center-pad to base res → stack.

        Returns ``[B, L, base, base, C]`` in [-1, 1] (pad value -1), matching
        make_batch_for_pos_estimator(pad_value=-1) in the reference
        (custom/loss_aio.py:238-241).  Same-geometry layers run vmapped
        over stacked params (one batched forward per geometry bucket
        instead of L unrolled ones — exact: per-layer noise keys
        ``fold_in(noise_rng, i)`` are reproduced inside the vmap)."""
        outs: list = [None] * self.cfg.num_layers
        by_geom: Dict[Any, list] = {}
        for i in range(self.cfg.num_layers):
            by_geom.setdefault(self.cfg.layer_targets[i], []).append(i)
        for idxs in by_geom.values():
            rep = idxs[0]
            g = self.local_gs[rep]
            if len(idxs) == 1:
                rngs = {}
                if noise_mode == 'random':
                    assert noise_rng is not None
                    rngs['noise'] = jax.random.fold_in(noise_rng, rep)
                outs[rep] = g.apply(variables['local_g'][rep],
                                    self.ws_for_layer(ws, rep),
                                    noise_mode=noise_mode, rngs=rngs)
                continue
            g_stack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[variables['local_g'][i] for i in idxs])
            li_vec = jnp.asarray(idxs, jnp.int32)
            ws_stack = jnp.stack(
                [self.ws_for_layer(ws, i, num_ws=g.num_ws) for i in idxs])
            if noise_mode == 'random':
                assert noise_rng is not None
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(noise_rng, i))(li_vec)

                def one(gv, w_in, key):
                    return g.apply(gv, w_in, noise_mode='random',
                                   rngs={'noise': key})

                imgs = jax.vmap(one)(g_stack, ws_stack, keys)
            else:
                def one(gv, w_in):
                    return g.apply(gv, w_in, noise_mode=noise_mode)

                imgs = jax.vmap(one)(g_stack, ws_stack)
            for j, i in enumerate(idxs):
                outs[i] = imgs[j]
        return make_batch_for_pos_estimator(outs, self.cfg.base_resolution,
                                            pad_value=-1.0)

    def run_global_g(self,
                     variables: Dict[str, Any],
                     z: jax.Array,
                     noise_rng: Optional[jax.Array] = None,
                     noise_mode: str = 'random',
                     truncation_psi: float = 1.0):
        """z → placed layer stack [-1, 1] + theta
        (reference: custom/loss_aio.py:238-243)."""
        ws = self.mapping.apply(variables['mapping'], z,
                                truncation_psi=truncation_psi)
        return self.run_global_g_from_ws(variables, ws, noise_rng, noise_mode)

    def run_global_g_from_ws(self,
                             variables: Dict[str, Any],
                             ws: jax.Array,
                             noise_rng: Optional[jax.Array] = None,
                             noise_mode: str = 'random'):
        """ws → placed layer stack [-1, 1] + theta — the synthesis half of
        run_global_g, entered after mapping (w-space PPL, style mixing)."""
        stack = self.synthesize_layers(variables, ws, noise_rng, noise_mode)
        placed, theta = self.stn.apply(variables['stn'], stack)
        return placed, theta

    def blend(self, variables: Dict[str, Any], stack: jax.Array,
              use_renderer: bool = True) -> jax.Array:
        """Layer stack [-1,1] → blended image [-1,1]
        (reference: custom/loss_aio.py:245-251)."""
        if self.renderer is not None and use_renderer:
            return self.renderer.apply(variables['renderer'], stack)
        return normalize_minus11(alpha_composite(normalize_zero1(stack)))
