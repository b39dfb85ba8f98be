"""The MontageGAN all-in-one train step — ONE jitted program.

Replaces the reference's Python phase loop (custom/training_loop_aio.py:
431-519 builds ~40 phases; :597-638 executes them eagerly per batch) with a
single compiled step: every phase is a pure value_and_grad + optax update,
lazy-regularization phases are folded in behind ``lax.cond`` interval masks
with the reference's ``gain = interval`` loss scaling
(custom/training_loop_aio.py:624-627), and the per-pair Adam moments and
lr/β rebalancing ``mb_ratio = r/(r+1)`` (custom/training_loop_aio.py:466-469)
are preserved exactly — including the quirk that the shared mapping network
is updated by each of the 9 local-G optimizers (each with its own moments)
plus the global-G optimizer, sequentially, as in the reference.

Under pjit, batches arrive sharded over the 'data' mesh axis and gradients
are reduced by XLA-inserted psums — see parallel/mesh.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.ensemble import MontageEnsemble
from .augment import AugmentConfig
from . import losses


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Hyperparameters (defaults = cfg 'aio', reference train_aio.py:179-220
    and the MontageGAN config block, custom/training_loop_aio.py:56-81)."""
    lrate: float = 0.0025
    beta1: float = 0.0
    beta2: float = 0.99
    eps: float = 1e-8
    g_reg_interval: Optional[int] = 4
    d_reg_interval: Optional[int] = 16
    global_optimize_interval: int = 1
    r1_gamma: float = 10.0
    global_r1_gamma: float = 10.0
    pl_weight: float = 2.0
    pl_batch_shrink: int = 2
    pl_decay: float = 0.01
    style_mixing_prob: float = 0.9
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = None
    ada_target: Optional[float] = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0
    aug_p_max: float = 0.6
    augment: Optional[AugmentConfig] = None
    augment_p_init: float = 0.0
    local_noaug: bool = False
    global_noaug: bool = False
    batch_size: int = 32
    train_local: bool = True
    train_global: bool = True
    train_renderer: bool = True
    renderer_use_real: bool = True
    bypass_renderer: bool = False
    global_d_real_use_renderer: bool = True
    global_g_optimize_synthesis: bool = True
    renderer_lr: float = 1e-3
    renderer_betas: Tuple[float, float] = (0.9, 0.999)
    renderer_loss: str = 'mse'
    # Global microbatch for gradient accumulation (reference batch_gpu ×
    # num_gpus, custom/training_loop_aio.py:620-627): gradients of
    # batch_size/microbatch rounds are SUMMED before each optimizer step
    # (the reference's un-normalized accumulation). None = single pass.
    # Honored by the PhaseExecutor's local phases.
    microbatch: Optional[int] = None
    # Microbatch for the global G/D and renderer phases only — these backprop
    # through all 9 local Gs + STN + composite + global D at once and are the
    # HBM high-water mark (global_Gmain needs ~10G of temps at batch 32 on a
    # 16G chip next to the ~7.5G resident state).  None = follow `microbatch`.
    global_microbatch: Optional[int] = None
    # Microbatch inside a geometry BUCKET program (PhaseExecutor
    # merge_locals='bucket': k same-geometry layers vmapped in one program,
    # so one accumulation round holds k × bucket_microbatch images).  None =
    # follow `microbatch` (same per-layer working set × k — only safe for
    # small buckets); production sets it so k × bucket_microbatch ≈
    # batch_size (one full batch of images in flight per dispatch).
    bucket_microbatch: Optional[int] = None

    @property
    def accum_rounds(self) -> int:
        if self.microbatch is None:
            return 1
        assert self.batch_size % self.microbatch == 0
        return self.batch_size // self.microbatch

    @property
    def bucket_accum_rounds(self) -> int:
        mb = self.bucket_microbatch
        if mb is None:
            return self.accum_rounds
        assert self.batch_size % mb == 0
        return self.batch_size // mb

    @property
    def global_accum_rounds(self) -> int:
        mb = self.global_microbatch
        if mb is None:
            return self.accum_rounds
        assert self.batch_size % mb == 0
        return self.batch_size // mb


@flax.struct.dataclass
class MontageTrainState:
    variables: Any      # {'mapping', 'local_g': tuple, 'local_d': tuple,
    #                      'stn', 'global_d', 'renderer'}
    ema: Any            # EMA copies: {'mapping', 'local_g': tuple, 'stn'}
    opt_states: Any     # per-phase optax states
    pl_mean: jax.Array  # [L]
    aug_p: jax.Array    # [L+1] (9 local pipes + global pipe)
    ada_sign_sum: jax.Array    # [L+1]
    ada_sign_count: jax.Array  # [L+1]
    step: jax.Array     # int32 batch index


def _scaled_adam(hyper: TrainHyper, reg_interval: Optional[int]):
    """Adam with the lazy-regularization lr/β rebalance
    (reference: custom/training_loop_aio.py:466-469)."""
    lr, b1, b2 = hyper.lrate, hyper.beta1, hyper.beta2
    if reg_interval is not None:
        mb_ratio = reg_interval / (reg_interval + 1)
        lr = lr * mb_ratio
        b1 = b1 ** mb_ratio
        b2 = b2 ** mb_ratio
    return optax.adam(learning_rate=lr, b1=b1, b2=b2, eps=hyper.eps)


def _nan_to_num(tree):
    """Gradient scrubbing (reference: custom/training_loop_aio.py:584-595)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), tree)


def _merge_stats(stats, new):
    """Merge a phase's stat dict; colliding keys (e.g. Loss/scores/fake from
    both Gmain and Dmain) average equal-weight (reference training_stats
    accumulates both phases' reports under one name)."""
    for k, v in new.items():
        stats[k] = (stats[k] + v) * 0.5 if k in stats else v


def accum_value_and_grad(loss_fn, params, data, rng, rounds: int):
    """``loss_fn(params, data_mb, rng_mb) → (loss, aux)`` with gradient
    accumulation over microbatch rounds (reference batch_gpu rounds,
    custom/training_loop_aio.py:620-627).

    Gradients are SUMMED over rounds (the reference's un-normalized
    accumulation, custom/loss_aio.py:52-63); ``aux['stats']``/
    ``aux['sign_real']`` are averaged.  The EMA-tracked aux entries
    (``moving_stats``, ``pl_mean``) are ALSO averaged across rounds — and
    this is exact, not an approximation: every round's update starts from
    the same base value and an EMA step is linear in the batch mean, so
    ``mean_r(β·s0 + (1−β)·m_r) = β·s0 + (1−β)·mean(m_r)`` — identical to
    the single full-batch update the reference performs at its canonical
    1-round config (batch_gpu == batch, train_aio.py:179-184).  ``data``
    leaves must have a leading batch axis divisible by ``rounds``.

    Returns ``((mean_loss, aux), grads)``.
    """
    vag = jax.value_and_grad(loss_fn, has_aux=True)
    if rounds == 1:
        return vag(params, data, rng)

    for leaf in jax.tree_util.tree_leaves(data):
        if leaf.shape[0] % rounds != 0:
            raise ValueError(
                f'data batch {leaf.shape[0]} is not divisible by '
                f'{rounds} accumulation rounds (batch_size/microbatch); '
                f'feed full batches or adjust microbatch')
    data_r = jax.tree_util.tree_map(
        lambda x: x.reshape((rounds, x.shape[0] // rounds) + x.shape[1:]),
        data)
    rngs = jax.random.split(rng, rounds)
    gzero = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(gsum, xs):
        d, r = xs
        (loss, aux), g = vag(params, d, r)
        return jax.tree_util.tree_map(jnp.add, gsum, g), (loss, aux)

    gsum, (loss_seq, aux_seq) = jax.lax.scan(body, gzero, (data_r, rngs))

    aux = dict(aux_seq)
    for k in ('stats',):
        if k in aux:
            aux[k] = jax.tree_util.tree_map(jnp.mean, aux[k])
    for k in ('sign_real',):
        if k in aux:
            aux[k] = jnp.mean(aux[k])
    for k in ('moving_stats', 'pl_mean'):
        if k in aux:
            # mean over rounds == one full-batch EMA update (see docstring)
            aux[k] = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0),
                                            aux[k])
    return (jnp.mean(loss_seq), aux), gsum


def _zero_stats_like(loss_fn, params, data, rng_key):
    """Zero-filled dict structurally matching ``loss_fn``'s ``aux['stats']``,
    derived abstractly (jax.eval_shape, trace-time only) — the identity
    branch of the lax.cond-gated global phases needs a same-structure carry,
    and deriving it from the loss aux means a stat added in losses.py
    propagates with no edit here (round-1 review item: hard-coded
    GGMAIN/GDMAIN/GDR1 key whitelists silently dropped new stats)."""
    _, aux_shape = jax.eval_shape(loss_fn, params, data, rng_key)
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype),
                                  dict(aux_shape['stats']))


class MontageTrainer:
    """Builds the optimizers, the initial state, and the jitted step."""

    def __init__(self, ens: MontageEnsemble, hyper: TrainHyper):
        self.ens = ens
        self.hyper = hyper
        goi = hyper.global_optimize_interval
        self.tx_local_g = _scaled_adam(hyper, hyper.g_reg_interval)
        self.tx_local_d = _scaled_adam(hyper, hyper.d_reg_interval)
        g_reg_g = None if hyper.g_reg_interval is None else hyper.g_reg_interval * goi
        d_reg_g = None if hyper.d_reg_interval is None else hyper.d_reg_interval * goi
        self.tx_global_g = _scaled_adam(hyper, g_reg_g)
        self.tx_global_d = _scaled_adam(hyper, d_reg_g)
        self.tx_renderer = optax.amsgrad(hyper.renderer_lr,
                                         b1=hyper.renderer_betas[0],
                                         b2=hyper.renderer_betas[1],
                                         eps=hyper.eps)
        self._local_aug = (hyper.augment if (hyper.augment is not None
                                             and not hyper.local_noaug) else None)
        self._global_aug = (hyper.augment if (hyper.augment is not None
                                              and not hyper.global_noaug) else None)
        self._use_renderer = (not hyper.bypass_renderer
                              and ens.renderer is not None)

    # ------------------------------------------------------------------
    # State
    # ------------------------------------------------------------------

    def _global_g_params(self, variables):
        tree = {'mapping': variables['mapping']['params'],
                'stn': variables['stn']['params']}
        if self.hyper.global_g_optimize_synthesis:
            tree['local_g'] = tuple(v['params'] for v in variables['local_g'])
        return tree

    def init_state(self, rng: jax.Array, batch: int = 1,
                   on_cpu: bool = True) -> MontageTrainState:
        """Build the initial train state.  ``on_cpu`` keeps ALL init work
        (variable init, EMA copies, optimizer-moment zeros) on the CPU
        backend — on accelerators behind a remote-compile relay, eager init
        ops are pathologically slow; transfer happens at first step."""
        if on_cpu:
            # local_devices, not devices: in a multi-process run the global
            # list starts with process 0's devices, and placing init work on
            # another host's device yields non-addressable arrays here
            cpu = jax.local_devices(backend='cpu')[0]
            with jax.default_device(cpu):
                return self.init_state(rng, batch=batch, on_cpu=False)
        # on_cpu=False explicitly: this branch must stay traceable so the
        # whole init can run as ONE jitted on-device program (bench.py does
        # this — it beats transferring ~8 GB of host-initialized state over
        # a slow device transport); init_variables' own CPU wrapper would
        # re-enter jax.default_device inside the trace.
        variables = self.ens.init_variables(rng, batch=batch, on_cpu=False)
        return self.state_from_variables(variables)

    def state_from_variables(self, variables) -> MontageTrainState:
        """Rebuild a *fresh* train state around existing network variables:
        EMA = copies of the current params, optimizer moments = zeros,
        controller scalars = zeros — exactly what ``init_state`` produces
        after ``init_variables``.  Lets callers cache/restore only the
        variables (the EMA/optimizer majority of the state is derivable)."""
        ens, hyper = self.ens, self.hyper
        variables = dict(variables)
        num_layers = ens.cfg.num_layers

        ema = {'mapping': jax.tree_util.tree_map(jnp.copy, variables['mapping']),
               'local_g': jax.tree_util.tree_map(jnp.copy,
                                                 tuple(variables['local_g']))}
        if ens.stn is not None:
            ema['stn'] = jax.tree_util.tree_map(jnp.copy, variables['stn'])

        opt_states: Dict[str, Any] = {}
        if hyper.train_local:
            opt_states['local_g'] = tuple(
                self.tx_local_g.init({'mapping': variables['mapping']['params'],
                                      'g': variables['local_g'][i]['params']})
                for i in range(num_layers))
            opt_states['local_d'] = tuple(
                self.tx_local_d.init(variables['local_d'][i]['params'])
                for i in range(num_layers))
        if hyper.train_global and ens.stn is not None:
            opt_states['global_g'] = self.tx_global_g.init(
                self._global_g_params(variables))
            opt_states['global_d'] = self.tx_global_d.init(
                variables['global_d']['params'])
        if hyper.train_renderer and self._use_renderer:
            opt_states['renderer'] = self.tx_renderer.init(
                variables['renderer']['params'])

        variables['local_g'] = tuple(variables['local_g'])
        variables['local_d'] = tuple(variables['local_d'])
        return MontageTrainState(
            variables=variables, ema=ema, opt_states=opt_states,
            pl_mean=jnp.zeros([num_layers]),
            aug_p=jnp.full([num_layers + 1], hyper.augment_p_init),
            ada_sign_sum=jnp.zeros([num_layers + 1]),
            ada_sign_count=jnp.zeros([num_layers + 1]),
            step=jnp.zeros([], jnp.int32))

    # ------------------------------------------------------------------
    # The step
    # ------------------------------------------------------------------

    def train_step(self, state: MontageTrainState,
                   real_stack: jax.Array,
                   real_crops: Tuple[jax.Array, ...],
                   rng: jax.Array,
                   real_c: Optional[jax.Array] = None,
                   gen_c: Optional[jax.Array] = None):
        """One full training iteration (all phases in one traced program).

        Args:
            state: MontageTrainState.
            real_stack: ``[B, L, H, W, C]`` reals in [-1, 1]
                (reference phase_real_blchw, training_loop_aio.py:601).
            real_crops: per-layer ``[B, h_l, w_l, C]`` centered crops in
                [-1, 1] (reference phase_real_list_of_bchw, :602-604; host-
                prepared, see utils/image_utils.make_batch_for_local_d_np).
            rng: step PRNG key.
            real_c: optional ``[B, c_dim]`` labels of the reals
                (conditional train.py path; reference training_loop.py
                phase_real_c).
            gen_c: optional ``[B, c_dim]`` label pool for generated samples,
                re-permuted per phase (reference samples fresh phase_gen_c
                per phase from the dataset label distribution).
        Returns:
            (new_state, stats dict of scalars).
        """
        return self.partial_step(state, real_stack, real_crops, rng,
                                 real_c=real_c, gen_c=gen_c)

    def partial_step(self, state: MontageTrainState,
                     real_stack: jax.Array,
                     real_crops: Tuple[jax.Array, ...],
                     rng: jax.Array,
                     do_local: bool = True,
                     do_global: bool = True,
                     do_greg: bool = True,
                     do_dreg: bool = True,
                     do_renderer: bool = True,
                     do_global_g: Optional[bool] = None,
                     do_global_d: Optional[bool] = None,
                     do_global_dmain: Optional[bool] = None,
                     do_ema_ada: bool = True,
                     host_scheduled: bool = False,
                     real_c: Optional[jax.Array] = None,
                     gen_c: Optional[jax.Array] = None):
        """train_step with static phase gates.  ``host_scheduled=True`` means
        an outer scheduler (training/phase_exec.py) decides intervals on the
        host, so the in-trace ``step % interval`` masks are dropped and gated
        sections run unconditionally when enabled.  ``do_global_g``/
        ``do_global_d`` refine ``do_global`` so the executor can compile each
        global phase as its own (memory-bounded) program."""
        if do_global_g is None:
            do_global_g = do_global
        if do_global_d is None:
            do_global_d = do_global
        if do_global_dmain is None:
            do_global_dmain = do_global_d
        ens, hyper = self.ens, self.hyper
        num_layers = ens.cfg.num_layers
        variables = dict(state.variables)
        variables['local_g'] = list(variables['local_g'])
        variables['local_d'] = list(variables['local_d'])
        opt_states = dict(state.opt_states)
        if 'local_g' in opt_states:
            opt_states['local_g'] = list(opt_states['local_g'])
            opt_states['local_d'] = list(opt_states['local_d'])
        pl_mean = state.pl_mean
        step = state.step
        stats: Dict[str, jax.Array] = {}
        sign_sum = state.ada_sign_sum
        sign_count = state.ada_sign_count

        phase_idx = 0

        def phase_rng():
            nonlocal phase_idx
            phase_idx += 1
            return jax.random.fold_in(rng, phase_idx)

        def zs(k):
            return jax.random.normal(jax.random.fold_in(k, 0),
                                     (real_stack.shape[0], ens.cfg.z_dim))

        def cs(k):
            """Fresh per-phase gen labels: a permutation of the host-sampled
            label pool (reference draws fresh phase_gen_c per phase)."""
            if gen_c is None:
                return None
            return jax.random.permutation(jax.random.fold_in(k, 2), gen_c,
                                          axis=0)

        def set_mapping_stats(ms):
            variables['mapping'] = {**variables['mapping'], 'moving_stats': ms}

        # ---------------- Renderer phase (interval 1) ---------------------
        if do_renderer and hyper.train_renderer and self._use_renderer:
            k = phase_rng()
            frozen = {'mapping': variables['mapping'],
                      'local_g': tuple(variables['local_g']),
                      'stn': variables['stn']}

            def rloss(r_params, data, rng_mb):
                z_mb, stack_mb = data
                rvars = {**variables['renderer'], 'params': r_params}
                return losses.renderer_loss(
                    rvars, ens, frozen, z_mb, stack_mb,
                    rng_mb, loss_type=hyper.renderer_loss,
                    use_real=hyper.renderer_use_real,
                    style_mixing_prob=hyper.style_mixing_prob)

            (loss, aux), grads = accum_value_and_grad(
                rloss, variables['renderer']['params'], (zs(k), real_stack),
                jax.random.fold_in(k, 1), hyper.global_accum_rounds)
            grads = _nan_to_num(grads)
            updates, opt_states['renderer'] = self.tx_renderer.update(
                grads, opt_states['renderer'], variables['renderer']['params'])
            variables['renderer'] = {
                **variables['renderer'],
                'params': optax.apply_updates(variables['renderer']['params'],
                                              updates)}
            stats.update(aux['stats'])

        # ---------------- Local GAN phases --------------------------------
        if do_local and hyper.train_local:
            for i in range(num_layers):
                name = ens.cfg.layer_names[i]
                # ---- local_Gmain
                k = phase_rng()

                def gmain(m_params, g_params, k=k, i=i):
                    diff = {'mapping': {**variables['mapping'],
                                        'params': m_params},
                            'g': {**variables['local_g'][i],
                                  'params': g_params}}
                    return losses.local_gmain_loss(
                        diff, ens, i, variables['local_d'][i], zs(k),
                        jax.random.fold_in(k, 1), self._local_aug,
                        state.aug_p[i], hyper.style_mixing_prob, c=cs(k))

                (loss, aux), grads = jax.value_and_grad(
                    gmain, argnums=(0, 1), has_aux=True)(
                    variables['mapping']['params'],
                    variables['local_g'][i]['params'])
                set_mapping_stats(aux['moving_stats'])
                gtree = _nan_to_num({'mapping': grads[0], 'g': grads[1]})
                params = {'mapping': variables['mapping']['params'],
                          'g': variables['local_g'][i]['params']}
                updates, opt_states['local_g'][i] = self.tx_local_g.update(
                    gtree, opt_states['local_g'][i], params)
                new_params = optax.apply_updates(params, updates)
                variables['mapping'] = {**variables['mapping'],
                                        'params': new_params['mapping']}
                variables['local_g'][i] = {**variables['local_g'][i],
                                           'params': new_params['g']}
                _merge_stats(stats, {f'{name}/{k2}': v for k2, v in
                                     aux['stats'].items()})

                # ---- local_Greg (path length, every g_reg_interval)
                if hyper.g_reg_interval is not None and hyper.pl_weight != 0:
                    k = phase_rng()
                    gain = float(hyper.g_reg_interval)
                    do_reg = (step % hyper.g_reg_interval) == 0

                    def gpl(m_params, g_params, k=k, i=i):
                        diff = {'mapping': {**variables['mapping'],
                                            'params': m_params},
                                'g': {**variables['local_g'][i],
                                      'params': g_params}}
                        loss, aux = losses.local_gpl_loss(
                            diff, ens, i, zs(k), jax.random.fold_in(k, 1),
                            pl_mean[i], hyper.pl_batch_shrink, hyper.pl_decay,
                            hyper.pl_weight, hyper.style_mixing_prob,
                            c=cs(k))
                        return loss * gain, aux

                    def do_gpl(carry):
                        m_params, g_params, opt, pl_i, ms = carry
                        (loss, aux), grads = jax.value_and_grad(
                            gpl, argnums=(0, 1), has_aux=True)(m_params,
                                                               g_params)
                        gtree = _nan_to_num({'mapping': grads[0],
                                             'g': grads[1]})
                        params = {'mapping': m_params, 'g': g_params}
                        updates, opt = self.tx_local_g.update(gtree, opt,
                                                              params)
                        new = optax.apply_updates(params, updates)
                        return (new['mapping'], new['g'], opt,
                                aux['pl_mean'], aux['moving_stats'])

                    carry = (variables['mapping']['params'],
                             variables['local_g'][i]['params'],
                             opt_states['local_g'][i], pl_mean[i],
                             variables['mapping']['moving_stats'])
                    carry = jax.lax.cond(do_reg, do_gpl, lambda c: c, carry)
                    (m_p, g_p, opt_states['local_g'][i], pl_i, ms) = carry
                    variables['mapping'] = {**variables['mapping'],
                                            'params': m_p,
                                            'moving_stats': ms}
                    variables['local_g'][i] = {**variables['local_g'][i],
                                               'params': g_p}
                    pl_mean = pl_mean.at[i].set(pl_i)

                # ---- local_Dmain
                k = phase_rng()

                def dmain(d_params, k=k, i=i):
                    dvars = {**variables['local_d'][i], 'params': d_params}
                    frozen = {'mapping': variables['mapping'],
                              'g': variables['local_g'][i]}
                    return losses.local_dmain_loss(
                        dvars, ens, i, frozen, zs(k), real_crops[i],
                        jax.random.fold_in(k, 1), self._local_aug,
                        state.aug_p[i], hyper.style_mixing_prob,
                        gen_c=cs(k), real_c=real_c)

                (loss, aux), grads = jax.value_and_grad(
                    dmain, has_aux=True)(variables['local_d'][i]['params'])
                set_mapping_stats(aux['moving_stats'])
                grads = _nan_to_num(grads)
                updates, opt_states['local_d'][i] = self.tx_local_d.update(
                    grads, opt_states['local_d'][i],
                    variables['local_d'][i]['params'])
                variables['local_d'][i] = {
                    **variables['local_d'][i],
                    'params': optax.apply_updates(
                        variables['local_d'][i]['params'], updates)}
                _merge_stats(stats, {f'{name}/{k2}': v for k2, v in
                                     aux['stats'].items()})
                sign_sum = sign_sum.at[i].add(aux['sign_real'])
                sign_count = sign_count.at[i].add(1.0)

                # ---- local_Dreg (R1, every d_reg_interval)
                if hyper.d_reg_interval is not None and hyper.r1_gamma != 0:
                    k = phase_rng()
                    gain = float(hyper.d_reg_interval)
                    do_reg = (step % hyper.d_reg_interval) == 0

                    def dr1(d_params, k=k, i=i):
                        dvars = {**variables['local_d'][i], 'params': d_params}
                        loss, aux = losses.local_dr1_loss(
                            dvars, ens, i, real_crops[i],
                            jax.random.fold_in(k, 1), self._local_aug,
                            state.aug_p[i], hyper.r1_gamma, real_c=real_c)
                        return loss * gain, aux

                    def do_dr1(carry):
                        d_params, opt, ss, sc = carry
                        (loss, aux), grads = jax.value_and_grad(
                            dr1, has_aux=True)(d_params)
                        grads = _nan_to_num(grads)
                        updates, opt = self.tx_local_d.update(grads, opt,
                                                              d_params)
                        ss = ss.at[i].add(aux['sign_real'])
                        sc = sc.at[i].add(1.0)
                        return (optax.apply_updates(d_params, updates), opt,
                                ss, sc)

                    carry = (variables['local_d'][i]['params'],
                             opt_states['local_d'][i], sign_sum, sign_count)
                    carry = jax.lax.cond(do_reg, do_dr1, lambda c: c, carry)
                    (d_p, opt_states['local_d'][i], sign_sum,
                     sign_count) = carry
                    variables['local_d'][i] = {**variables['local_d'][i],
                                               'params': d_p}

        # ---------------- Global phases -----------------------------------
        if ((do_global_g or do_global_d) and hyper.train_global
                and ens.stn is not None):
            goi = hyper.global_optimize_interval
            k = phase_rng()
            do_glob = True if host_scheduled else (step % goi) == 0

            def build_gg_vars(p):
                diff = {'mapping': {**variables['mapping'],
                                    'params': p['mapping']},
                        'stn': {**variables['stn'], 'params': p['stn']}}
                if hyper.global_g_optimize_synthesis:
                    diff['local_g'] = tuple(
                        {**variables['local_g'][i], 'params': p['local_g'][i]}
                        for i in range(num_layers))
                else:
                    diff['local_g'] = tuple(
                        jax.tree_util.tree_map(jax.lax.stop_gradient,
                                               variables['local_g'][i])
                        for i in range(num_layers))
                return diff

            def ggmain(p, data, rng_mb):
                (z_mb,) = data
                diff = build_gg_vars(p)
                frozen = {'global_d': variables['global_d'],
                          'renderer': variables.get('renderer')}
                loss, aux = losses.global_gmain_loss(
                    diff, ens, frozen, z_mb, rng_mb,
                    self._global_aug, state.aug_p[num_layers],
                    hyper.style_mixing_prob, self._use_renderer)
                return loss * float(goi), aux

            def do_ggmain(carry):
                p, opt, ms, _ = carry
                (loss, aux), grads = accum_value_and_grad(
                    ggmain, p, (zs(k),), jax.random.fold_in(k, 1),
                    hyper.global_accum_rounds)
                grads = _nan_to_num(grads)
                updates, opt = self.tx_global_g.update(grads, opt, p)
                return (optax.apply_updates(p, updates), opt,
                        aux['moving_stats'], dict(aux['stats']))

            if do_global_g:
                p0 = self._global_g_params(variables)
                zero_st = _zero_stats_like(ggmain, p0, (zs(k),),
                                           jax.random.fold_in(k, 1))
                carry = (p0, opt_states['global_g'],
                         variables['mapping']['moving_stats'], zero_st)
                carry = (do_ggmain(carry) if host_scheduled
                         else jax.lax.cond(do_glob, do_ggmain, lambda c: c,
                                           carry))
                p1, opt_states['global_g'], ms, gg_st = carry
                stats.update({f'global/{k}': v for k, v in gg_st.items()})
                variables['mapping'] = {**variables['mapping'],
                                        'params': p1['mapping'],
                                        'moving_stats': ms}
                variables['stn'] = {**variables['stn'], 'params': p1['stn']}
                if hyper.global_g_optimize_synthesis:
                    for i in range(num_layers):
                        variables['local_g'][i] = {**variables['local_g'][i],
                                                   'params': p1['local_g'][i]}

            # ---- global_Dmain
            k = phase_rng()

            def gdmain(d_params, data, rng_mb):
                z_mb, stack_mb = data
                dvars = {**variables['global_d'], 'params': d_params}
                frozen = {'mapping': variables['mapping'],
                          'local_g': tuple(variables['local_g']),
                          'stn': variables['stn'],
                          'renderer': variables.get('renderer')}
                loss, aux = losses.global_dmain_loss(
                    dvars, ens, frozen, z_mb, stack_mb,
                    rng_mb, self._global_aug,
                    state.aug_p[num_layers], hyper.style_mixing_prob,
                    self._use_renderer, hyper.global_d_real_use_renderer)
                return loss * float(goi), aux

            def do_gdmain(carry):
                d_params, opt, ms, ss, sc, _ = carry
                (loss, aux), grads = accum_value_and_grad(
                    gdmain, d_params, (zs(k), real_stack),
                    jax.random.fold_in(k, 1), hyper.global_accum_rounds)
                grads = _nan_to_num(grads)
                updates, opt = self.tx_global_d.update(grads, opt, d_params)
                ss = ss.at[num_layers].add(aux['sign_real'])
                sc = sc.at[num_layers].add(1.0)
                return (optax.apply_updates(d_params, updates), opt,
                        aux['moving_stats'], ss, sc, dict(aux['stats']))

            if do_global_dmain:
                zero_st = _zero_stats_like(gdmain,
                                           variables['global_d']['params'],
                                           (zs(k), real_stack),
                                           jax.random.fold_in(k, 1))
                carry = (variables['global_d']['params'],
                         opt_states['global_d'],
                         variables['mapping']['moving_stats'], sign_sum,
                         sign_count, zero_st)
                carry = (do_gdmain(carry) if host_scheduled
                         else jax.lax.cond(do_glob, do_gdmain, lambda c: c,
                                           carry))
                (gd_p, opt_states['global_d'], ms, sign_sum, sign_count,
                 gd_st) = carry
                stats.update({f'global/{k}': v for k, v in gd_st.items()})
                variables['global_d'] = {**variables['global_d'],
                                         'params': gd_p}
                variables['mapping'] = {**variables['mapping'],
                                        'moving_stats': ms}

            # ---- global_Dreg (R1)
            if (do_global_d
                    and hyper.d_reg_interval is not None
                    and hyper.global_r1_gamma != 0
                    and (do_dreg or not host_scheduled)):
                k = phase_rng()
                interval = hyper.d_reg_interval * goi
                do_reg = True if host_scheduled else (step % interval) == 0

                def gdr1(d_params, data, rng_mb):
                    (stack_mb,) = data
                    dvars = {**variables['global_d'], 'params': d_params}
                    frozen = {'renderer': variables.get('renderer')}
                    loss, aux = losses.global_dr1_loss(
                        dvars, ens, frozen, stack_mb,
                        rng_mb, self._global_aug,
                        state.aug_p[num_layers], hyper.global_r1_gamma,
                        self._use_renderer, hyper.global_d_real_use_renderer)
                    return loss * float(interval), aux

                def do_gdr1(carry):
                    d_params, opt, ss, sc, _ = carry
                    (loss, aux), grads = accum_value_and_grad(
                        gdr1, d_params, (real_stack,),
                        jax.random.fold_in(k, 1), hyper.global_accum_rounds)
                    grads = _nan_to_num(grads)
                    updates, opt = self.tx_global_d.update(grads, opt,
                                                           d_params)
                    ss = ss.at[num_layers].add(aux['sign_real'])
                    sc = sc.at[num_layers].add(1.0)
                    return (optax.apply_updates(d_params, updates), opt,
                            ss, sc, dict(aux['stats']))

                zero_st = _zero_stats_like(gdr1,
                                           variables['global_d']['params'],
                                           (real_stack,),
                                           jax.random.fold_in(k, 1))
                carry = (variables['global_d']['params'],
                         opt_states['global_d'], sign_sum, sign_count,
                         zero_st)
                carry = (do_gdr1(carry) if host_scheduled
                         else jax.lax.cond(do_reg, do_gdr1, lambda c: c,
                                           carry))
                (gd_p, opt_states['global_d'], sign_sum, sign_count,
                 gdr1_st) = carry
                stats.update({f'global/{k}': v for k, v in gdr1_st.items()})
                variables['global_d'] = {**variables['global_d'],
                                         'params': gd_p}

        # ---------------- EMA (reference: training_loop_aio.py:640-666) ----
        if not do_ema_ada:
            variables['local_g'] = tuple(variables['local_g'])
            variables['local_d'] = tuple(variables['local_d'])
            if 'local_g' in opt_states:
                opt_states['local_g'] = tuple(opt_states['local_g'])
                opt_states['local_d'] = tuple(opt_states['local_d'])
            mid = MontageTrainState(
                variables=variables, ema=state.ema, opt_states=opt_states,
                pl_mean=pl_mean, aug_p=state.aug_p, ada_sign_sum=sign_sum,
                ada_sign_count=sign_count, step=step)
            return mid, stats

        cur_nimg = (step.astype(jnp.float32) + 1.0) * hyper.batch_size
        ema_nimg = hyper.ema_kimg * 1000.0
        if hyper.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * hyper.ema_rampup)
        ema_beta = 0.5 ** (hyper.batch_size / jnp.maximum(ema_nimg, 1e-8))

        def ema_update(ema_tree, new_tree):
            # params lerp towards current; non-param collections copied
            def upd(e, n):
                return n + ema_beta * (e - n)
            out = dict(new_tree)
            out['params'] = jax.tree_util.tree_map(
                upd, ema_tree['params'], new_tree['params'])
            return out

        ema = dict(state.ema)
        ema['mapping'] = ema_update(state.ema['mapping'], variables['mapping'])
        ema['local_g'] = tuple(
            ema_update(state.ema['local_g'][i], variables['local_g'][i])
            for i in range(num_layers))
        if 'stn' in state.ema:
            ema['stn'] = ema_update(state.ema['stn'], variables['stn'])

        # ---------------- ADA controller (reference: :672-683) -------------
        aug_p = state.aug_p
        if hyper.ada_target is not None and hyper.augment is not None:
            do_ada = ((step + 1) % hyper.ada_interval) == 0
            mean_sign = sign_sum / jnp.maximum(sign_count, 1.0)
            adjust = (jnp.sign(mean_sign - hyper.ada_target)
                      * (hyper.batch_size * hyper.ada_interval)
                      / (hyper.ada_kimg * 1000.0))
            # lanes with no D executions in this window (e.g. the global
            # pipe when global_optimize_interval > ada_interval) hold their
            # p instead of drifting toward sign(0 - target)
            adjust = jnp.where(sign_count > 0, adjust, 0.0)
            new_p = jnp.clip(aug_p + adjust, 0.0, hyper.aug_p_max)
            aug_p = jnp.where(do_ada, new_p, aug_p)
            sign_sum = jnp.where(do_ada, jnp.zeros_like(sign_sum), sign_sum)
            sign_count = jnp.where(do_ada, jnp.zeros_like(sign_count),
                                   sign_count)

        variables['local_g'] = tuple(variables['local_g'])
        variables['local_d'] = tuple(variables['local_d'])
        if 'local_g' in opt_states:
            opt_states['local_g'] = tuple(opt_states['local_g'])
            opt_states['local_d'] = tuple(opt_states['local_d'])

        new_state = MontageTrainState(
            variables=variables, ema=ema, opt_states=opt_states,
            pl_mean=pl_mean, aug_p=aug_p, ada_sign_sum=sign_sum,
            ada_sign_count=sign_count, step=step + 1)
        for li, name in enumerate(ens.cfg.layer_names):
            stats[f'Progress/augment_{name}'] = aug_p[li]
        stats['Progress/augment_global'] = aug_p[num_layers]
        return new_state, stats
