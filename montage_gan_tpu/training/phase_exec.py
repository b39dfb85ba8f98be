"""Per-phase training executor with geometry sharing.

The monolithic jitted step (training/train_step.py) is ideal for the
multichip dryrun and small configs, but its single XLA program grows with
9 local GANs × 4 phases + global + renderer and compiles slowly.  This
executor mirrors the reference's phase scheduler
(reference: custom/training_loop_aio.py:431-519,609-638) the TPU way:

  * ONE jitted program per phase *type* per layer *geometry* — the reference
    dataset has 9 layers but only 6 distinct geometries, and same-geometry
    layers reuse the same compiled program with different parameter pytrees
    (the layer index enters as a traced scalar for the ws slice);
  * lazy-regularization phases are skipped host-side by ``step % interval``
    (identical to the reference's interval check, :611), so reg steps cost
    nothing on off steps instead of a masked branch;
  * optimizer semantics are identical to the monolithic step: per-pair Adam
    with mb_ratio scaling, ``gain = interval`` loss scaling, nan_to_num
    scrubbing, sequential mapping updates.

All phase functions donate their parameter/optimizer buffers.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.ensemble import MontageEnsemble
from . import losses
from .train_step import MontageTrainer, MontageTrainState, _nan_to_num


def _accum_vag(loss_fn, params: Tuple, data: Tuple, rng, rounds: int):
    """value_and_grad with gradient accumulation over microbatch rounds.

    ``loss_fn(*params, *data, rng) → (loss, aux)``; data leaves have leading
    batch dim.  Gradients are SUMMED over rounds (the reference's
    un-normalized accumulation, custom/loss_aio.py:52-63 +
    training_loop_aio.py:620-627); aux['stats']/aux['sign_real'] are averaged
    over rounds; other aux entries (moving_stats, pl_mean) keep the last
    round's value.
    """
    argnums = tuple(range(len(params)))
    vag = jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
    if rounds == 1:
        (loss, aux), grads = vag(*params, *data, rng)
        return (loss, aux), grads

    data_r = jax.tree_util.tree_map(
        lambda x: x.reshape((rounds, x.shape[0] // rounds) + x.shape[1:]),
        data)
    rngs = jax.random.split(rng, rounds)
    gzero = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(gsum, xs):
        d, r = xs
        (loss, aux), g = vag(*params, *d, r)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        return gsum, (loss, aux)

    gsum, (loss_seq, aux_seq) = jax.lax.scan(body, gzero, (data_r, rngs))

    def reduce_aux(a):
        out = dict(a)
        for k in ('stats',):
            if k in out:
                out[k] = jax.tree_util.tree_map(lambda x: jnp.mean(x),
                                                out[k])
        for k in ('sign_real',):
            if k in out:
                out[k] = jnp.mean(out[k])
        for k in ('moving_stats', 'pl_mean'):
            if k in out:
                out[k] = jax.tree_util.tree_map(lambda x: x[-1], out[k])
        return out

    aux = reduce_aux(aux_seq)
    return (jnp.mean(loss_seq), aux), gsum


class PhaseExecutor:
    def __init__(self, trainer: MontageTrainer):
        self.trainer = trainer
        self.ens = trainer.ens
        self.hyper = trainer.hyper
        # geometry key → representative layer index
        self._geom_of_layer = []
        self._geom_rep: Dict[Tuple, int] = {}
        for i in range(self.ens.cfg.num_layers):
            key = self.ens.cfg.layer_targets[i]
            self._geom_rep.setdefault(key, i)
            self._geom_of_layer.append(self._geom_rep[key])
        self._fns: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Jitted phase builders (cached per geometry representative)
    # ------------------------------------------------------------------

    def _gmain_fn(self, rep: int):
        key = ('gmain', rep)
        if key in self._fns:
            return self._fns[key]
        ens, hyper, tx = self.ens, self.hyper, self.trainer.tx_local_g

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def fn(m_vars, g_vars, opt, d_vars, layer_idx, z, rng, aug_p):
            def loss_fn(m_params, g_params, z_mb, rng_mb):
                diff = {'mapping': {**m_vars, 'params': m_params},
                        'g': {**g_vars, 'params': g_params}}
                return losses.local_gmain_loss(
                    diff, ens, rep, d_vars, z_mb, rng_mb,
                    self.trainer._local_aug, aug_p,
                    hyper.style_mixing_prob, layer_idx=layer_idx)

            (loss, aux), grads = _accum_vag(
                loss_fn, (m_vars['params'], g_vars['params']), (z,), rng,
                hyper.accum_rounds)
            gtree = _nan_to_num({'mapping': grads[0], 'g': grads[1]})
            params = {'mapping': m_vars['params'], 'g': g_vars['params']}
            updates, opt = tx.update(gtree, opt, params)
            new = optax.apply_updates(params, updates)
            m_out = {**m_vars, 'params': new['mapping'],
                     'moving_stats': aux['moving_stats']}
            g_out = {**g_vars, 'params': new['g']}
            return m_out, g_out, opt, aux['stats']

        self._fns[key] = fn
        return fn

    def _gpl_fn(self, rep: int):
        key = ('gpl', rep)
        if key in self._fns:
            return self._fns[key]
        ens, hyper, tx = self.ens, self.hyper, self.trainer.tx_local_g
        gain = float(hyper.g_reg_interval)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def fn(m_vars, g_vars, opt, layer_idx, z, rng, pl_mean_i):
            def loss_fn(m_params, g_params, z_mb, rng_mb):
                diff = {'mapping': {**m_vars, 'params': m_params},
                        'g': {**g_vars, 'params': g_params}}
                loss, aux = losses.local_gpl_loss(
                    diff, ens, rep, z_mb, rng_mb, pl_mean_i,
                    hyper.pl_batch_shrink, hyper.pl_decay, hyper.pl_weight,
                    hyper.style_mixing_prob, layer_idx=layer_idx)
                return loss * gain, aux

            (loss, aux), grads = _accum_vag(
                loss_fn, (m_vars['params'], g_vars['params']), (z,), rng,
                hyper.accum_rounds)
            gtree = _nan_to_num({'mapping': grads[0], 'g': grads[1]})
            params = {'mapping': m_vars['params'], 'g': g_vars['params']}
            updates, opt = tx.update(gtree, opt, params)
            new = optax.apply_updates(params, updates)
            m_out = {**m_vars, 'params': new['mapping'],
                     'moving_stats': aux['moving_stats']}
            g_out = {**g_vars, 'params': new['g']}
            return m_out, g_out, opt, aux['pl_mean'], aux['stats']

        self._fns[key] = fn
        return fn

    def _dmain_fn(self, rep: int):
        key = ('dmain', rep)
        if key in self._fns:
            return self._fns[key]
        ens, hyper, tx = self.ens, self.hyper, self.trainer.tx_local_d

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fn(d_vars, opt, m_vars, g_vars, layer_idx, z, real, rng, aug_p):
            def loss_fn(d_params, z_mb, real_mb, rng_mb):
                dv = {**d_vars, 'params': d_params}
                frozen = {'mapping': m_vars, 'g': g_vars}
                return losses.local_dmain_loss(
                    dv, ens, rep, frozen, z_mb, real_mb, rng_mb,
                    self.trainer._local_aug, aug_p, hyper.style_mixing_prob,
                    layer_idx=layer_idx)

            (loss, aux), grads = _accum_vag(
                loss_fn, (d_vars['params'],), (z, real), rng,
                hyper.accum_rounds)
            grads = grads[0]
            grads = _nan_to_num(grads)
            updates, opt = tx.update(grads, opt, d_vars['params'])
            d_out = {**d_vars,
                     'params': optax.apply_updates(d_vars['params'], updates)}
            return (d_out, opt, aux['moving_stats'], aux['sign_real'],
                    aux['stats'])

        self._fns[key] = fn
        return fn

    def _dr1_fn(self, rep: int):
        key = ('dr1', rep)
        if key in self._fns:
            return self._fns[key]
        ens, hyper, tx = self.ens, self.hyper, self.trainer.tx_local_d
        gain = float(hyper.d_reg_interval)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fn(d_vars, opt, real, rng, aug_p):
            def loss_fn(d_params, real_mb, rng_mb):
                dv = {**d_vars, 'params': d_params}
                loss, aux = losses.local_dr1_loss(
                    dv, ens, rep, real_mb, rng_mb, self.trainer._local_aug,
                    aug_p, hyper.r1_gamma)
                return loss * gain, aux

            (loss, aux), grads = _accum_vag(
                loss_fn, (d_vars['params'],), (real,), rng,
                hyper.accum_rounds)
            grads = grads[0]
            grads = _nan_to_num(grads)
            updates, opt = tx.update(grads, opt, d_vars['params'])
            d_out = {**d_vars,
                     'params': optax.apply_updates(d_vars['params'], updates)}
            return d_out, opt, aux['sign_real'], aux['stats']

        self._fns[key] = fn
        return fn

    def _tail_fn(self):
        """Global G/D phases, renderer, and EMA/ADA — each compiled as its
        OWN program (static gate flags), so no single program's live set
        exceeds HBM (the fused tail OOM'd at 23G on a 16G chip)."""
        if 'tail' in self._fns:
            return self._fns['tail']
        trainer = self.trainer

        @functools.partial(
            jax.jit, donate_argnums=(0,),
            static_argnames=('do_dreg', 'do_global_g', 'do_global_d',
                             'do_global_dmain', 'do_renderer', 'do_ema_ada'))
        def fn(state, stack, crops, rng, do_dreg=False, do_global_g=False,
               do_global_d=False, do_global_dmain=None, do_renderer=False,
               do_ema_ada=False):
            return trainer.partial_step(state, stack, crops, rng,
                                        do_local=False, do_global=False,
                                        do_greg=False, do_dreg=do_dreg,
                                        do_global_g=do_global_g,
                                        do_global_d=do_global_d,
                                        do_global_dmain=do_global_dmain,
                                        do_renderer=do_renderer,
                                        do_ema_ada=do_ema_ada,
                                        host_scheduled=True)

        self._fns['tail'] = fn
        return fn

    # ------------------------------------------------------------------
    # The step
    # ------------------------------------------------------------------

    def step(self, state: MontageTrainState, stack, crops, rng,
             time_phases: bool = False, step_idx: Optional[int] = None):
        """One full training iteration; the step index drives the intervals
        host-side.  Returns (new_state, stats).

        ``step_idx``: host-known step counter.  Pass it to avoid a device
        sync on ``state.step`` — the sync stalls the dispatch pipeline every
        step (expensive over a remote device transport).

        ``time_phases=True`` synchronizes after every phase and reports
        ``Timing/<phase>`` wall-times (the reference's per-phase CUDA-event
        timing, custom/training_loop_aio.py:511-516,860-865); costs pipeline
        overlap, so enable only on tick boundaries."""
        import time as _time
        ens, hyper = self.ens, self.hyper
        if step_idx is None:
            step_idx = int(state.step)
        stats: Dict[str, Any] = {}

        def timed(phase_name, fn, *args, **kwargs):
            # named region for profiler traces (the reference's
            # record_function annotation, custom/loss_aio.py:105 etc.)
            with jax.profiler.TraceAnnotation(phase_name):
                if not time_phases:
                    return fn(*args, **kwargs)
                t0 = _time.time()
                out = fn(*args, **kwargs)
                jax.block_until_ready(out)
                stats[f'Timing/{phase_name}'] = _time.time() - t0
                return out
        variables = dict(state.variables)
        local_g = list(variables['local_g'])
        local_d = list(variables['local_d'])
        opt_states = dict(state.opt_states)
        opt_g = list(opt_states.get('local_g', ()))
        opt_d = list(opt_states.get('local_d', ()))
        pl_mean = state.pl_mean
        sign_sum = state.ada_sign_sum
        sign_count = state.ada_sign_count
        mapping = variables['mapping']

        phase = 0

        def prng():
            nonlocal phase
            phase += 1
            return jax.random.fold_in(rng, phase)

        def zs(k):
            return jax.random.normal(jax.random.fold_in(k, 0),
                                     (stack.shape[0], ens.cfg.z_dim))

        if hyper.train_local:
            for i in range(ens.cfg.num_layers):
                rep = self._geom_of_layer[i]
                name = ens.cfg.layer_names[i]
                li = jnp.asarray(i, jnp.int32)

                k = prng()
                mapping, local_g[i], opt_g[i], st = timed(
                    f'local_Gmain_{name}', self._gmain_fn(rep),
                    mapping, local_g[i], opt_g[i], local_d[i], li, zs(k),
                    jax.random.fold_in(k, 1), state.aug_p[i])
                stats.update({f'{name}/{s}': v for s, v in st.items()})

                if (hyper.g_reg_interval is not None and hyper.pl_weight != 0
                        and step_idx % hyper.g_reg_interval == 0):
                    k = prng()
                    mapping, local_g[i], opt_g[i], pl_i, st = timed(
                        f'local_Greg_{name}', self._gpl_fn(rep),
                        mapping, local_g[i], opt_g[i], li, zs(k),
                        jax.random.fold_in(k, 1), pl_mean[i])
                    pl_mean = pl_mean.at[i].set(pl_i)
                    stats.update({f'{name}/{s}': v for s, v in st.items()})
                else:
                    prng()

                k = prng()
                local_d[i], opt_d[i], ms, sr, st = timed(
                    f'local_Dmain_{name}', self._dmain_fn(rep),
                    local_d[i], opt_d[i], mapping, local_g[i], li, zs(k),
                    crops[i], jax.random.fold_in(k, 1), state.aug_p[i])
                mapping = {**mapping, 'moving_stats': ms}
                sign_sum = sign_sum.at[i].add(sr)
                sign_count = sign_count.at[i].add(1.0)
                stats.update({f'{name}/{s}': v for s, v in st.items()})

                if (hyper.d_reg_interval is not None and hyper.r1_gamma != 0
                        and step_idx % hyper.d_reg_interval == 0):
                    k = prng()
                    local_d[i], opt_d[i], sr, st = timed(
                        f'local_Dreg_{name}', self._dr1_fn(rep),
                        local_d[i], opt_d[i], crops[i],
                        jax.random.fold_in(k, 1), state.aug_p[i])
                    sign_sum = sign_sum.at[i].add(sr)
                    sign_count = sign_count.at[i].add(1.0)
                    stats.update({f'{name}/{s}': v for s, v in st.items()})
                else:
                    prng()

        # reassemble state for the global/renderer/EMA/ADA tail
        variables['mapping'] = mapping
        variables['local_g'] = tuple(local_g)
        variables['local_d'] = tuple(local_d)
        if opt_g:
            opt_states['local_g'] = tuple(opt_g)
            opt_states['local_d'] = tuple(opt_d)
        mid_state = state.replace(variables=variables, opt_states=opt_states,
                                  pl_mean=pl_mean, ada_sign_sum=sign_sum,
                                  ada_sign_count=sign_count)

        goi = hyper.global_optimize_interval
        do_global = (hyper.train_global and ens.stn is not None
                     and step_idx % goi == 0)
        do_dreg = (do_global and hyper.d_reg_interval is not None
                   and hyper.global_r1_gamma != 0
                   and step_idx % (hyper.d_reg_interval * goi) == 0)
        do_renderer = hyper.train_renderer and self.trainer._use_renderer

        tail = self._tail_fn()
        st = mid_state
        if do_renderer:
            st, t_stats = timed('Renderer', tail, st, stack, crops,
                                jax.random.fold_in(rng, 9996),
                                do_renderer=True)
            stats.update(t_stats)
        if do_global:
            st, t_stats = timed('global_Gmain', tail, st, stack, crops,
                                jax.random.fold_in(rng, 9997),
                                do_global_g=True)
            stats.update(t_stats)
            st, t_stats = timed('global_Dmain', tail, st, stack, crops,
                                jax.random.fold_in(rng, 9998),
                                do_global_d=True, do_dreg=False)
            stats.update(t_stats)
        if do_dreg:
            st, t_stats = timed('global_Dreg', tail, st, stack, crops,
                                jax.random.fold_in(rng, 9999),
                                do_global_d=True, do_global_dmain=False,
                                do_dreg=True)
            stats.update(t_stats)
        new_state, t_stats = timed('ema_ada', tail, st, stack, crops,
                                   jax.random.fold_in(rng, 10000),
                                   do_ema_ada=True)
        stats.update(t_stats)
        return new_state, stats
