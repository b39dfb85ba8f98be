"""Per-phase training executor with geometry sharing.

The monolithic jitted step (training/train_step.py) is ideal for the
multichip dryrun and small configs, but its single XLA program grows with
9 local GANs × 4 phases + global + renderer and compiles slowly.  This
executor mirrors the reference's phase scheduler
(reference: custom/training_loop_aio.py:431-519,609-638) the TPU way:

  * ONE jitted program per local *phase kind* per layer geometry — Gmain,
    Greg (path length), Dmain, Dreg (R1) are each their own program,
    dispatched in the reference's exact per-layer order
    (custom/training_loop_aio.py:443-519).  The RNG phase keys and the z
    draws are derived in-program, and the layer index enters as a traced
    scalar, so the reference dataset's 9 layers share 6 geometries' worth
    of compiled programs.  Phase-kind granularity (rather than one fused
    per-layer program per reg combo) means there is exactly ONE compiled
    artifact per (kind, geometry) — no duplicated Gmain/Dmain code across
    reg-combo variants — which cuts the serialized-executable bytes a
    fresh process must pull through the persistent compile cache by ~2×
    (the dominant startup cost on remote-tunnelled devices) and lets a
    step at ANY reg phase run right after the first full-reg step with no
    further compiles or cache loads.  Dispatch is asynchronous, so the
    extra program boundary per layer costs only enqueue overhead
    (measured ≈ 0.1 s against a ~5.4 s step);
  * lazy-regularization phases are gated host-side by ``step % interval``
    (identical to the reference's interval check, :611), simply by not
    dispatching the reg programs on off-interval steps;
  * optimizer semantics are identical to the monolithic step: per-pair Adam
    with mb_ratio scaling, ``gain = interval`` loss scaling, nan_to_num
    scrubbing, sequential mapping updates.

All phase programs donate the state buffers they update; frozen inputs
(e.g. D's variables inside Gmain, G's inside Dmain, the real crops, aug_p)
are not donated so they stay live for the following phases.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from . import losses
from .train_step import MontageTrainer, MontageTrainState, _nan_to_num


def _merge_stats(stats, new):
    """Merge a phase's stat dict; colliding keys (e.g. Loss/scores/fake
    reported by both Gmain and Dmain) average equal-weight, matching the
    reference's training_stats accumulation of both phases' reports under
    one name (custom/loss_aio.py Gmain :138 + Dmain :111)."""
    for k, v in new.items():
        stats[k] = (stats[k] + v) * 0.5 if k in stats else v


def _accum_vag(loss_fn, params, data, rng, rounds: int):
    """value_and_grad with gradient accumulation over microbatch rounds —
    positional-args adapter over train_step.accum_value_and_grad (the single
    source of the SUM-grads / mean-stats / mean-EMA-aux contract — averaging
    the per-round EMA outputs equals one full-batch EMA update by linearity,
    see its docstring; reference custom/loss_aio.py:52-63 +
    training_loop_aio.py:620-627).

    ``loss_fn(*params, *data, rng) → (loss, aux)``; returns
    ``((loss, aux), grads_tuple)`` with one gradient per params entry.
    """
    from .train_step import accum_value_and_grad

    def wrapped(params_t, data_t, rng_mb):
        return loss_fn(*params_t, *data_t, rng_mb)

    return accum_value_and_grad(wrapped, tuple(params), tuple(data), rng,
                                rounds)


def _phase_key(rng, layer_idx, j):
    """Phase k of layer i uses ``fold_in(rng, 4*i + 1 + k)`` — identical
    streams to the monolithic step (the reference's fresh-z-per-phase rule,
    custom/training_loop_aio.py:606-607)."""
    return jax.random.fold_in(rng, 4 * layer_idx + 1 + j)


class PhaseExecutor:
    def __init__(self, trainer: MontageTrainer,
                 merge_locals: str = 'per_layer'):
        """``merge_locals``:

        * 'per_layer' (default) — one program per phase kind × layer
          geometry, dispatched per layer in the reference's exact order
          (bit-exact reference phase semantics; ~22 async dispatches/step,
          measured enqueue cost ≈ 0.1 s against a multi-second step).
        * 'bucket' — same-geometry layers run VMAPPED over stacked
          per-layer params, one program per phase kind per geometry
          bucket (SURVEY §7.1's "vectorize the layer axis" design —
          BUILT AND MEASURED SLOWER on v5e, kept as the reference
          implementation of that experiment: the four-layer 256² bucket
          measures 2.90 s vs 1.66 s for the same four layers dispatched
          per-layer, 5.81 vs 4.70 s/step end-to-end in the same r4
          pre-warp-sweep measurement window.  The vmap
          turns the per-layer convs into grouped convs and the warp's
          window slices into batched gathers, losing more MXU efficiency
          than the saved dispatches are worth; at bucket_microbatch
          matching the per-layer working set the program OOMs a 16G part
          next to the resident state.)  Within a bucket the G-phase
          gradients are computed at the bucket-entry mapping parameters
          (staleness of order lr·lr_mult ≈ 2.5e-5, pinned by
          tests/test_bucket_exec.py); per-layer Adam moments, RNG
          streams, and the sequential w_avg EMA are preserved exactly
          (closed form — losses.seq_moving_stats).
        * 'all' — every layer's phases in ONE program per reg combo
          (fewest dispatches, largest compiles; needs >16G HBM at the
          production config).
        """
        assert merge_locals in ('per_layer', 'all', 'bucket')
        self.merge_locals = merge_locals
        # AOT executables from precompile(), keyed (program_key, statics);
        # dispatch prefers these (jit's dispatch cache does NOT reuse AOT
        # artifacts, so routing around it avoids paying the compile/
        # deserialize/program-load cost twice)
        self._aot: Dict[Any, Any] = {}
        # dispatch accounting: AOT executions per key, and jit-path
        # dispatches of programs precompile never covered (see _dispatch)
        self.aot_hits: Dict[Any, int] = {}
        self.aot_misses: Dict[Any, int] = {}
        self._aot_fallback_warned: set = set()
        self.trainer = trainer
        self.ens = trainer.ens
        self.hyper = trainer.hyper
        # geometry key → representative layer index
        self._geom_of_layer = []
        self._geom_rep: Dict[Any, int] = {}
        for i in range(self.ens.cfg.num_layers):
            key = self.ens.cfg.layer_targets[i]
            self._geom_rep.setdefault(key, i)
            self._geom_of_layer.append(self._geom_rep[key])
        # geometry buckets in first-layer order: [(rep, [layer indices])]
        self._buckets = []
        by_rep: Dict[int, list] = {}
        for i, rep in enumerate(self._geom_of_layer):
            if rep not in by_rep:
                by_rep[rep] = []
                self._buckets.append((rep, by_rep[rep]))
            by_rep[rep].append(i)
        self._fns: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    # Per-phase traced bodies (shared by the split per-phase programs and
    # the merged 'all' program)
    # ------------------------------------------------------------------

    def _gmain_body(self, rep, m_vars, g_vars, opt_g, d_vars, layer_idx,
                    real, rng, aug_p):
        ens, hyper = self.ens, self.hyper
        k = _phase_key(rng, layer_idx, 0)
        z = jax.random.normal(jax.random.fold_in(k, 0),
                              (real.shape[0], ens.cfg.z_dim))
        aug_p_i = aug_p[layer_idx]

        def gmain_loss(m_params, g_params, z_mb, rng_mb):
            diff = {'mapping': {**m_vars, 'params': m_params},
                    'g': {**g_vars, 'params': g_params}}
            return losses.local_gmain_loss(
                diff, ens, rep, d_vars, z_mb, rng_mb,
                self.trainer._local_aug, aug_p_i,
                hyper.style_mixing_prob, layer_idx=layer_idx)

        (_, aux), grads = _accum_vag(
            gmain_loss, (m_vars['params'], g_vars['params']),
            (z,), jax.random.fold_in(k, 1), hyper.accum_rounds)
        gtree = _nan_to_num({'mapping': grads[0], 'g': grads[1]})
        params = {'mapping': m_vars['params'], 'g': g_vars['params']}
        updates, opt_g = self.trainer.tx_local_g.update(gtree, opt_g, params)
        new = optax.apply_updates(params, updates)
        m_vars = {**m_vars, 'params': new['mapping'],
                  'moving_stats': aux['moving_stats']}
        g_vars = {**g_vars, 'params': new['g']}
        return m_vars, g_vars, opt_g, aux['stats']

    def _greg_body(self, rep, m_vars, g_vars, opt_g, pl_mean, layer_idx,
                   real, rng):
        ens, hyper = self.ens, self.hyper
        g_gain = float(hyper.g_reg_interval or 1)
        k = _phase_key(rng, layer_idx, 1)
        z = jax.random.normal(jax.random.fold_in(k, 0),
                              (real.shape[0], ens.cfg.z_dim))
        pl_mean_i = pl_mean[layer_idx]

        def gpl_loss(m_params, g_params, z_mb, rng_mb):
            diff = {'mapping': {**m_vars, 'params': m_params},
                    'g': {**g_vars, 'params': g_params}}
            loss, aux = losses.local_gpl_loss(
                diff, ens, rep, z_mb, rng_mb, pl_mean_i,
                hyper.pl_batch_shrink, hyper.pl_decay,
                hyper.pl_weight, hyper.style_mixing_prob,
                layer_idx=layer_idx)
            return loss * g_gain, aux

        (_, aux), grads = _accum_vag(
            gpl_loss, (m_vars['params'], g_vars['params']),
            (z,), jax.random.fold_in(k, 1), hyper.accum_rounds)
        gtree = _nan_to_num({'mapping': grads[0], 'g': grads[1]})
        params = {'mapping': m_vars['params'], 'g': g_vars['params']}
        updates, opt_g = self.trainer.tx_local_g.update(gtree, opt_g, params)
        new = optax.apply_updates(params, updates)
        m_vars = {**m_vars, 'params': new['mapping'],
                  'moving_stats': aux['moving_stats']}
        g_vars = {**g_vars, 'params': new['g']}
        pl_mean = pl_mean.at[layer_idx].set(aux['pl_mean'])
        return m_vars, g_vars, opt_g, pl_mean, aux['stats']

    def _dmain_body(self, rep, m_vars, d_vars, opt_d, g_vars, sign_sum,
                    sign_count, layer_idx, real, rng, aug_p):
        """Uses the just-updated G, like the reference's sequential phase
        list; updates mapping's moving_stats (w_avg) through run_G."""
        ens, hyper = self.ens, self.hyper
        k = _phase_key(rng, layer_idx, 2)
        z = jax.random.normal(jax.random.fold_in(k, 0),
                              (real.shape[0], ens.cfg.z_dim))
        aug_p_i = aug_p[layer_idx]

        def dmain_loss(d_params, z_mb, real_mb, rng_mb):
            dv = {**d_vars, 'params': d_params}
            frozen = {'mapping': m_vars, 'g': g_vars}
            return losses.local_dmain_loss(
                dv, ens, rep, frozen, z_mb, real_mb, rng_mb,
                self.trainer._local_aug, aug_p_i,
                hyper.style_mixing_prob, layer_idx=layer_idx)

        (_, aux), grads = _accum_vag(
            dmain_loss, (d_vars['params'],), (z, real),
            jax.random.fold_in(k, 1), hyper.accum_rounds)
        grads = _nan_to_num(grads[0])
        updates, opt_d = self.trainer.tx_local_d.update(
            grads, opt_d, d_vars['params'])
        d_vars = {**d_vars,
                  'params': optax.apply_updates(d_vars['params'], updates)}
        m_vars = {**m_vars, 'moving_stats': aux['moving_stats']}
        sign_sum = sign_sum.at[layer_idx].add(aux['sign_real'])
        sign_count = sign_count.at[layer_idx].add(1.0)
        return m_vars, d_vars, opt_d, sign_sum, sign_count, aux['stats']

    def _dr1_body(self, rep, d_vars, opt_d, sign_sum, sign_count, layer_idx,
                  real, rng, aug_p):
        ens, hyper = self.ens, self.hyper
        d_gain = float(hyper.d_reg_interval or 1)
        k = _phase_key(rng, layer_idx, 3)
        aug_p_i = aug_p[layer_idx]

        def dr1_loss(d_params, real_mb, rng_mb):
            dv = {**d_vars, 'params': d_params}
            loss, aux = losses.local_dr1_loss(
                dv, ens, rep, real_mb, rng_mb,
                self.trainer._local_aug, aug_p_i, hyper.r1_gamma)
            return loss * d_gain, aux

        (_, aux), grads = _accum_vag(
            dr1_loss, (d_vars['params'],), (real,),
            jax.random.fold_in(k, 1), hyper.accum_rounds)
        grads = _nan_to_num(grads[0])
        updates, opt_d = self.trainer.tx_local_d.update(
            grads, opt_d, d_vars['params'])
        d_vars = {**d_vars,
                  'params': optax.apply_updates(d_vars['params'], updates)}
        sign_sum = sign_sum.at[layer_idx].add(aux['sign_real'])
        sign_count = sign_count.at[layer_idx].add(1.0)
        return d_vars, opt_d, sign_sum, sign_count, aux['stats']

    # ------------------------------------------------------------------
    # Split per-phase jitted programs (cached per geometry representative)
    # ------------------------------------------------------------------

    def _gmain_fn(self, rep: int):
        key = ('gmain', rep)
        if key not in self._fns:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def fn(m_vars, g_vars, opt_g, d_vars, layer_idx, real, rng,
                   aug_p):
                return self._gmain_body(rep, m_vars, g_vars, opt_g, d_vars,
                                        layer_idx, real, rng, aug_p)
            self._fns[key] = fn
        return self._fns[key]

    def _greg_fn(self, rep: int):
        key = ('greg', rep)
        if key not in self._fns:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def fn(m_vars, g_vars, opt_g, pl_mean, layer_idx, real, rng):
                return self._greg_body(rep, m_vars, g_vars, opt_g, pl_mean,
                                       layer_idx, real, rng)
            self._fns[key] = fn
        return self._fns[key]

    def _dmain_fn(self, rep: int):
        key = ('dmain', rep)
        if key not in self._fns:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 4, 5))
            def fn(m_vars, d_vars, opt_d, g_vars, sign_sum, sign_count,
                   layer_idx, real, rng, aug_p):
                return self._dmain_body(rep, m_vars, d_vars, opt_d, g_vars,
                                        sign_sum, sign_count, layer_idx,
                                        real, rng, aug_p)
            self._fns[key] = fn
        return self._fns[key]

    def _dr1_fn(self, rep: int):
        key = ('dr1', rep)
        if key not in self._fns:
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
            def fn(d_vars, opt_d, sign_sum, sign_count, layer_idx, real,
                   rng, aug_p):
                return self._dr1_body(rep, d_vars, opt_d, sign_sum,
                                      sign_count, layer_idx, real, rng,
                                      aug_p)
            self._fns[key] = fn
        return self._fns[key]

    def _run_layer_split(self, rep, do_greg, do_dreg, m_vars, g_vars, opt_g,
                         d_vars, opt_d, pl_mean, sign_sum, sign_count,
                         layer_idx, real, rng, aug_p):
        """Dispatch one layer's local phases as 2-4 per-phase programs, in
        the reference's exact order Gmain → [Greg] → Dmain → [Dreg]
        (custom/training_loop_aio.py:443-519).  Returns the same tuple the
        old fused per-layer program returned; stats merge host-side with
        the identical collision rule."""
        stats: Dict[str, Any] = {}
        m_vars, g_vars, opt_g, st = self._dispatch(
            ('gmain', rep), self._gmain_fn(rep),
            (m_vars, g_vars, opt_g, d_vars, layer_idx, real, rng, aug_p))
        _merge_stats(stats, st)
        if do_greg:
            m_vars, g_vars, opt_g, pl_mean, st = self._dispatch(
                ('greg', rep), self._greg_fn(rep),
                (m_vars, g_vars, opt_g, pl_mean, layer_idx, real, rng))
            _merge_stats(stats, st)
        m_vars, d_vars, opt_d, sign_sum, sign_count, st = self._dispatch(
            ('dmain', rep), self._dmain_fn(rep),
            (m_vars, d_vars, opt_d, g_vars, sign_sum, sign_count,
             layer_idx, real, rng, aug_p))
        _merge_stats(stats, st)
        if do_dreg:
            d_vars, opt_d, sign_sum, sign_count, st = self._dispatch(
                ('dr1', rep), self._dr1_fn(rep),
                (d_vars, opt_d, sign_sum, sign_count, layer_idx, real, rng,
                 aug_p))
            _merge_stats(stats, st)
        return (m_vars, g_vars, opt_g, d_vars, opt_d, pl_mean, sign_sum,
                sign_count, stats)

    # ------------------------------------------------------------------
    # Geometry-bucket programs: k same-geometry layers vmapped over
    # stacked params, one dispatch per phase kind per bucket
    # (SURVEY §7.1; VERDICT r3 top-next).  RNG streams are the per-layer
    # streams exactly (keys fold_in(rng, 4i+1+j) vmapped over the layer
    # index vector), so every z / style-mix / augment draw matches the
    # per-layer mode draw-for-draw; the only numerical deviation is the
    # G-phase mapping staleness documented on __init__.
    # ------------------------------------------------------------------

    @staticmethod
    def _stack_trees(ts):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *ts)

    @staticmethod
    def _unstack_tree(t, k):
        return tuple(jax.tree_util.tree_map(lambda x, j=j: x[j], t)
                     for j in range(k))

    def _seq_moving_stats(self, old_stats, stacked_new, k):
        """Closed-form k-step sequential w_avg EMA from vmapped updates
        (losses.seq_moving_stats — each lane computed its update from the
        SAME old value, which is exactly the sequential-mode information
        since w_avg never feeds the training forward)."""
        return losses.seq_moving_stats(
            float(self.ens.mapping.w_avg_beta or 0.0), old_stats,
            stacked_new, k)

    def _bucket_gmain_fn(self, rep: int, k: int, batch: int):
        key = ('bgmain', rep, k, batch)
        if key in self._fns:
            return self._fns[key]
        ens, hyper = self.ens, self.hyper
        from .train_step import accum_value_and_grad
        rounds = hyper.bucket_accum_rounds

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def fn(m_vars, g_tuple, opt_tuple, d_tuple, li_vec, rng, aug_p):
            gs = self._stack_trees(g_tuple)
            ds = self._stack_trees(d_tuple)
            ops = self._stack_trees(opt_tuple)
            keys = jax.vmap(lambda i: _phase_key(rng, i, 0))(li_vec)
            p_vec = aug_p[li_vec]

            def one(g_vars_i, d_vars_i, li, p_i, key_i):
                z = jax.random.normal(jax.random.fold_in(key_i, 0),
                                      (batch, ens.cfg.z_dim))

                def loss(params_t, data_t, rng_mb):
                    m_params, g_params = params_t
                    (z_mb,) = data_t
                    diff = {'mapping': {**m_vars, 'params': m_params},
                            'g': {**g_vars_i, 'params': g_params}}
                    return losses.local_gmain_loss(
                        diff, ens, rep, d_vars_i, z_mb, rng_mb,
                        self.trainer._local_aug, p_i,
                        hyper.style_mixing_prob, layer_idx=li)

                (_, aux), grads = accum_value_and_grad(
                    loss, (m_vars['params'], g_vars_i['params']), (z,),
                    jax.random.fold_in(key_i, 1), rounds)
                return grads[0], grads[1], aux

            mg, gg, aux = jax.vmap(one)(gs, ds, li_vec, p_vec, keys)

            # per-layer Adam applied in layer order (each layer's own
            # moments cover {mapping, g} exactly as in per-layer mode)
            def body(m_params, xs):
                mg_i, gg_i, g_params_i, opt_i = xs
                gtree = _nan_to_num({'mapping': mg_i, 'g': gg_i})
                params = {'mapping': m_params, 'g': g_params_i}
                updates, opt_i = self.trainer.tx_local_g.update(
                    gtree, opt_i, params)
                new = optax.apply_updates(params, updates)
                return new['mapping'], (new['g'], opt_i)

            m_new, (gp_new, opt_new) = jax.lax.scan(
                body, m_vars['params'], (mg, gg, gs['params'], ops))
            new_ms = self._seq_moving_stats(m_vars['moving_stats'],
                                            aux['moving_stats'], k)
            m_out = {**m_vars, 'params': m_new, 'moving_stats': new_ms}
            g_out = tuple(
                {**{c: jax.tree_util.tree_map(lambda x, j=j: x[j], gs[c])
                    for c in gs if c != 'params'},
                 'params': jax.tree_util.tree_map(lambda x, j=j: x[j],
                                                  gp_new)}
                for j in range(k))
            return m_out, g_out, self._unstack_tree(opt_new, k), aux['stats']

        self._fns[key] = fn
        return fn

    def _bucket_greg_fn(self, rep: int, k: int, batch: int):
        key = ('bgreg', rep, k, batch)
        if key in self._fns:
            return self._fns[key]
        ens, hyper = self.ens, self.hyper
        from .train_step import accum_value_and_grad
        rounds = hyper.bucket_accum_rounds
        g_gain = float(hyper.g_reg_interval or 1)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def fn(m_vars, g_tuple, opt_tuple, pl_mean, li_vec, rng):
            gs = self._stack_trees(g_tuple)
            ops = self._stack_trees(opt_tuple)
            keys = jax.vmap(lambda i: _phase_key(rng, i, 1))(li_vec)
            pl_vec = pl_mean[li_vec]

            def one(g_vars_i, li, pl_i, key_i):
                z = jax.random.normal(jax.random.fold_in(key_i, 0),
                                      (batch, ens.cfg.z_dim))

                def loss(params_t, data_t, rng_mb):
                    m_params, g_params = params_t
                    (z_mb,) = data_t
                    diff = {'mapping': {**m_vars, 'params': m_params},
                            'g': {**g_vars_i, 'params': g_params}}
                    l, aux = losses.local_gpl_loss(
                        diff, ens, rep, z_mb, rng_mb, pl_i,
                        hyper.pl_batch_shrink, hyper.pl_decay,
                        hyper.pl_weight, hyper.style_mixing_prob,
                        layer_idx=li)
                    return l * g_gain, aux

                (_, aux), grads = accum_value_and_grad(
                    loss, (m_vars['params'], g_vars_i['params']), (z,),
                    jax.random.fold_in(key_i, 1), rounds)
                return grads[0], grads[1], aux

            mg, gg, aux = jax.vmap(one)(gs, li_vec, pl_vec, keys)

            def body(m_params, xs):
                mg_i, gg_i, g_params_i, opt_i = xs
                gtree = _nan_to_num({'mapping': mg_i, 'g': gg_i})
                params = {'mapping': m_params, 'g': g_params_i}
                updates, opt_i = self.trainer.tx_local_g.update(
                    gtree, opt_i, params)
                new = optax.apply_updates(params, updates)
                return new['mapping'], (new['g'], opt_i)

            m_new, (gp_new, opt_new) = jax.lax.scan(
                body, m_vars['params'], (mg, gg, gs['params'], ops))
            new_ms = self._seq_moving_stats(m_vars['moving_stats'],
                                            aux['moving_stats'], k)
            m_out = {**m_vars, 'params': m_new, 'moving_stats': new_ms}
            g_out = tuple(
                {**{c: jax.tree_util.tree_map(lambda x, j=j: x[j], gs[c])
                    for c in gs if c != 'params'},
                 'params': jax.tree_util.tree_map(lambda x, j=j: x[j],
                                                  gp_new)}
                for j in range(k))
            pl_out = pl_mean.at[li_vec].set(aux['pl_mean'])
            return (m_out, g_out, self._unstack_tree(opt_new, k), pl_out,
                    aux['stats'])

        self._fns[key] = fn
        return fn

    def _bucket_dmain_fn(self, rep: int, k: int, batch: int):
        key = ('bdmain', rep, k, batch)
        if key in self._fns:
            return self._fns[key]
        ens, hyper = self.ens, self.hyper
        from .train_step import accum_value_and_grad
        rounds = hyper.bucket_accum_rounds

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 4, 5))
        def fn(m_vars, d_tuple, opt_tuple, g_tuple, sign_sum, sign_count,
               li_vec, reals_tuple, rng, aug_p):
            gs = self._stack_trees(g_tuple)
            ds = self._stack_trees(d_tuple)
            ods = self._stack_trees(opt_tuple)
            reals = jnp.stack(reals_tuple)
            keys = jax.vmap(lambda i: _phase_key(rng, i, 2))(li_vec)
            p_vec = aug_p[li_vec]

            def one(g_vars_i, d_vars_i, opt_i, li, p_i, key_i, real_i):
                z = jax.random.normal(jax.random.fold_in(key_i, 0),
                                      (batch, ens.cfg.z_dim))

                def loss(params_t, data_t, rng_mb):
                    (d_params,) = params_t
                    z_mb, real_mb = data_t
                    dv = {**d_vars_i, 'params': d_params}
                    frozen = {'mapping': m_vars, 'g': g_vars_i}
                    return losses.local_dmain_loss(
                        dv, ens, rep, frozen, z_mb, real_mb, rng_mb,
                        self.trainer._local_aug, p_i,
                        hyper.style_mixing_prob, layer_idx=li)

                (_, aux), grads = accum_value_and_grad(
                    loss, (d_vars_i['params'],), (z, real_i),
                    jax.random.fold_in(key_i, 1), rounds)
                gd = _nan_to_num(grads[0])
                updates, opt_i = self.trainer.tx_local_d.update(
                    gd, opt_i, d_vars_i['params'])
                d_new = optax.apply_updates(d_vars_i['params'], updates)
                return d_new, opt_i, aux

            dp_new, opt_new, aux = jax.vmap(one)(gs, ds, ods, li_vec, p_vec,
                                                 keys, reals)
            new_ms = self._seq_moving_stats(m_vars['moving_stats'],
                                            aux['moving_stats'], k)
            m_out = {**m_vars, 'moving_stats': new_ms}
            d_out = tuple(
                {**{c: jax.tree_util.tree_map(lambda x, j=j: x[j], ds[c])
                    for c in ds if c != 'params'},
                 'params': jax.tree_util.tree_map(lambda x, j=j: x[j],
                                                  dp_new)}
                for j in range(k))
            sign_sum = sign_sum.at[li_vec].add(aux['sign_real'])
            sign_count = sign_count.at[li_vec].add(1.0)
            return (m_out, d_out, self._unstack_tree(opt_new, k), sign_sum,
                    sign_count, aux['stats'])

        self._fns[key] = fn
        return fn

    def _bucket_dr1_fn(self, rep: int, k: int, batch: int):
        key = ('bdr1', rep, k, batch)
        if key in self._fns:
            return self._fns[key]
        ens, hyper = self.ens, self.hyper
        from .train_step import accum_value_and_grad
        rounds = hyper.bucket_accum_rounds
        d_gain = float(hyper.d_reg_interval or 1)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def fn(d_tuple, opt_tuple, sign_sum, sign_count, li_vec,
               reals_tuple, rng, aug_p):
            ds = self._stack_trees(d_tuple)
            ods = self._stack_trees(opt_tuple)
            reals = jnp.stack(reals_tuple)
            keys = jax.vmap(lambda i: _phase_key(rng, i, 3))(li_vec)
            p_vec = aug_p[li_vec]

            def one(d_vars_i, opt_i, p_i, key_i, real_i):
                def loss(params_t, data_t, rng_mb):
                    (d_params,) = params_t
                    (real_mb,) = data_t
                    dv = {**d_vars_i, 'params': d_params}
                    l, aux = losses.local_dr1_loss(
                        dv, ens, rep, real_mb, rng_mb,
                        self.trainer._local_aug, p_i, hyper.r1_gamma)
                    return l * d_gain, aux

                (_, aux), grads = accum_value_and_grad(
                    loss, (d_vars_i['params'],), (real_i,),
                    jax.random.fold_in(key_i, 1), rounds)
                gd = _nan_to_num(grads[0])
                updates, opt_i = self.trainer.tx_local_d.update(
                    gd, opt_i, d_vars_i['params'])
                d_new = optax.apply_updates(d_vars_i['params'], updates)
                return d_new, opt_i, aux

            dp_new, opt_new, aux = jax.vmap(one)(ds, ods, p_vec, keys, reals)
            d_out = tuple(
                {**{c: jax.tree_util.tree_map(lambda x, j=j: x[j], ds[c])
                    for c in ds if c != 'params'},
                 'params': jax.tree_util.tree_map(lambda x, j=j: x[j],
                                                  dp_new)}
                for j in range(k))
            sign_sum = sign_sum.at[li_vec].add(aux['sign_real'])
            sign_count = sign_count.at[li_vec].add(1.0)
            return (d_out, self._unstack_tree(opt_new, k), sign_sum,
                    sign_count, aux['stats'])

        self._fns[key] = fn
        return fn

    def _run_bucket(self, rep, idxs, do_greg, do_dreg, mapping, local_g,
                    opt_g, local_d, opt_d, pl_mean, sign_sum, sign_count,
                    crops, rng, aug_p):
        """Dispatch one geometry bucket's local phases as 2-4 vmapped
        programs (kind-major within the bucket: all Gmain, [all Greg], all
        Dmain, [all Dreg]).  Mutates the local_g/opt lists in place at the
        bucket's indices; returns stacked per-layer stats (leaves [k])."""
        k = len(idxs)
        li_vec = jnp.asarray(idxs, jnp.int32)
        batch = crops[idxs[0]].shape[0]
        g_t = tuple(local_g[i] for i in idxs)
        og_t = tuple(opt_g[i] for i in idxs)
        d_t = tuple(local_d[i] for i in idxs)
        od_t = tuple(opt_d[i] for i in idxs)
        reals_t = tuple(crops[i] for i in idxs)
        stats: Dict[str, Any] = {}

        mapping, g_t, og_t, st = self._dispatch(
            ('bgmain', rep, k, batch), self._bucket_gmain_fn(rep, k, batch),
            (mapping, g_t, og_t, d_t, li_vec, rng, aug_p))
        _merge_stats(stats, st)
        if do_greg:
            mapping, g_t, og_t, pl_mean, st = self._dispatch(
                ('bgreg', rep, k, batch),
                self._bucket_greg_fn(rep, k, batch),
                (mapping, g_t, og_t, pl_mean, li_vec, rng))
            _merge_stats(stats, st)
        mapping, d_t, od_t, sign_sum, sign_count, st = self._dispatch(
            ('bdmain', rep, k, batch),
            self._bucket_dmain_fn(rep, k, batch),
            (mapping, d_t, od_t, g_t, sign_sum, sign_count, li_vec,
             reals_t, rng, aug_p))
        _merge_stats(stats, st)
        if do_dreg:
            d_t, od_t, sign_sum, sign_count, st = self._dispatch(
                ('bdr1', rep, k, batch), self._bucket_dr1_fn(rep, k, batch),
                (d_t, od_t, sign_sum, sign_count, li_vec, reals_t, rng,
                 aug_p))
            _merge_stats(stats, st)
        for j, i in enumerate(idxs):
            local_g[i], opt_g[i] = g_t[j], og_t[j]
            local_d[i], opt_d[i] = d_t[j], od_t[j]
        return mapping, pl_mean, sign_sum, sign_count, stats

    # ------------------------------------------------------------------
    # Merged per-layer / all-layers programs (legacy fused variants; the
    # 'all' mode and the probing tools use these)
    # ------------------------------------------------------------------

    def _layer_phases(self, rep: int, do_greg: bool, do_dreg: bool,
                      m_vars, g_vars, opt_g, d_vars, opt_d, pl_mean,
                      sign_sum, sign_count, layer_idx, real, rng, aug_p):
        """Traced body of one layer's local phases fused in one program
        (composition of the per-phase bodies — same math, same RNG
        streams)."""
        stats: Dict[str, Any] = {}
        m_vars, g_vars, opt_g, st = self._gmain_body(
            rep, m_vars, g_vars, opt_g, d_vars, layer_idx, real, rng, aug_p)
        _merge_stats(stats, st)
        if do_greg:
            m_vars, g_vars, opt_g, pl_mean, st = self._greg_body(
                rep, m_vars, g_vars, opt_g, pl_mean, layer_idx, real, rng)
            _merge_stats(stats, st)
        m_vars, d_vars, opt_d, sign_sum, sign_count, st = self._dmain_body(
            rep, m_vars, d_vars, opt_d, g_vars, sign_sum, sign_count,
            layer_idx, real, rng, aug_p)
        _merge_stats(stats, st)
        if do_dreg:
            d_vars, opt_d, sign_sum, sign_count, st = self._dr1_body(
                rep, d_vars, opt_d, sign_sum, sign_count, layer_idx, real,
                rng, aug_p)
            _merge_stats(stats, st)
        return (m_vars, g_vars, opt_g, d_vars, opt_d, pl_mean,
                sign_sum, sign_count, stats)

    def _layer_fn(self, rep: int, do_greg: bool, do_dreg: bool):
        """One layer's local phases as ONE fused jitted program (cached per
        geometry representative and reg combo) — kept for probing tools
        and A/B comparisons against the split per-phase programs."""
        key = ('layer', rep, do_greg, do_dreg)
        if key in self._fns:
            return self._fns[key]

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
        def fn(m_vars, g_vars, opt_g, d_vars, opt_d, pl_mean, sign_sum,
               sign_count, layer_idx, real, rng, aug_p):
            return self._layer_phases(rep, do_greg, do_dreg, m_vars, g_vars,
                                      opt_g, d_vars, opt_d, pl_mean,
                                      sign_sum, sign_count, layer_idx, real,
                                      rng, aug_p)

        self._fns[key] = fn
        return fn

    def _locals_fn(self, do_greg: bool, do_dreg: bool):
        """ALL layers' local phases as ONE jitted program (single dispatch;
        XLA plans the sequential per-layer memory exactly, so the peak is
        one phase's working set — not a sum).  Cached per reg combo."""
        key = ('locals', do_greg, do_dreg)
        if key in self._fns:
            return self._fns[key]
        num_layers = self.ens.cfg.num_layers
        layer_names = self.ens.cfg.layer_names

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
        def fn(m_vars, g_list, opt_g_list, d_list, opt_d_list, pl_mean,
               sign_sum, sign_count, crops, rng, aug_p):
            g_list = list(g_list)
            opt_g_list = list(opt_g_list)
            d_list = list(d_list)
            opt_d_list = list(opt_d_list)
            stats: Dict[str, Any] = {}
            for i in range(num_layers):
                rep = self._geom_of_layer[i]
                (m_vars, g_list[i], opt_g_list[i], d_list[i], opt_d_list[i],
                 pl_mean, sign_sum, sign_count, st) = self._layer_phases(
                    rep, do_greg, do_dreg, m_vars, g_list[i], opt_g_list[i],
                    d_list[i], opt_d_list[i], pl_mean, sign_sum, sign_count,
                    jnp.asarray(i, jnp.int32), crops[i], rng, aug_p)
                stats.update({f'{layer_names[i]}/{k2}': v
                              for k2, v in st.items()})
            return (m_vars, tuple(g_list), tuple(opt_g_list), tuple(d_list),
                    tuple(opt_d_list), pl_mean, sign_sum, sign_count, stats)

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
        def fn(state, stack, crops, rng, salt, do_dreg=False,
               do_global_g=False, do_global_d=False, do_global_dmain=None,
               do_renderer=False, do_ema_ada=False):
            # fold the phase salt in-program: one fewer host dispatch per
            # tail phase on remote device transports
            rng = jax.random.fold_in(rng, salt)
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
    # Tail argument slimming (VERDICT r4 #4)
    # ------------------------------------------------------------------
    #
    # Host enqueue cost of a dispatch scales with the argument pytree size
    # (buffer handles marshalled over the tunneled transport — docs/PERF.md
    # "Dispatch-overhead model": full-state tail programs 50–300+ ms, small
    # programs 10–20 ms).  Each tail program's static gates mean whole
    # state subtrees are never traced, so the dispatch passes a PRUNED
    # state — untouched subtrees replaced by empty tuples — and the
    # executor merges the returned subtrees back host-side.  Numerically
    # identical programs; ~2–6× fewer marshalled buffers per dispatch
    # (the Renderer program drops from ~2.6k to ~450 leaves).

    def _tail_keep(self, gates):
        """(variable keys, opt-state keys, need_ema) the gated tail program
        actually reads or writes (see trainer.partial_step's gate
        structure)."""
        var_keys = set()
        opt_keys = set()
        need_ema = False
        if gates.get('do_renderer'):
            var_keys |= {'mapping', 'local_g', 'stn', 'renderer'}
            opt_keys.add('renderer')
        if gates.get('do_global_g'):
            var_keys |= {'mapping', 'local_g', 'stn', 'global_d', 'renderer'}
            opt_keys.add('global_g')
        if gates.get('do_global_d'):
            opt_keys.add('global_d')
            var_keys |= {'global_d', 'renderer'}
            if gates.get('do_global_dmain') is not False:
                # Dmain runs fakes through the full generator ensemble;
                # a pure-Dreg program (do_global_dmain=False) needs only
                # D + renderer + the real stack
                var_keys |= {'mapping', 'local_g', 'stn'}
        if gates.get('do_ema_ada'):
            var_keys |= {'mapping', 'local_g', 'stn'}
            need_ema = True
        # components the config never constructed (e.g. no renderer) are
        # simply absent from the state dicts; pruning/merging key-matches
        return var_keys, opt_keys, need_ema

    def _prune_state(self, state, gates):
        var_keys, opt_keys, need_ema = self._tail_keep(gates)
        variables = {k: (v if k in var_keys else ())
                     for k, v in dict(state.variables).items()}
        opt_states = {k: v for k, v in dict(state.opt_states).items()
                      if k in opt_keys}
        ema = state.ema if need_ema else ()
        return state.replace(variables=variables, ema=ema,
                             opt_states=opt_states)

    def _merge_state(self, full, out, gates):
        var_keys, opt_keys, need_ema = self._tail_keep(gates)
        variables = dict(full.variables)
        for k in var_keys:
            if k in out.variables:
                variables[k] = out.variables[k]
        opt_states = dict(full.opt_states)
        for k in opt_keys:
            if k in out.opt_states:
                opt_states[k] = out.opt_states[k]
        return full.replace(
            variables=variables, opt_states=opt_states,
            ema=out.ema if need_ema else full.ema,
            pl_mean=out.pl_mean, aug_p=out.aug_p,
            ada_sign_sum=out.ada_sign_sum,
            ada_sign_count=out.ada_sign_count, step=out.step)

    # ------------------------------------------------------------------
    # Parallel ahead-of-time compilation (cold-start, VERDICT r3 #4)
    # ------------------------------------------------------------------

    @staticmethod
    def _statics_key(statics):
        return tuple(sorted(statics.items()))

    def _dispatch(self, key, jitfn, args, statics=None):
        """Run a phase program, preferring the AOT executable from
        ``precompile`` when one exists for these statics (jit's dispatch
        cache does not reuse AOT artifacts — going through the jit path
        would compile/load the program a second time).  An argument-spec
        mismatch (e.g. a caller with different batch shapes than the
        precompiled ones) falls back to the jit path — LOUDLY (warn once
        per program key): a silent fallback would quietly forfeit the
        entire AOT cold-start win (the first step regresses to the ~324 s
        serial path with no signal).  ``aot_hits``/``aot_misses`` count
        dispatches for the precompile-coverage test."""
        statics = statics or {}
        akey = (key, self._statics_key(statics))
        comp = self._aot.get(akey)
        if comp is not None:
            try:
                out = comp(*args)
                self.aot_hits[akey] = self.aot_hits.get(akey, 0) + 1
                return out
            except (TypeError, ValueError) as e:
                if akey not in self._aot_fallback_warned:
                    self._aot_fallback_warned.add(akey)
                    import warnings
                    warnings.warn(
                        f'PhaseExecutor: AOT executable for {akey!r} exists '
                        f'but the dispatch arguments do not match its '
                        f'compiled spec ({type(e).__name__}: {str(e)[:200]}) '
                        f'— falling back to the jit path (recompiles; the '
                        f'precompile win is lost for this program)')
        elif self._aot:
            # precompile ran but never produced this program — same hazard
            self.aot_misses[akey] = self.aot_misses.get(akey, 0) + 1
        return jitfn(*args, **statics)

    def _tail_dispatch(self, state, stack, crops, rng, salt, **gates):
        # slim the argument tree to the subtrees this gated program touches
        # (VERDICT r4 #4) — numerically identical, 2-6× fewer marshalled
        # buffers per dispatch; results merge back by key
        pruned = self._prune_state(state, gates)
        out, t_stats = self._dispatch(
            'tail', self._tail_fn(), (pruned, stack, crops, rng, salt),
            gates)
        return self._merge_state(state, out, gates), t_stats

    def _program_plan(self, state: MontageTrainState, stack, crops, rng):
        """Enumerate every (name, jitted_fn, args, kwargs) the production
        step can dispatch, with the EXACT argument types/shapes ``step``
        passes (so the AOT lowering's HLO — and therefore its persistent-
        cache key — matches the later dispatch byte-for-byte).  Thanks to
        the per-phase-kind program design there is one program per (kind,
        geometry) regardless of the reg combo, plus the tail's static-gate
        variants — the full steady-state set is ~15-20 programs."""
        import numpy as _np
        hyper, ens = self.hyper, self.ens

        def spec(tree):
            # preserve shardings so multi-device AOT programs compile for
            # the exact input layout the real dispatch passes (a sharding
            # mismatch at call time would fall back to the jit path and
            # pay the compile twice)
            def one(x):
                sh = getattr(x, 'sharding', None)
                if sh is not None and hasattr(x, 'shape'):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                sharding=sh)
                return jax.ShapeDtypeStruct(jnp.shape(x),
                                            jnp.result_type(x))
            return jax.tree_util.tree_map(one, tree)

        variables = state.variables
        mapping = spec(variables['mapping'])
        local_g = [spec(v) for v in variables['local_g']]
        local_d = [spec(v) for v in variables['local_d']]
        opt_g = [spec(o) for o in state.opt_states.get('local_g', ())]
        opt_d = [spec(o) for o in state.opt_states.get('local_d', ())]
        pl_mean = spec(state.pl_mean)
        sign_sum = spec(state.ada_sign_sum)
        sign_count = spec(state.ada_sign_count)
        aug_p = spec(state.aug_p)
        crops_s = [spec(c) for c in crops]
        plan = []

        if hyper.train_local and opt_g and self.merge_locals == 'all':
            # the fused locals program IS the big compile in 'all' mode —
            # without it in the plan precompile covers only the 5 tail
            # programs and buys almost nothing.  One variant per reg combo
            # the interval schedule can actually produce.
            gi = hyper.g_reg_interval
            di = hyper.d_reg_interval
            combos = set()
            import math
            period = ((gi or 1) * (di or 1)) // math.gcd(gi or 1, di or 1)
            for i in range(period):
                combos.add((gi is not None and hyper.pl_weight != 0
                            and i % gi == 0,
                            di is not None and hyper.r1_gamma != 0
                            and i % di == 0))
            l_args = (mapping, tuple(local_g), tuple(opt_g),
                      tuple(local_d), tuple(opt_d), pl_mean, sign_sum,
                      sign_count, tuple(crops_s), rng, aug_p)
            for do_greg, do_dreg in sorted(combos):
                plan.append((f'locals[greg={do_greg},dreg={do_dreg}]',
                             ('locals', do_greg, do_dreg),
                             self._locals_fn(do_greg, do_dreg),
                             l_args, {}))

        if hyper.train_local and opt_g and self.merge_locals != 'all':
            use_bucket = self.merge_locals == 'bucket'
            for rep, idxs in self._buckets:
                if not use_bucket or len(idxs) == 1:
                    # per-layer programs are shared per geometry rep: one
                    # lowering covers every layer in the bucket
                    i = idxs[0]
                    li = jnp.asarray(i, jnp.int32)
                    real = crops_s[i]
                    name = f'{ens.cfg.layer_names[i]}'
                    plan += [
                        (f'gmain[{name}]', ('gmain', rep),
                         self._gmain_fn(rep),
                         (mapping, local_g[i], opt_g[i], local_d[i], li,
                          real, rng, aug_p), {}),
                        (f'greg[{name}]', ('greg', rep),
                         self._greg_fn(rep),
                         (mapping, local_g[i], opt_g[i], pl_mean, li, real,
                          rng), {}),
                        (f'dmain[{name}]', ('dmain', rep),
                         self._dmain_fn(rep),
                         (mapping, local_d[i], opt_d[i], local_g[i],
                          sign_sum, sign_count, li, real, rng, aug_p), {}),
                        (f'dr1[{name}]', ('dr1', rep),
                         self._dr1_fn(rep),
                         (local_d[i], opt_d[i], sign_sum, sign_count, li,
                          real, rng, aug_p), {}),
                    ]
                else:
                    k = len(idxs)
                    li_vec = jnp.asarray(idxs, jnp.int32)
                    batch = crops[idxs[0]].shape[0]
                    g_t = tuple(local_g[i] for i in idxs)
                    og_t = tuple(opt_g[i] for i in idxs)
                    d_t = tuple(local_d[i] for i in idxs)
                    od_t = tuple(opt_d[i] for i in idxs)
                    reals_t = tuple(crops_s[i] for i in idxs)
                    name = '+'.join(ens.cfg.layer_names[i] for i in idxs)
                    plan += [
                        (f'bgmain[{name}]', ('bgmain', rep, k, batch),
                         self._bucket_gmain_fn(rep, k, batch),
                         (mapping, g_t, og_t, d_t, li_vec, rng, aug_p), {}),
                        (f'bgreg[{name}]', ('bgreg', rep, k, batch),
                         self._bucket_greg_fn(rep, k, batch),
                         (mapping, g_t, og_t, pl_mean, li_vec, rng), {}),
                        (f'bdmain[{name}]', ('bdmain', rep, k, batch),
                         self._bucket_dmain_fn(rep, k, batch),
                         (mapping, d_t, od_t, g_t, sign_sum, sign_count,
                          li_vec, reals_t, rng, aug_p), {}),
                        (f'bdr1[{name}]', ('bdr1', rep, k, batch),
                         self._bucket_dr1_fn(rep, k, batch),
                         (d_t, od_t, sign_sum, sign_count, li_vec, reals_t,
                          rng, aug_p), {}),
                    ]

        # tail programs: every static-gate variant the step can dispatch
        tail = self._tail_fn()
        st_spec = spec(state)
        stack_s = spec(stack)

        def t_args(gates):
            # the real dispatch slims the state to this gate combo's
            # subtrees (_tail_dispatch) — the AOT lowering must match
            return (self._prune_state(st_spec, gates), stack_s,
                    tuple(crops_s), rng, _np.int32(0))

        do_global = hyper.train_global and ens.stn is not None
        do_gdreg = do_global and hyper.d_reg_interval is not None \
            and hyper.global_r1_gamma != 0
        if hyper.train_renderer and self.trainer._use_renderer:
            gates = dict(do_renderer=True)
            plan.append(('Renderer', 'tail', tail, t_args(gates), gates))
        if do_global:
            gates = dict(do_global_g=True)
            plan.append(('global_Gmain', 'tail', tail, t_args(gates), gates))
            gates = dict(do_global_d=True, do_dreg=False, do_ema_ada=True)
            plan.append(('global_Dmain+ema_ada', 'tail', tail, t_args(gates),
                         gates))
        if do_gdreg:
            gates = dict(do_global_d=True, do_dreg=False)
            plan.append(('global_Dmain', 'tail', tail, t_args(gates), gates))
            gates = dict(do_global_d=True, do_global_dmain=False,
                         do_dreg=True, do_ema_ada=True)
            plan.append(('global_Dreg+ema_ada', 'tail', tail, t_args(gates),
                         gates))
        if not do_global or hyper.global_optimize_interval > 1:
            # steps off the global interval end with a standalone ema_ada
            gates = dict(do_ema_ada=True)
            plan.append(('ema_ada', 'tail', tail, t_args(gates), gates))
        return plan

    def precompile(self, state: MontageTrainState, stack, crops,
                   max_workers: int = 6, log=None) -> int:
        """Compile every production program ahead of the first step, with
        the (slow, remote on tunneled-device setups) backend compilations
        running CONCURRENTLY.

        The first training step otherwise walks ~15-20 programs and
        compiles each serially on first dispatch — minutes per program over
        a remote-compile relay (measured cold first step: tens of minutes;
        even warm-cache deserialization is serial).  Tracing/lowering is
        Python-bound and runs serially here; ``lowered.compile()`` releases
        the GIL inside the backend RPC, so a thread pool overlaps the
        expensive part.  Compiled artifacts land in the persistent compile
        cache (when enabled), which the subsequent real dispatches hit
        instead of recompiling.

        Args mirror ``step`` (state may be a concrete device state — only
        its shapes/dtypes are read).  Returns the number of programs
        compiled.  Safe to skip: any failure degrades to compile-on-first-
        dispatch.  Reference anchor: the reference's startup compiles
        nothing ahead (training_loop.py:174-179); this is the TPU-native
        answer to its "first tick is slow" note.
        """
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        rng = jax.random.PRNGKey(0)
        plan = self._program_plan(state, stack, crops, rng)
        lowered = []
        t0 = _time.time()
        for name, key, fn, args, statics in plan:
            try:
                lowered.append((name, (key, self._statics_key(statics)),
                                fn.lower(*args, **statics)))
            except Exception as e:  # pragma: no cover - defensive
                if log:
                    log(f"precompile: lower({name}) failed (non-fatal): "
                        f"{str(e)[:120]}")
        if log:
            log(f"precompile: traced+lowered {len(lowered)} programs in "
                f"{_time.time() - t0:.1f}s; compiling with "
                f"{max_workers} workers...")

        def compile_one(item):
            name, akey, low = item
            t1 = _time.time()
            try:
                comp = low.compile()
            except Exception as e:  # one bad program must not kill the rest
                return name, akey, None, _time.time() - t1, e
            return name, akey, comp, _time.time() - t1, None

        done = 0
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            for name, akey, comp, dt, err in pool.map(compile_one, lowered):
                if err is not None:
                    if log:
                        log(f"precompile: {name} FAILED after {dt:.1f}s "
                            f"(non-fatal, will compile on first dispatch): "
                            f"{type(err).__name__}: {str(err)[:160]}")
                    continue
                self._aot[akey] = comp
                done += 1
                if log:
                    log(f"precompile: {name} ready in {dt:.1f}s "
                        f"({done}/{len(lowered)})")
        return done

    # ------------------------------------------------------------------
    # The step
    # ------------------------------------------------------------------

    def step(self, state: MontageTrainState, stack, crops, rng,
             time_phases: bool = False, step_idx: Optional[int] = None,
             on_phase=None):
        """One full training iteration; the step index drives the intervals
        host-side.  Returns (new_state, stats).

        ``step_idx``: host-known step counter.  Pass it to avoid a device
        sync on ``state.step`` — the sync stalls the dispatch pipeline every
        step (expensive over a remote device transport).

        ``time_phases=True`` synchronizes after every phase group and
        reports ``Timing/<phase>`` wall-times (the reference's per-phase
        CUDA-event timing, custom/training_loop_aio.py:511-516,860-865);
        the local granularity is per *layer* (a layer's 2-4 per-phase
        programs time as one group, keeping key names stable); costs
        pipeline overlap, so enable only on tick boundaries.

        ``on_phase(name, seconds)``: optional progress callback, fired after
        every phase group completes (implies a per-group sync like
        ``time_phases``) — lets a caller log compile/load progress live, so
        a stalled first step is diagnosable per phase instead of opaque."""
        import time as _time
        ens, hyper = self.ens, self.hyper
        if step_idx is None:
            step_idx = int(state.step)
        stats: Dict[str, Any] = {}

        def timed(phase_name, fn, *args, **kwargs):
            # named region for profiler traces (the reference's
            # record_function annotation, custom/loss_aio.py:105 etc.)
            with jax.profiler.TraceAnnotation(phase_name):
                if not time_phases and on_phase is None:
                    return fn(*args, **kwargs)
                t0 = _time.time()
                out = fn(*args, **kwargs)
                # sync via a scalar READBACK, not block_until_ready — the
                # tunneled PJRT transport's block can return before the
                # computation finishes, which silently turns these numbers
                # into dispatch times
                leaves = jax.tree_util.tree_leaves(out)
                scalar = next((l for l in leaves
                               if getattr(l, 'size', 0) == 1), leaves[0])
                jax.device_get(scalar)
                dt = _time.time() - t0
                if time_phases:
                    stats[f'Timing/{phase_name}'] = dt
                if on_phase is not None:
                    on_phase(phase_name, dt)
                return out

        goi = hyper.global_optimize_interval
        do_global = (hyper.train_global and ens.stn is not None
                     and step_idx % goi == 0)
        do_gdreg = (do_global and hyper.d_reg_interval is not None
                    and hyper.global_r1_gamma != 0
                    and step_idx % (hyper.d_reg_interval * goi) == 0)
        do_renderer = hyper.train_renderer and self.trainer._use_renderer
        tail = self._tail_dispatch
        import numpy as _np

        # Renderer phase FIRST — the reference's phase list leads with it
        # (custom/training_loop_aio.py:445-446), so its self-supervision
        # target uses the PREVIOUS step's generators, not this step's
        # locals-updated ones (matches the monolithic step's order).
        if do_renderer:
            state, t_stats = timed('Renderer', tail, state, stack, crops,
                                   rng, _np.int32(9996), do_renderer=True)
            stats.update(t_stats)

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

        if hyper.train_local:
            do_greg = (hyper.g_reg_interval is not None
                       and hyper.pl_weight != 0
                       and step_idx % hyper.g_reg_interval == 0)
            do_dreg = (hyper.d_reg_interval is not None
                       and hyper.r1_gamma != 0
                       and step_idx % hyper.d_reg_interval == 0)
            if self.merge_locals == 'all':
                (mapping, g_t, og_t, d_t, od_t, pl_mean, sign_sum,
                 sign_count, st) = timed(
                    'locals', self._dispatch,
                    ('locals', do_greg, do_dreg),
                    self._locals_fn(do_greg, do_dreg),
                    (mapping, tuple(local_g), tuple(opt_g), tuple(local_d),
                     tuple(opt_d), pl_mean, sign_sum, sign_count,
                     tuple(crops), rng, state.aug_p))
                local_g, opt_g = list(g_t), list(og_t)
                local_d, opt_d = list(d_t), list(od_t)
                stats.update(st)
            elif self.merge_locals == 'bucket':
                for rep, idxs in self._buckets:
                    if len(idxs) == 1:
                        # singleton bucket: the split per-layer programs ARE
                        # the exact bucket semantics — reuse them
                        i = idxs[0]
                        name = ens.cfg.layer_names[i]
                        (mapping, local_g[i], opt_g[i], local_d[i],
                         opt_d[i], pl_mean, sign_sum, sign_count,
                         st) = timed(
                            f'local_{name}',
                            self._run_layer_split, rep, do_greg, do_dreg,
                            mapping, local_g[i], opt_g[i], local_d[i],
                            opt_d[i], pl_mean, sign_sum, sign_count,
                            jnp.asarray(i, jnp.int32), crops[i], rng,
                            state.aug_p)
                        stats.update({f'{name}/{s}': v
                                      for s, v in st.items()})
                        continue
                    names = [ens.cfg.layer_names[i] for i in idxs]
                    group = '+'.join(f'local_{n}' for n in names)
                    (mapping, pl_mean, sign_sum, sign_count, st) = timed(
                        group, self._run_bucket, rep, idxs, do_greg,
                        do_dreg, mapping, local_g, opt_g, local_d, opt_d,
                        pl_mean, sign_sum, sign_count, crops, rng,
                        state.aug_p)
                    for j, i in enumerate(idxs):
                        stats.update(
                            {f'{ens.cfg.layer_names[i]}/{s}': v[j]
                             for s, v in st.items()})
            else:
                for i in range(ens.cfg.num_layers):
                    rep = self._geom_of_layer[i]
                    name = ens.cfg.layer_names[i]
                    (mapping, local_g[i], opt_g[i], local_d[i], opt_d[i],
                     pl_mean, sign_sum, sign_count, st) = timed(
                        f'local_{name}',
                        self._run_layer_split, rep, do_greg, do_dreg,
                        mapping, local_g[i], opt_g[i], local_d[i], opt_d[i],
                        pl_mean, sign_sum, sign_count,
                        jnp.asarray(i, jnp.int32), crops[i], rng,
                        state.aug_p)
                    stats.update({f'{name}/{s}': v for s, v in st.items()})

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

        # The EMA/ADA update is fused into the LAST tail program dispatched
        # this step (its math — EMA lerp over mapping/local_g/stn + the ADA
        # controller — is sequential-after anyway, so one program tracing
        # "<phase>; ema_ada" is numerically identical to two programs;
        # pinned by tests/test_phase_exec.py).  A standalone ema_ada
        # dispatch costs a full-state marshal over remote device transports
        # for ~no compute — measured 45–300+ ms (docs/PERF.md "ema_ada").
        st = mid_state
        tail_plan = []
        if do_global:
            tail_plan.append(('global_Gmain', _np.int32(9997),
                              dict(do_global_g=True)))
            tail_plan.append(('global_Dmain', _np.int32(9998),
                              dict(do_global_d=True, do_dreg=False)))
        if do_gdreg:
            tail_plan.append(('global_Dreg', _np.int32(9999),
                              dict(do_global_d=True, do_global_dmain=False,
                                   do_dreg=True)))
        if tail_plan:
            name, salt, gates = tail_plan[-1]
            tail_plan[-1] = (name + '+ema_ada', salt,
                             dict(gates, do_ema_ada=True))
        else:
            tail_plan.append(('ema_ada', _np.int32(10000),
                              dict(do_ema_ada=True)))
        for name, salt, gates in tail_plan:
            st, t_stats = timed(name, tail, st, stack, crops, rng, salt,
                                **gates)
            stats.update(t_stats)
        return st, stats
