"""Loss functions for local and global GAN training.

Functional re-expression of the reference's StyleGAN2Loss / MontageGANLoss
(reference: custom/loss_aio.py:18-372).  Each phase is a pure
``loss(diff_params, …) → (scalar, aux)`` suitable for jax.grad inside one
jitted train step; the reference's "phase" objects with .backward() calls
(custom/training_loop_aio.py:609-638) become explicit grad computations.

Key contract points preserved:
  * non-saturating softplus logistic losses (loss_aio.py:110,147,163);
  * style mixing with random cutoff, prob 0.9, GlobalMappingNetwork-aware
    (loss_aio.py:69-82) — expressed as a mask instead of a dynamic slice;
  * path-length regularization on a shrunk batch with weight gradients
    stopped inside the inner grad (the no_weight_gradients contract,
    loss_aio.py:115-137) and pl_mean as explicit state;
  * R1 on reals differentiated through the augmentation pipe
    (loss_aio.py:151-179);
  * theta-constraint penalty on STN translations outside [-1,1]
    (loss_aio.py:182-188);
  * renderer self-supervision against the (differentiable) composite
    (loss_aio.py:343-372) — the PIL CPU round-trip is eliminated; the target
    is the exact straight-alpha composite with stop_gradient.
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.ensemble import MontageEnsemble
from ..ops.composite import alpha_composite
from ..ops.grid_sample import translate_to_theta
from ..utils.image_utils import (calc_psnr, make_batch_for_pos_estimator,
                                 normalize_minus11, normalize_zero1)
from .augment import AugmentConfig, augment_pipe


def softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# Shared forward helpers
# ---------------------------------------------------------------------------

def run_mapping_with_mixing(ens: MontageEnsemble,
                            mapping_vars: Dict[str, Any],
                            z: jax.Array,
                            rng: jax.Array,
                            style_mixing_prob: float,
                            update_w_avg: bool = True,
                            c: Optional[jax.Array] = None):
    """z → ws with style mixing (reference: custom/loss_aio.py:67-82).

    Returns (ws, new_moving_stats).  The dynamic cutoff slice becomes a mask
    over the num_ws axis (TPU-friendly, no data-dependent shapes).  ``c`` is
    the optional conditioning label, shared by the mixing branch exactly as
    the reference's run_G passes the same c to both mapping calls."""
    out, mut = ens.mapping.apply(mapping_vars, z, c,
                                 update_w_avg=update_w_avg,
                                 mutable=['moving_stats'])
    ws = out
    if style_mixing_prob > 0:
        k1, k2, k3 = jax.random.split(rng, 3)
        num_ws = ws.shape[-2]
        cutoff = jax.random.randint(k1, (), 1, num_ws)
        apply_mix = jax.random.uniform(k2) < style_mixing_prob
        cutoff = jnp.where(apply_mix, cutoff, num_ws)
        z2 = jax.random.normal(k3, z.shape, dtype=z.dtype)
        ws2 = ens.mapping.apply({**mapping_vars,
                                 'moving_stats': mut['moving_stats']},
                                z2, c, update_w_avg=False)
        idx = jnp.arange(num_ws)
        mask = (idx >= cutoff).reshape((1,) * (ws.ndim - 2) + (num_ws, 1))
        ws = jnp.where(mask, ws2, ws)
    return ws, mut['moving_stats']


def run_local_g(ens: MontageEnsemble, rep: int,
                mapping_vars, g_vars, z, rng,
                style_mixing_prob: float, update_w_avg: bool = True,
                layer_idx=None, remat: bool = False,
                c: Optional[jax.Array] = None):
    """run_G for one layer (reference: custom/loss_aio.py:50-87).
    Returns (img, ws_for_layer, new_moving_stats).

    ``rep`` (static) selects the module geometry; ``layer_idx`` (may be
    traced) selects the ws slice — they coincide except in geometry-shared
    compiled phases (training/phase_exec.py)."""
    if layer_idx is None:
        layer_idx = rep
    k_mix, k_noise = jax.random.split(rng)
    ws, new_stats = run_mapping_with_mixing(ens, mapping_vars, z, k_mix,
                                            style_mixing_prob, update_w_avg,
                                            c=c)
    ws_l = ens.ws_for_layer(ws, layer_idx, num_ws=ens.local_gs[rep].num_ws)

    def g_apply(gv, w_in, key):
        return ens.local_gs[rep].apply(gv, w_in, noise_mode='random',
                                       rngs={'noise': key})

    if remat:
        # rematerialize synthesis activations in the backward pass — the
        # global phases backprop through all 9 local Gs at once and would
        # otherwise exceed HBM (jax.checkpoint trades FLOPs for memory)
        g_apply = jax.checkpoint(g_apply)
    img = g_apply(g_vars, ws_l, k_noise)
    return img, ws_l, new_stats


def run_d(ens_d, d_vars, img, aug_cfg: Optional[AugmentConfig],
          aug_p, rng, c: Optional[jax.Array] = None):
    """AugmentPipe → D (reference: custom/loss_aio.py:89-94)."""
    if aug_cfg is not None:
        img = augment_pipe(img, aug_p, rng, aug_cfg)
    return ens_d.apply(d_vars, img, c)


# ---------------------------------------------------------------------------
# Local-GAN phase losses (reference: custom/loss_aio.py:96-179)
# ---------------------------------------------------------------------------

def local_gmain_loss(diff, ens: MontageEnsemble, rep: int,
                     frozen_d_vars, z, rng, aug_cfg, aug_p,
                     style_mixing_prob=0.9, layer_idx=None, c=None):
    """diff = {'mapping': mapping variables, 'g': local G variables}."""
    k_g, k_aug = jax.random.split(rng)
    img, _, new_stats = run_local_g(ens, rep, diff['mapping'], diff['g'],
                                    z, k_g, style_mixing_prob,
                                    layer_idx=layer_idx, c=c)
    logits = run_d(ens.local_ds[rep], frozen_d_vars, img,
                   aug_cfg, aug_p, k_aug, c=c)
    loss = jnp.mean(softplus(-logits))
    aux = {'moving_stats': new_stats,
           'stats': {'Loss/scores/fake': jnp.mean(logits),
                     'Loss/signs/fake': jnp.mean(jnp.sign(logits)),
                     'Loss/G/loss': loss}}
    return loss, aux


def local_gpl_loss(diff, ens: MontageEnsemble, rep: int,
                   z, rng, pl_mean, pl_batch_shrink=2, pl_decay=0.01,
                   pl_weight=2.0, style_mixing_prob=0.9, layer_idx=None,
                   c=None):
    """Path-length regularizer (reference: custom/loss_aio.py:115-137).
    Differentiates G w.r.t. ws with weights stopped (no_weight_gradients),
    then penalizes ‖∇‖ deviation from the running mean."""
    if layer_idx is None:
        layer_idx = rep
    batch = z.shape[0] // pl_batch_shrink
    z = z[:batch]
    if c is not None:
        c = c[:batch]
    k_mix, k_noise, k_pl = jax.random.split(rng, 3)
    ws, new_stats = run_mapping_with_mixing(ens, diff['mapping'], z, k_mix,
                                            style_mixing_prob, c=c)
    ws_l = ens.ws_for_layer(ws, layer_idx, num_ws=ens.local_gs[rep].num_ws)

    th, tw = ens.cfg.layer_targets[rep]
    pl_noise = (jax.random.normal(k_pl, (batch, th, tw, ens.cfg.img_channels))
                / math.sqrt(th * tw))

    # Inner grad w.r.t. ws.  diff['g'] is closed over WITHOUT stop_gradient:
    # the outer grad differentiates pl_penalty through this inner grad, which
    # is how the reference's create_graph=True double-backward reaches the
    # generator weights (the reference's no_weight_gradients only skips the
    # *inner* weight-grad computation as a speed optimization — JAX never
    # computes unused cotangents in the first place).
    def inner(ws_in):
        img = ens.local_gs[rep].apply(diff['g'], ws_in,
                                      noise_mode='random',
                                      rngs={'noise': k_noise})
        return jnp.sum(img * pl_noise)

    pl_grads = jax.grad(inner)(ws_l)
    pl_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
    new_pl_mean = pl_mean + pl_decay * (jnp.mean(pl_lengths) - pl_mean)
    pl_penalty = jnp.square(pl_lengths - jax.lax.stop_gradient(new_pl_mean))
    loss = jnp.mean(pl_penalty) * pl_weight
    aux = {'moving_stats': new_stats,
           'pl_mean': jax.lax.stop_gradient(new_pl_mean),
           'stats': {'Loss/pl_penalty': jnp.mean(pl_penalty),
                     'Loss/G/reg': loss}}
    return loss, aux


def local_dmain_loss(diff_d_vars, ens: MontageEnsemble, rep: int,
                     frozen, z, real_img, rng, aug_cfg, aug_p,
                     style_mixing_prob=0.9, layer_idx=None,
                     gen_c=None, real_c=None):
    """Dgen + Dreal (reference: custom/loss_aio.py:139-164).
    frozen = {'mapping', 'g'} variables (no grads).

    The fake and real batches ride through ONE augment-pipe invocation
    (concat → augment → split): every draw in the pipe is per-sample, so
    per-sample augment law is identical to two invocations (only the key
    stream differs — and JAX key streams never matched torch's anyway),
    while the geometric-warp/filter programs run once at 2B instead of
    twice at B (the warp's serial window scan amortizes over batch).  D
    itself still runs per half: minibatch-std groups are STRIDED over the
    batch axis (models/layers.py MinibatchStd), so a fused D pass would
    mix fake/real statistics — the reference computes them separately
    (custom/loss_aio.py:147,163)."""
    k_g, k_aug1, _ = jax.random.split(rng, 3)
    gen_img, _, new_stats = run_local_g(ens, rep, frozen['mapping'],
                                        frozen['g'], z, k_g,
                                        style_mixing_prob,
                                        layer_idx=layer_idx, c=gen_c)
    gen_img = jax.lax.stop_gradient(gen_img)
    if aug_cfg is not None:
        both = augment_pipe(jnp.concatenate([gen_img, real_img], axis=0),
                            aug_p, k_aug1, aug_cfg)
        gen_in, real_in = jnp.split(both, 2, axis=0)
    else:
        gen_in, real_in = gen_img, real_img
    gen_logits = ens.local_ds[rep].apply(diff_d_vars, gen_in, gen_c)
    real_logits = ens.local_ds[rep].apply(diff_d_vars, real_in, real_c)
    loss_dgen = jnp.mean(softplus(gen_logits))
    loss_dreal = jnp.mean(softplus(-real_logits))
    aux = {'moving_stats': new_stats,
           'stats': {'Loss/scores/fake': jnp.mean(gen_logits),
                     'Loss/signs/fake': jnp.mean(jnp.sign(gen_logits)),
                     'Loss/scores/real': jnp.mean(real_logits),
                     'Loss/signs/real': jnp.mean(jnp.sign(real_logits)),
                     'Loss/D/loss': loss_dgen + loss_dreal},
           'sign_real': jnp.mean(jnp.sign(real_logits))}
    return loss_dgen + loss_dreal, aux


def local_dr1_loss(diff_d_vars, ens: MontageEnsemble, rep: int,
                   real_img, rng, aug_cfg, aug_p, r1_gamma=10.0,
                   real_c=None):
    """R1 penalty (reference: custom/loss_aio.py:151-179).  The gradient is
    taken w.r.t. the real image THROUGH the augmentation pipe; the outer grad
    reaches D's weights through this inner grad (double backward), exactly as
    the reference's create_graph=True does."""

    def d_sum(img):
        logits = run_d(ens.local_ds[rep], diff_d_vars, img,
                       aug_cfg, aug_p, rng, c=real_c)
        return jnp.sum(logits), logits

    r1_grads, real_logits = jax.grad(d_sum, has_aux=True)(real_img)
    r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3))
    loss = jnp.mean(r1_penalty) * (r1_gamma / 2)
    aux = {'stats': {'Loss/r1_penalty': jnp.mean(r1_penalty),
                     'Loss/D/reg': loss},
           'sign_real': jnp.mean(jnp.sign(real_logits))}
    return loss, aux


# ---------------------------------------------------------------------------
# Global phases (reference: custom/loss_aio.py:191-341)
# ---------------------------------------------------------------------------

def theta_constrain_loss(theta: jax.Array) -> jax.Array:
    """L2 norm of theta outside the [-1, 1] translation box
    (reference: custom/loss_aio.py:182-188)."""
    l = theta.shape[-3]
    ones = jnp.ones((l, 2))
    upper = translate_to_theta(ones)
    lower = translate_to_theta(-ones)
    clamped = jnp.maximum(jnp.minimum(theta, upper), lower)
    return jnp.sqrt(jnp.sum(jnp.square(theta - clamped)) + 1e-20)


def _geometry_buckets(ens: MontageEnsemble):
    """[(rep, [layer indices])] grouping same-geometry layers, in
    first-layer order (the vmap axis of the global forward and of the
    PhaseExecutor's bucket mode)."""
    reps: Dict[Any, list] = {}
    buckets = []
    for i in range(ens.cfg.num_layers):
        key = ens.cfg.layer_targets[i]
        if key not in reps:
            reps[key] = []
            buckets.append((i, reps[key]))
        reps[key].append(i)
    return buckets


def seq_moving_stats(beta: float, old_stats, stacked_new, k: int):
    """Closed-form k-step sequential w_avg EMA from per-layer updates that
    were each computed from the SAME old value (w_avg never feeds the
    training forward, so the per-layer batch means are exactly the
    sequential-mode means): ``β^k·old + Σ_j β^(k−1−j)·(new_j − β·old)``
    equals applying the k updates one after another
    (reference: custom/loss_aio.py:238-243 → mapping forward; pinned by
    tests/test_bucket_exec.py and test_global_phase_w_avg_sequential_updates).
    """
    if not jax.tree_util.tree_leaves(old_stats):
        return old_stats
    wts = jnp.asarray([beta ** (k - 1 - j) for j in range(k)], jnp.float32)

    def seq(old, news):
        return (beta ** k) * old + jnp.tensordot(wts, news - beta * old,
                                                 axes=1)

    return jax.tree_util.tree_map(seq, old_stats, stacked_new)


def _global_g_forward(ens: MontageEnsemble, diff, z, rng,
                      style_mixing_prob):
    """run_global_G (reference: custom/loss_aio.py:238-243).
    diff = {'mapping', 'local_g': tuple, 'stn'} variables.

    Same-geometry local Gs run VMAPPED over stacked params (the four 256²
    layers become one batched forward at 4× batch instead of four unrolled
    segments) — EXACT, not an approximation: the mapping parameters are
    constant across the per-layer calls inside this forward, every
    per-layer RNG stream is reproduced (keys fold_in(k_noise, i)), and the
    reference's N sequential w_avg EMA updates are recovered in closed
    form (seq_moving_stats)."""
    k_mix, k_noise, k_stn = jax.random.split(rng, 3)
    mapping_vars = diff['mapping']
    old_stats = mapping_vars.get('moving_stats')
    num_layers = ens.cfg.num_layers
    # Remat of the local-G forwards costs one extra G-chain forward per
    # backward (~+8 TFLOP/step at cfg 'aio', NOT counted by utils/flops.py).
    # Needed on 16G parts at the production global microbatch;
    # ``MGT_REMAT_GLOBAL_G=0`` drops it where HBM allows (semantics-neutral).
    remat_g = os.environ.get('MGT_REMAT_GLOBAL_G', '1') != '0'
    outs = [None] * num_layers
    news = [None] * num_layers
    for rep, idxs in _geometry_buckets(ens):
        if len(idxs) == 1:
            i = idxs[0]
            img, _, ns = run_local_g(ens, i, mapping_vars,
                                     diff['local_g'][i], z,
                                     jax.random.fold_in(k_noise, i),
                                     style_mixing_prob, remat=remat_g)
            outs[i], news[i] = img, ns
            continue
        g_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[diff['local_g'][i] for i in idxs])
        li_vec = jnp.asarray(idxs, jnp.int32)
        keys = jax.vmap(lambda i: jax.random.fold_in(k_noise, i))(li_vec)

        def one(g_vars_i, key_i, li, rep=rep):
            return run_local_g(ens, rep, mapping_vars, g_vars_i, z, key_i,
                               style_mixing_prob, layer_idx=li,
                               remat=remat_g)

        imgs, _, ns = jax.vmap(one)(g_stack, keys, li_vec)
        for j, i in enumerate(idxs):
            outs[i] = imgs[j]
            news[i] = jax.tree_util.tree_map(lambda x, j=j: x[j], ns)
    if old_stats is not None and jax.tree_util.tree_leaves(old_stats):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *news)
        new_stats = seq_moving_stats(float(ens.mapping.w_avg_beta),
                                     old_stats, stacked, num_layers)
    else:
        new_stats = news[-1]
    stack = make_batch_for_pos_estimator(outs, ens.cfg.base_resolution,
                                         pad_value=-1.0)
    placed, theta = ens.stn.apply(diff['stn'], stack)
    return placed, theta, new_stats


def _global_d_forward(ens: MontageEnsemble, d_vars, renderer_vars, stack,
                      aug_cfg, aug_p, rng, use_renderer: bool):
    """run_global_D (reference: custom/loss_aio.py:245-257).  The renderer →
    augment → D chain is rematerialized by default (memory: the global R1
    double backward holds this chain's activations twice otherwise).
    ``MGT_REMAT_GLOBAL_D=0`` disables the remat — semantics-neutral, trades
    HBM for the recompute FLOPs; viable on parts with more headroom than the
    16G v5e at the production batch."""

    def fwd(d_v, r_v, stk, p):
        if ens.renderer is not None and use_renderer:
            blended = ens.renderer.apply(r_v, stk)
        else:
            blended = normalize_minus11(alpha_composite(normalize_zero1(stk)))
        if aug_cfg is not None:
            blended = augment_pipe(blended, p, rng, aug_cfg)
        return ens.global_d.apply(d_v, blended)

    remat = os.environ.get('MGT_REMAT_GLOBAL_D', '1') != '0'
    wrap = jax.checkpoint if remat else (lambda f: f)
    if ens.renderer is not None and use_renderer:
        return wrap(fwd)(d_vars, renderer_vars, stack, aug_p)
    return wrap(
        lambda d_v, stk, p: fwd(d_v, None, stk, p))(d_vars, stack, aug_p)


def _global_d_forward_pair(ens: MontageEnsemble, d_vars, renderer_vars,
                           stack_a, stack_b, aug_cfg, aug_p, rng,
                           use_renderer: bool):
    """Two same-path run_global_D passes fused through ONE renderer +
    augment invocation (concat → split before D).  Valid because the
    renderer and every augment draw are per-sample; D still runs per half
    (strided minibatch-std — see local_dmain_loss).  Halves the global
    warp/filter invocations in global_Dmain vs two `_global_d_forward`
    calls (reference contract: custom/loss_aio.py:300-325)."""

    def fwd(d_v, r_v, sa, sb, p):
        stk = jnp.concatenate([sa, sb], axis=0)
        if ens.renderer is not None and use_renderer:
            blended = ens.renderer.apply(r_v, stk)
        else:
            blended = normalize_minus11(alpha_composite(normalize_zero1(stk)))
        if aug_cfg is not None:
            blended = augment_pipe(blended, p, rng, aug_cfg)
        a, b = jnp.split(blended, 2, axis=0)
        return ens.global_d.apply(d_v, a), ens.global_d.apply(d_v, b)

    remat = os.environ.get('MGT_REMAT_GLOBAL_D', '1') != '0'
    wrap = jax.checkpoint if remat else (lambda f: f)
    if ens.renderer is not None and use_renderer:
        return wrap(fwd)(d_vars, renderer_vars, stack_a, stack_b, aug_p)
    return wrap(lambda d_v, sa, sb, p: fwd(d_v, None, sa, sb, p))(
        d_vars, stack_a, stack_b, aug_p)


def global_gmain_loss(diff, ens: MontageEnsemble, frozen, z, rng,
                      aug_cfg, aug_p, style_mixing_prob=0.9,
                      use_renderer=True):
    """Global Gmain + theta constraint (reference: custom/loss_aio.py:284-298).
    diff = {'mapping','local_g','stn'}; frozen = {'global_d','renderer'}."""
    k_fwd, k_aug = jax.random.split(rng)
    placed, theta, new_stats = _global_g_forward(ens, diff, z, k_fwd,
                                                 style_mixing_prob)
    logits = _global_d_forward(ens, frozen['global_d'],
                               frozen.get('renderer'), placed,
                               aug_cfg, aug_p, k_aug, use_renderer)
    loss_g = jnp.mean(softplus(-logits))
    loss_theta = theta_constrain_loss(theta)
    aux = {'moving_stats': new_stats,
           'stats': {'Loss/scores/fake': jnp.mean(logits),
                     'Loss/signs/fake': jnp.mean(jnp.sign(logits)),
                     'Loss/G/loss': loss_g,
                     'Loss/STN/theta_constrain': loss_theta}}
    return loss_g + loss_theta, aux


def global_dmain_loss(diff_d_vars, ens: MontageEnsemble, frozen,
                      z, real_stack, rng, aug_cfg, aug_p,
                      style_mixing_prob=0.9, use_renderer=True,
                      global_d_real_use_renderer=True):
    """Global Dgen + Dreal (reference: custom/loss_aio.py:300-325).
    real_stack: [B, L, H, W, C] in [-1, 1]."""
    k_fwd, k_aug1, k_aug2 = jax.random.split(rng, 3)
    placed, _, new_stats = _global_g_forward(
        ens, {'mapping': frozen['mapping'], 'local_g': frozen['local_g'],
              'stn': frozen['stn']}, z, k_fwd, style_mixing_prob)
    placed = jax.lax.stop_gradient(placed)
    real_use_r = use_renderer and global_d_real_use_renderer
    if real_use_r == use_renderer and placed.shape == real_stack.shape:
        gen_logits, real_logits = _global_d_forward_pair(
            ens, diff_d_vars, frozen.get('renderer'), placed, real_stack,
            aug_cfg, aug_p, k_aug1, use_renderer)
    else:
        gen_logits = _global_d_forward(ens, diff_d_vars,
                                       frozen.get('renderer'), placed,
                                       aug_cfg, aug_p, k_aug1, use_renderer)
        real_logits = _global_d_forward(ens, diff_d_vars,
                                        frozen.get('renderer'), real_stack,
                                        aug_cfg, aug_p, k_aug2, real_use_r)
    loss = jnp.mean(softplus(gen_logits)) + jnp.mean(softplus(-real_logits))
    aux = {'moving_stats': new_stats,
           'stats': {'Loss/scores/fake': jnp.mean(gen_logits),
                     'Loss/signs/fake': jnp.mean(jnp.sign(gen_logits)),
                     'Loss/scores/real': jnp.mean(real_logits),
                     'Loss/signs/real': jnp.mean(jnp.sign(real_logits)),
                     'Loss/D/loss': loss},
           'sign_real': jnp.mean(jnp.sign(real_logits))}
    return loss, aux


def global_dr1_loss(diff_d_vars, ens: MontageEnsemble, frozen, real_stack,
                    rng, aug_cfg, aug_p, global_r1_gamma=10.0,
                    use_renderer=True, global_d_real_use_renderer=True):
    """Global R1 (reference: custom/loss_aio.py:327-341): gradient w.r.t. the
    real layer STACK through renderer/composite + augment + D; D's weight
    grads arrive through the double backward."""
    use_r = use_renderer and global_d_real_use_renderer

    def d_sum(stack):
        logits = _global_d_forward(ens, diff_d_vars, frozen.get('renderer'),
                                   stack, aug_cfg, aug_p, rng, use_r)
        return jnp.sum(logits), logits

    r1_grads, real_logits = jax.grad(d_sum, has_aux=True)(real_stack)
    r1_penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3, 4))
    loss = jnp.mean(r1_penalty) * (global_r1_gamma / 2)
    aux = {'stats': {'Loss/r1_penalty': jnp.mean(r1_penalty),
                     'Loss/D/reg': loss},
           'sign_real': jnp.mean(jnp.sign(real_logits))}
    return loss, aux


# ---------------------------------------------------------------------------
# Renderer phase (reference: custom/loss_aio.py:343-372)
# ---------------------------------------------------------------------------

def renderer_loss(diff_renderer_vars, ens: MontageEnsemble, frozen,
                  z, real_stack, rng, loss_type='mse',
                  use_real=True, style_mixing_prob=0.9):
    """Self-supervised renderer retraining: renderer output vs the exact
    alpha composite of the same (detached) layer stack."""
    placed, _, _ = _global_g_forward(
        ens, {'mapping': frozen['mapping'], 'local_g': frozen['local_g'],
              'stn': frozen['stn']}, z, rng, style_mixing_prob)
    placed = jax.lax.stop_gradient(placed)

    def criterion(a, b):
        if loss_type == 'mse':
            return jnp.mean(jnp.square(a - b))
        return jnp.mean(jnp.abs(a - b))

    def one(stack):
        out = ens.renderer.apply(diff_renderer_vars, stack)
        target = jax.lax.stop_gradient(
            alpha_composite(normalize_zero1(stack)))
        out01 = normalize_zero1(out)
        return criterion(out01, target), calc_psnr(
            jax.lax.stop_gradient(out01), target)

    loss_gen, psnr_gen = one(placed)
    stats = {'Renderer/loss_gen': loss_gen, 'Renderer/psnr_gen': psnr_gen}
    loss = loss_gen
    if use_real:
        loss_real, psnr_real = one(real_stack)
        stats.update({'Renderer/loss_real': loss_real,
                      'Renderer/psnr_real': psnr_real})
        loss = loss + loss_real
    return loss, {'stats': stats}
