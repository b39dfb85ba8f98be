"""Validate utils/flops.py (the analytic MFU model) against XLA's own
compiled-program cost analysis.

The bench's MFU figure is only as honest as the FLOP count under it: round 1
reported a physically impossible throughput (5x the chip's bf16 peak) and the
analytic model is what caught it.  These tests pin the model to XLA's
cost_analysis so it can't drift from the real programs:

  * network forwards (synthesis / discriminator / mapping) must account for
    the large majority of XLA's counted flops — the model deliberately
    excludes elementwise/VPU work, so analytic <= XLA, but convs dominate and
    the gap must stay small;
  * the AD multiplier (backward ~ 2x forward for a conv/matmul chain) must
    match the compiled value_and_grad program.
"""

import jax
import jax.numpy as jnp
import pytest

from montage_gan_tpu.models import discriminator as disc_mod
from montage_gan_tpu.models import mapping as map_mod
from montage_gan_tpu.models import synthesis as syn_mod
from montage_gan_tpu.models.ensemble import MontageConfig
from montage_gan_tpu.utils import flops as F
from montage_gan_tpu.utils.calc_res import calc_init_res

# Quick tier: the pure-Python FLOP-model consistency checks. The
# XLA-cost-analysis cross-checks (8-20 s of compiles each) are slow-tier.
quick = pytest.mark.quick
slow = pytest.mark.slow


def xla_flops(fn, *args):
    """Total flops XLA attributes to the compiled program."""
    compiled = jax.jit(fn).lower(*args).compile()
    (analysis,) = [compiled.cost_analysis()] \
        if isinstance(compiled.cost_analysis(), dict) \
        else [compiled.cost_analysis()[0]]
    return float(analysis['flops'])


def _cfg(target=(64, 64), channel_base=8192, channel_max=256):
    return MontageConfig(layer_names=('a',), layer_targets=(target,),
                         base_resolution=target[0],
                         channel_base=channel_base, channel_max=channel_max,
                         num_fp16_res=0, stn_stages=2, mapping_num_layers=4,
                         z_dim=128, w_dim=128)


@slow
def test_synthesis_forward_flops_match_xla():
    cfg = _cfg()
    init_res, res = cfg.layer_geometry(0)
    net = syn_mod.SynthesisNetwork(
        img_resolution=res, img_channels=cfg.img_channels,
        init_res=init_res, conv_config_index=cfg.conv_config_index,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, w_dim=cfg.w_dim)
    batch = 4
    ws = jnp.zeros((batch, net.num_ws, cfg.w_dim))
    variables = net.init(jax.random.PRNGKey(0), ws, noise_mode='const')

    analytic = F.synthesis_fwd(cfg, 0, batch)
    measured = xla_flops(
        lambda v, w: net.apply(v, w, noise_mode='const'), variables, ws)
    # analytic excludes elementwise + the depthwise blur convs -> <= XLA;
    # convs dominate at this width, so the model must cover most of it
    assert 0.70 * measured <= analytic <= 1.05 * measured, \
        (analytic / 1e9, measured / 1e9)


@slow
def test_discriminator_forward_flops_match_xla():
    cfg = _cfg()
    init_res, res = cfg.layer_geometry(0)
    net = disc_mod.Discriminator(
        img_resolution=res, img_channels=cfg.img_channels,
        init_res=init_res, conv_config_index=cfg.conv_config_index,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, mbstd_group_size=2)
    batch = 4
    x = jnp.zeros((batch,) + cfg.layer_targets[0] + (cfg.img_channels,))
    variables = net.init(jax.random.PRNGKey(0), x)

    analytic = F.discriminator_fwd(cfg, batch, cfg.layer_targets[0], res,
                                   init_res)
    measured = xla_flops(lambda v, xx: net.apply(v, xx), variables, x)
    assert 0.70 * measured <= analytic <= 1.05 * measured, \
        (analytic / 1e9, measured / 1e9)


@quick
def test_mapping_forward_flops_match_xla():
    cfg = _cfg()
    net = map_mod.MappingNetwork(z_dim=cfg.z_dim, c_dim=0, w_dim=cfg.w_dim,
                                 num_ws=8,
                                 num_layers=cfg.mapping_num_layers)
    batch = 64
    z = jnp.zeros((batch, cfg.z_dim))
    variables = net.init(jax.random.PRNGKey(0), z)
    analytic = F.mapping_fwd(cfg, batch, 1)
    measured = xla_flops(lambda v, zz: net.apply(v, zz), variables, z)
    # tiny matmuls: broadcast_w / normalize overhead is relatively larger
    assert 0.50 * measured <= analytic <= 1.05 * measured, \
        (analytic / 1e6, measured / 1e6)


@slow
def test_backward_multiplier_matches_xla():
    """value_and_grad of a conv net compiles to ~3x the forward flops — the
    multiplier train_step_flops applies to every differentiated pass."""
    cfg = _cfg(target=(32, 32), channel_base=4096, channel_max=128)
    init_res, res = cfg.layer_geometry(0)
    net = syn_mod.SynthesisNetwork(
        img_resolution=res, img_channels=cfg.img_channels,
        init_res=init_res, conv_config_index=cfg.conv_config_index,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        conv_clamp=cfg.conv_clamp, w_dim=cfg.w_dim)
    batch = 4
    ws = jnp.zeros((batch, net.num_ws, cfg.w_dim))
    variables = net.init(jax.random.PRNGKey(0), ws, noise_mode='const')

    def loss(v, w):
        return jnp.sum(net.apply(v, w, noise_mode='const') ** 2)

    fwd = xla_flops(loss, variables, ws)
    fwd_bwd = xla_flops(jax.value_and_grad(loss), variables, ws)
    ratio = fwd_bwd / fwd
    assert 2.3 <= ratio <= 3.6, ratio


@quick
def test_train_step_flops_scale():
    """The full-step analytic total at the bench config reproduces the
    round-2 audit number (~160 TFLOP/step at batch 32) — the figure that
    exposed the round-1 sync bug (161 ms/step would have required ~5x the
    v5e's bf16 peak)."""
    from montage_gan_tpu.training.train_step import TrainHyper
    cfg = MontageConfig()
    hyper = TrainHyper(batch_size=32, microbatch=16, global_microbatch=8)
    total = F.train_step_flops(cfg, hyper)
    assert 1.2e14 < total < 2.2e14, total / 1e12
    # speed-of-light on v5e must be far above the bogus round-1 number
    assert total / F.PEAK_BF16_FLOPS['v5e'] > 0.6  # > 600 ms/step


@quick
def test_phase_flops_consistent_with_total():
    """phase_flops (per-event, executor Timing keys) must recompose into the
    amortized train_step_flops exactly: sum the non-reg step, add each reg
    phase's increment divided by its interval."""
    from montage_gan_tpu.training.train_step import TrainHyper
    from montage_gan_tpu.utils.flops import (local_phase_flops, phase_flops,
                                             tail_phase_flops,
                                             train_step_flops)
    cfg = MontageConfig()
    hyper = TrainHyper(batch_size=8, augment=None)

    base = phase_flops(cfg, hyper, step_idx=1)  # no regs, no global tick?
    # step 1: locals only + Renderer (goi default may be 1 — derive from keys)
    total = train_step_flops(cfg, hyper)

    # recompose: non-reg locals + amortized reg increments + tail
    recomposed = 0.0
    for i in range(cfg.num_layers):
        b0 = local_phase_flops(cfg, hyper, i)
        recomposed += b0
        if hyper.g_reg_interval and hyper.pl_weight:
            recomposed += (local_phase_flops(cfg, hyper, i, include_greg=True)
                           - b0) / hyper.g_reg_interval
        if hyper.d_reg_interval and hyper.r1_gamma:
            recomposed += (local_phase_flops(cfg, hyper, i, include_dreg=True)
                           - b0) / hyper.d_reg_interval
    tail = tail_phase_flops(cfg, hyper)
    goi = max(hyper.global_optimize_interval, 1)
    recomposed += (tail['global_Gmain'] + tail['global_Dmain']) / goi
    if hyper.d_reg_interval and hyper.global_r1_gamma:
        recomposed += tail['global_Dreg'] / (hyper.d_reg_interval * goi)
    recomposed += tail['Renderer']
    assert abs(recomposed - total) / total < 1e-12

    # every executor phase at a reg step has a FLOPs entry, keyed identically
    reg_step = phase_flops(cfg, hyper, step_idx=0)
    assert set(f'local_{n}' for n in cfg.layer_names) <= set(reg_step)
    assert {'Renderer', 'global_Gmain', 'global_Dmain'} <= set(reg_step)
    # reg-step local programs cost strictly more than non-reg ones
    for n in cfg.layer_names:
        assert reg_step[f'local_{n}'] > base[f'local_{n}']


@quick
def test_bench_phase_report_covers_executor_timing_keys():
    """bench.phase_report must map every Timing/<phase> key the
    PhaseExecutor emits at the bench config to an analytic FLOPs entry
    (ema_ada excepted — elementwise only), so the driver's round-end bench
    prints a full per-phase TF/s dashboard instead of crashing or silently
    skipping phases."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from montage_gan_tpu.training.train_step import TrainHyper

    cfg = MontageConfig()
    hyper = TrainHyper(batch_size=32, augment=None, microbatch=16,
                       global_microbatch=8)
    # the executor's exact Timing keys at the bench config
    # (phase_exec.py:381-435)
    stats = {f'Timing/local_{n}': 0.1 for n in cfg.layer_names}
    stats.update({'Timing/Renderer': 0.1, 'Timing/global_Gmain': 0.1,
                  'Timing/global_Dmain': 0.1, 'Timing/global_Dreg': 0.1,
                  'Timing/ema_ada': 0.01})
    lines = bench.phase_report(stats, cfg, hyper,
                               bench.WARMUP_STEP_IDXS[-1])
    assert len(lines) == len(stats)
    # every compute phase (≠ ema_ada, ≠ the reg-only program when this
    # step_idx skips regs) carries a TF/s figure
    no_rate = [ln for ln in lines if 'TF/s' not in ln]
    assert all(('ema_ada' in ln) or ('global_Dreg' in ln) for ln in no_rate), \
        no_rate
