"""Benchmark: MontageGAN all-in-one training throughput on one chip.

Measures imgs/sec of the full jitted AIO train step (9 local GAN G/D phases +
global GAN + renderer, lazy-reg masks amortized) at the reference's canonical
cfg 'aio' geometry: 9 RGBA layers, 256px base, batch 32
(reference: train_aio.py:179-184, main.py:7-16).

Prints ONE JSON line:
  {"metric": "train_aio imgs/sec/chip @256px", "value": N,
   "unit": "imgs/sec", "vs_baseline": N}

``vs_baseline`` normalizes against BASELINE_IMGS_PER_SEC, an *estimate* of the
PyTorch reference's train_aio throughput on one A100 (the reference publishes
no numbers — BASELINE.md; the north-star target is ≥2× that estimate).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# TPU compile artifacts are architecture-stable on this machine; cache them so
# repeat bench runs skip the (remote-relay, very slow) compiles.  Enabled
# AFTER the CPU-side init below — CPU artifacts from the remote-compile relay
# can target a different host CPU and must not be cached (SIGILL risk).
TPU_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_tpu_cache")


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _is_transient(e) -> bool:
    """Transient tunnel/transport failure (the remote relay occasionally
    drops connections mid-run)?  OOM / compile errors are NOT transient."""
    msg = str(e)
    return ('UNAVAILABLE' in msg or 'Connection refused' in msg
            or 'Connection reset' in msg or 'transport' in msg)

# Estimated reference (PyTorch, A100) train_aio throughput at cfg 'aio'.
# The reference publishes no benchmarks (BASELINE.md); this anchor is derived
# from SG2-ADA's published 256px training speed scaled by MontageGAN's ~11
# sequential phase passes per batch. Revisit when a measured number exists.
BASELINE_IMGS_PER_SEC = 25.0

BATCH = 32
# warmup step indices chosen to compile/warm EVERY reg-combo program before
# the timed window: the first step (idx 0) warms the full-reg combo + all
# tail variants, idx 4 warms G-reg-only, idx 1/2 the no-reg combo
WARMUP_STEP_IDXS = (4, 1, 2)
MEASURE_STEPS = 32  # two full D-reg intervals → amortized lazy-reg cost included


def phase_report(stats, cfg, hyper, step_idx):
    """Per-phase achieved FLOP/s lines against the analytic per-program
    model (phase names match utils/flops.phase_flops keys) — the
    optimization dashboard: the phase with the worst TF/s is the target."""
    from montage_gan_tpu.utils.flops import phase_flops
    pf = phase_flops(cfg, hyper, step_idx=step_idx)
    lines = []
    for k, v in sorted(stats.items()):
        if not k.startswith('Timing/'):
            continue
        name = k[len('Timing/'):]
        if name in pf and float(v) > 0:
            rate = pf[name] / float(v) / 1e12
            lines.append(f"{k}: {float(v):.2f}s  "
                         f"({pf[name] / 1e12:.1f} TFLOP → {rate:.1f} TF/s)")
        else:
            lines.append(f"{k}: {float(v):.2f}s")
    return lines


def main():
    from montage_gan_tpu.data.synthetic import synthetic_batch
    from montage_gan_tpu.models.ensemble import MontageConfig, MontageEnsemble
    from montage_gan_tpu.training.augment import make_augment_config
    from montage_gan_tpu.training.train_step import MontageTrainer, TrainHyper
    from montage_gan_tpu.utils.image_utils import make_batch_for_local_d_np

    from montage_gan_tpu.training.phase_exec import PhaseExecutor
    from montage_gan_tpu.utils.platform import select_platform
    select_platform()  # honors MGT_PLATFORM

    cfg = MontageConfig()  # production 9-layer 256px config (cfg 'aio')
    ens = MontageEnsemble(cfg)
    hyper = TrainHyper(batch_size=BATCH,
                       augment=make_augment_config('bgcfnc'),
                       ada_target=0.6,
                       # async phase dispatch allocates program N+1's temps
                       # while N executes: a full-batch local phase (~5.8G
                       # temps) next to the ~7.5G resident state fits ONCE
                       # but not twice on the 16G chip.  Microbatching local
                       # phases to 16 (2 scan rounds, reference batch_gpu
                       # rounds, training_loop_aio.py:620-627) halves the
                       # per-program temps so back-to-back programs overlap
                       # safely; the global/renderer phases backprop through
                       # all 9 local Gs at once and need rounds of 8.
                       microbatch=16,
                       global_microbatch=8)
    trainer = MontageTrainer(ens, hyper)
    executor = PhaseExecutor(trainer)

    init_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_init_state.pkl")
    if os.path.exists(init_cache):
        import pickle
        _log("loading cached initial state...")
        with open(init_cache, 'rb') as f:
            state = pickle.load(f)
    else:
        _log("initializing variables on CPU backend...")
        t0 = time.time()
        # init with a small batch: flax params are batch-independent, and the
        # init forward traces run eagerly on one CPU — batch 32 made first-run
        # init take ~1h; batch 4 (the mbstd group size) is ~8x cheaper
        state = trainer.init_state(jax.random.PRNGKey(0), batch=4)
        _log(f"init done in {time.time() - t0:.0f}s")
        import pickle
        state_host = jax.device_get(state)
        with open(init_cache, 'wb') as f:
            pickle.dump(state_host, f)
        state = state_host

    # enable the (TPU-only) persistent compile cache from here on
    jax.config.update("jax_compilation_cache_dir", TPU_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = np.random.RandomState(0)
    stack01 = synthetic_batch(rng, BATCH, cfg.num_layers, cfg.base_resolution)
    crops = tuple(jnp.asarray(c) for c in make_batch_for_local_d_np(
        stack01, [list(t) for t in cfg.layer_targets], to_minus11=True))
    stack = jnp.asarray(stack01 * 2.0 - 1.0)

    # ``state`` is still the HOST copy here.  The whole run (device_put →
    # warmup → timed window) retries as a unit on transient transport
    # failures: the executor's phase programs DONATE their input state
    # buffers, so after any mid-run failure the device state is
    # unrecoverable — the only safe restart point is a fresh device_put of
    # the initial host state.  Programs stay compiled across attempts, so a
    # retry costs seconds, not the compile hour.
    state_host = state

    # NOTE on synchronization: jax.block_until_ready can return EARLY over
    # the tunneled PJRT transport (observed in round 1 — it made the bench
    # report dispatch throughput, a physically impossible 161 ms/step vs the
    # 812 ms/step analytic speed-of-light at 100% MFU).  A device→host
    # SCALAR READBACK of a value data-dependent on the final state cannot
    # return early: the bytes must exist.  Every barrier below is a readback.
    def sync(st):
        return float(jax.device_get(jnp.sum(st.pl_mean) + st.step))

    def run_once():
        state = jax.device_put(state_host)
        _log("compiling + running first step (warms all phase programs)...")
        step_idx = 0
        t_compile = time.time()
        state, stats = executor.step(state, stack, crops,
                                     jax.random.PRNGKey(1),
                                     step_idx=step_idx)
        step_idx += 1
        sync(state)
        _log(f"first step (compile+run): {time.time() - t_compile:.0f}s")

        # warm every reg-interval program variant (steps where R1/PL do and
        # don't run) so the timed window sees zero compiles/cache loads
        for i, widx in enumerate(WARMUP_STEP_IDXS):
            t0 = time.time()
            state, stats = executor.step(
                state, stack, crops, jax.random.PRNGKey(2 + i),
                step_idx=widx,
                time_phases=(i == len(WARMUP_STEP_IDXS) - 1))
            sync(state)
            _log(f"warmup step idx={widx}: {time.time() - t0:.2f}s")
        for line in phase_report(stats, cfg, hyper, WARMUP_STEP_IDXS[-1]):
            _log(line)

        sync(state)  # drain warmup before opening the timed window

        t0 = time.time()
        for i in range(MEASURE_STEPS):
            state, stats = executor.step(state, stack, crops,
                                         jax.random.PRNGKey(100 + i),
                                         step_idx=step_idx)
            step_idx += 1
            # Per-step readback barrier: bounds in-flight programs to ONE
            # step's worth.  Letting all MEASURE_STEPS dispatch
            # asynchronously OOMs the 16G chip (their temps stack), and the
            # readback is the only sync primitive the tunnel honors.  Costs
            # one tunnel RTT per step — negligible against a real step.
            sync(state)
        return time.time() - t0

    tries, wait_s = 3, 60.0
    for attempt in range(tries):
        try:
            dt = run_once()
            break
        except Exception as e:
            if not _is_transient(e) or attempt == tries - 1:
                raise
            _log(f"transient transport error (attempt {attempt + 1}/{tries})"
                 f", restarting run from initial state in {wait_s:.0f}s: "
                 f"{str(e)[:200]}")
            time.sleep(wait_s)
            wait_s *= 2
    _log(f"measure: {MEASURE_STEPS} steps in {dt:.2f}s "
         f"({dt / MEASURE_STEPS * 1000:.0f} ms/step)")

    imgs_per_sec = BATCH * MEASURE_STEPS / dt
    sec_per_step = dt / MEASURE_STEPS

    # analytic MXU FLOPs of the amortized step → MFU vs the v5e bf16 peak
    # (conv/matmul MACs only with AD multipliers; utils/flops.py documents
    # the model — elementwise/VPU work deliberately excluded)
    from montage_gan_tpu.utils.flops import (PEAK_BF16_FLOPS, mfu,
                                             train_step_flops)
    flops_step = train_step_flops(cfg, hyper)
    chip = 'v5e' if jax.devices()[0].platform != 'cpu' else 'cpu'
    mfu_val = mfu(flops_step, sec_per_step, chip)
    _log(f"analytic {flops_step / 1e12:.2f} TFLOP/step, "
         f"{flops_step / sec_per_step / 1e12:.1f} TFLOP/s achieved, "
         f"MFU {mfu_val * 100:.1f}% of {chip} bf16 peak "
         f"({PEAK_BF16_FLOPS[chip] / 1e12:.0f} TF/s)")

    result = {
        "metric": "train_aio imgs/sec/chip @256px (9-layer AIO step)",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
        "ms_per_step": round(sec_per_step * 1000, 1),
        "analytic_tflop_per_step": round(flops_step / 1e12, 3),
        "mfu": round(mfu_val, 4),
        "mfu_peak_ref": f"{chip} bf16 {PEAK_BF16_FLOPS[chip] / 1e12:.0f}e12",
    }
    print(json.dumps(result))
    # extra context on stderr-like secondary line is avoided: single line only


if __name__ == "__main__":
    main()
