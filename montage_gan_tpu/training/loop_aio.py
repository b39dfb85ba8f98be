"""Host-side all-in-one training loop.

The orchestration analogue of the reference's training_loop
(reference: custom/training_loop_aio.py:131-896): dataset + infinite sampler,
the (single, jitted) train step over a data mesh, per-tick status/stat sinks,
image + network snapshots, EMA sampling, abort/progress callbacks, resume.

All compute is in the jitted step (training/train_step.py); this file only
moves numpy batches, prints, and saves files.  Host-side batch prep
(per-layer centered crops, reference image_utils.py:246-266) runs in a
prefetch thread so the device never waits on PIL/numpy.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import DatasetAIO
from ..data.sampler import InfiniteSampler
from ..models.ensemble import MontageConfig, MontageEnsemble
from ..parallel.distributed import process_info, shard_host_batch
from ..parallel.mesh import (make_mesh, make_parallel_train_step, replicate,
                             shard_batch)
from ..utils import checkpoint as ckpt
from ..utils.grid import save_image_grid
from ..utils.image_utils import (alpha_composite_np, make_batch_for_local_d_np,
                                 normalize_zero1)
from ..utils.logging_utils import format_time
from ..utils.training_stats import (Collector, JsonlWriter, StatsAccumulator,
                                    make_tensorboard_writer)
from .train_step import MontageTrainer, MontageTrainState, TrainHyper


class BatchPrefetcher:
    """Background thread producing (stack[-1,1], crops[-1,1]) numpy batches.

    Decode runs in the native C++ thread pool when available
    (data/native_loader.py; the reference's DataLoader-worker-process
    analogue, custom/training_loop_aio.py:240-244), with the PIL path as
    fallback — sampling order is identical either way."""

    def __init__(self, dataset: DatasetAIO, batch_size: int,
                 layer_targets, seed: int = 0, rank: int = 0,
                 num_replicas: int = 1, depth: int = 3,
                 use_native: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.layer_targets = [list(t) for t in layer_targets]
        self.sampler = iter(InfiniteSampler(len(dataset), rank=rank,
                                            num_replicas=num_replicas,
                                            seed=seed))
        self.native = None
        if use_native:
            try:
                from ..data.native_loader import NativeBatchLoader
                h, w = dataset.image_shape
                loader = NativeBatchLoader(dataset.item_paths(), h, w,
                                           dataset.num_channels)
                if loader.is_native:
                    self.native = loader
            except Exception:
                pass
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False
        self._error: Optional[BaseException] = None
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _fetch_stack01(self):
        idxs = [next(self.sampler) for _ in range(self.batch_size)]
        if self.native is not None:
            raw = self.dataset.raw_idx[idxs]
            flips = self.dataset.is_xflip[idxs]
            return self.native.next_batch(raw, flips)
        return np.stack([self.dataset[i] for i in idxs])  # [B,L,H,W,4]

    def _worker(self):
        try:
            while not self._stop:
                stack01 = self._fetch_stack01()
                crops = make_batch_for_local_d_np(stack01,
                                                  self.layer_targets,
                                                  to_minus11=True)
                self.q.put((stack01 * 2.0 - 1.0, tuple(crops)))
        except BaseException as e:  # surface in next(), don't hang the loop
            self._error = e
            self.q.put(None)

    def next(self):
        # Check the error flag BEFORE blocking on the queue: the dead worker
        # enqueued a single None sentinel, and every subsequent next() must
        # keep raising instead of hanging on the empty queue.
        if self._error is not None:
            raise RuntimeError('BatchPrefetcher worker failed') \
                from self._error
        item = self.q.get()
        if item is None and self._error is not None:
            raise RuntimeError('BatchPrefetcher worker failed') \
                from self._error
        return item

    def stop(self):
        self._stop = True
        try:
            self.q.get_nowait()
        except queue.Empty:
            pass


def config_from_dataset(dataset: DatasetAIO, **overrides) -> MontageConfig:
    """Derive the ensemble config from dataset statistics
    (reference: custom/training_loop_aio.py:251-297)."""
    from ..models.stn import auto_stn_stages
    kwargs = dict(
        layer_names=tuple(dataset.layer_names),
        layer_targets=dataset.layer_targets,
        base_resolution=dataset.resolution,
        img_channels=dataset.num_channels,
        conv_config_index=dataset.conv_config_index,
        stn_stages=auto_stn_stages(dataset.resolution),
    )
    kwargs.update(overrides)
    return MontageConfig(**kwargs)


def training_loop(
        run_dir: str,
        dataset: DatasetAIO,
        cfg: Optional[MontageConfig] = None,
        hyper: Optional[TrainHyper] = None,
        total_kimg: int = 25000,
        kimg_per_tick: int = 4,
        image_snapshot_ticks: Optional[int] = 1,
        network_snapshot_ticks: Optional[int] = 50,
        random_seed: int = 0,
        resume_path: Optional[str] = None,
        resume_kimg: float = 0.0,
        num_devices: Optional[int] = None,
        metrics: Optional[List[str]] = None,
        metric_fn: Optional[Callable] = None,
        abort_fn: Optional[Callable[[], bool]] = None,
        progress_fn: Optional[Callable[[int, int], None]] = None,
        run_once: bool = False,
        use_phase_executor: bool = True,
        merge_locals: str = 'per_layer',
        precompile: bool = True,
        precompile_workers: int = 6,
        save_all_layers: bool = False,
        run_latent_interpolation: bool = False,
        trace_dir: Optional[str] = None,
        trace_start_iter: int = 8,
        trace_num_iters: int = 3,
):
    os.makedirs(run_dir, exist_ok=True)
    if cfg is None:
        cfg = config_from_dataset(dataset)
    if hyper is None:
        hyper = TrainHyper()
    metrics = metrics or []

    # multi-host: each process runs this loop over the GLOBAL mesh with its
    # own rank's sampler stride; filesystem outputs are primary-only (the
    # reference's rank==0 gates, custom/training_loop_aio.py:521,700)
    rank, nproc = process_info()
    primary = rank == 0
    assert hyper.batch_size % max(nproc, 1) == 0, \
        f"batch {hyper.batch_size} must divide over {nproc} processes"

    if primary:
        with open(os.path.join(run_dir, 'montage_gan_options.json'),
                  'w') as f:
            json.dump({'config': str(cfg), 'hyper': str(hyper)}, f, indent=2)

    ens = MontageEnsemble(cfg)
    trainer = MontageTrainer(ens, hyper)

    mesh = make_mesh(num_devices)
    n_dev = mesh.devices.size
    assert hyper.batch_size % n_dev == 0, \
        f"batch {hyper.batch_size} must divide over {n_dev} devices"

    print(f'Constructing state ({cfg.num_layers} layers, base '
          f'{cfg.base_resolution}px, {n_dev} device(s))...')
    state = trainer.init_state(jax.random.PRNGKey(random_seed),
                               batch=hyper.batch_size)
    from ..utils.summary import ensemble_summary
    print(ensemble_summary(state.variables, layer_names=cfg.layer_names))
    if resume_path is not None:
        print(f'Resuming from "{resume_path}"')
        state = ckpt.restore_train_state(resume_path, state)
    state = replicate(mesh, state)
    if use_phase_executor:
        # per-phase compiled programs with geometry sharing (fast compile,
        # host-side interval scheduling) — see training/phase_exec.py
        from .phase_exec import PhaseExecutor
        executor = PhaseExecutor(trainer, merge_locals=merge_locals)
        host_step = [None]  # resolved from state.step once, then host-counted

        def step_fn(s, a, b, r, time_phases=False):
            if host_step[0] is None:
                host_step[0] = int(s.step)
                if precompile:
                    # AOT-compile the full program set with the backend
                    # compilations running concurrently (the serial
                    # compile-on-first-dispatch walk is the dominant
                    # startup cost — docs/PERF.md "cold start").  Shapes/
                    # shardings are taken from this first real batch, so
                    # the artifacts are exactly the ones dispatch uses.
                    t_pre = time.time()
                    try:
                        n = executor.precompile(
                            s, a, b, max_workers=precompile_workers,
                            log=print if primary else None)
                        print(f'Precompiled {n} phase programs in '
                              f'{time.time() - t_pre:.0f}s')
                    except Exception as e:  # pragma: no cover - defensive
                        print(f'precompile failed (continuing with '
                              f'on-demand compiles): {str(e)[:200]}')
            out = executor.step(s, a, b, r, time_phases=time_phases,
                                step_idx=host_step[0])
            host_step[0] += 1
            return out
    else:
        _pstep = make_parallel_train_step(trainer, mesh)
        step_fn = lambda s, a, b, r, time_phases=False: _pstep(s, a, b, r)  # noqa: E731

    # each process loads ONLY its slice of the global batch, on its rank's
    # stride of the shared deterministic sampler stream
    prefetcher = BatchPrefetcher(dataset, hyper.batch_size // max(nproc, 1),
                                 cfg.layer_targets, seed=random_seed,
                                 rank=rank, num_replicas=max(nproc, 1))

    # reals preview + fixed grid z (reference: training_loop_aio.py:521-534)
    grid_size = min(32, hyper.batch_size)
    grid_z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(random_seed + 1),
                          (grid_size, cfg.z_dim)))
    if primary:
        preview = np.stack([dataset[i % len(dataset)]
                            for i in range(grid_size)])
        save_image_grid(alpha_composite_np(preview),
                        os.path.join(run_dir, 'reals.png'), nrow=8)

    sample_fn = jax.jit(lambda variables, z: ens.run_global_g(
        variables, z, noise_mode='const')[0]) if cfg.train_global else \
        jax.jit(lambda variables, z: ens.synthesize_layers(
            variables, ens.mapping.apply(variables['mapping'], z),
            noise_mode='const'))

    acc = StatsAccumulator()
    collector = Collector(acc)
    jsonl = JsonlWriter(os.path.join(run_dir, 'stats.jsonl')) \
        if primary else None
    tb = make_tensorboard_writer(run_dir) if primary else None

    cur_nimg = int(resume_kimg * 1000)
    cur_tick = 0
    _metric_cache: dict = {}  # per-invocation jit/extractor cache
    tick_start_nimg = cur_nimg
    start_time = time.time()
    tick_start_time = start_time
    maintenance_time = 0.0
    done = False
    print(f'Training for {total_kimg} kimg...')

    it = 0
    tracing = False
    time_next_step = False
    while True:
        # ---- one training iteration -----------------------------------
        t0 = time.time()
        stack_np, crops_np = prefetcher.next()
        if nproc > 1:
            # host-local slice → globally batch-sharded arrays
            stack = shard_host_batch(mesh, stack_np)
            crops = shard_host_batch(mesh, tuple(crops_np))
        else:
            stack = shard_batch(mesh, jnp.asarray(stack_np))
            crops = shard_batch(mesh, tuple(jnp.asarray(c)
                                            for c in crops_np))
        acc.report('Timing/data_fetch', time.time() - t0)

        # profiler window (reference region annotation / per-phase events,
        # custom/training_loop_aio.py:511-516; SURVEY §5.1): trace a few
        # post-warmup steps into trace_dir for xprof/tensorboard
        if trace_dir is not None and it == trace_start_iter:
            jax.block_until_ready(jax.tree_util.tree_leaves(state.variables))
            jax.profiler.start_trace(trace_dir)
            tracing = True
        rng = jax.random.fold_in(jax.random.PRNGKey(random_seed + 2),
                                 cur_nimg)
        state, stats = step_fn(state, stack, crops, replicate(mesh, rng),
                               time_phases=time_next_step)
        time_next_step = False
        if tracing and it >= trace_start_iter + trace_num_iters - 1:
            jax.block_until_ready(jax.tree_util.tree_leaves(state.variables))
            jax.profiler.stop_trace()
            tracing = False
            print(f'Wrote profiler trace to {trace_dir}')
        it += 1
        cur_nimg += hyper.batch_size

        # host-side stats sink (device→host copy once per step)
        acc.report_dict({k: np.asarray(v) for k, v in stats.items()})

        done = cur_nimg >= total_kimg * 1000
        if (not done) and (cur_tick != 0) \
                and (cur_nimg < tick_start_nimg + kimg_per_tick * 1000):
            continue

        # ---- per-tick maintenance --------------------------------------
        tick_end_time = time.time()
        fields = [f"tick {cur_tick:<5d}", f"kimg {cur_nimg / 1e3:<8.1f}",
                  f"time {format_time(tick_end_time - start_time):<12s}",
                  f"sec/tick {tick_end_time - tick_start_time:<7.1f}",
                  f"sec/kimg "
                  f"{(tick_end_time - tick_start_time) / max(cur_nimg - tick_start_nimg, 1) * 1e3:<7.2f}",
                  f"maintenance {maintenance_time:<6.1f}"]
        acc.report('Progress/tick', cur_tick)
        acc.report('Progress/kimg', cur_nimg / 1e3)
        acc.report('Timing/total_sec', tick_end_time - start_time)
        acc.report('Timing/sec_per_tick', tick_end_time - tick_start_time)
        acc.report('Timing/sec_per_kimg',
                   (tick_end_time - tick_start_time)
                   / max(cur_nimg - tick_start_nimg, 1) * 1e3)
        print(' '.join(fields))

        if (not done) and (abort_fn is not None) and abort_fn():
            done = True
            print('Aborting...')

        # image snapshot (EMA samples, reference :750-766) — primary-only:
        # state is fully replicated, so device_get is host-local everywhere
        # and only one process needs to render/write
        if primary and image_snapshot_ticks is not None and \
                (done or cur_tick % image_snapshot_ticks == 0):
            host_state = jax.device_get(state)
            ema_vars = dict(host_state.ema)
            if cfg.train_global:
                ema_vars['stn'] = host_state.ema['stn']
            batch = np.asarray(sample_fn(ema_vars, jnp.asarray(grid_z)))
            batch = np.clip(batch, -1, 1)
            batch01 = (batch + 1) / 2
            b, l, h, w, c = batch01.shape
            save_image_grid(batch01.reshape(b * l, h, w, c)[:4 * l],
                            os.path.join(run_dir,
                                         f'fakes-layer{cur_nimg // 1000:06d}.png'),
                            nrow=l)
            save_image_grid(alpha_composite_np(batch01),
                            os.path.join(run_dir,
                                         f'fakes{cur_nimg // 1000:06d}.png'),
                            nrow=8)
            if save_all_layers:
                # every layer as an individual image
                # (reference: training_loop_aio.py:743-748)
                d = os.path.join(run_dir,
                                 f'fakes-layer-all{cur_nimg // 1000:06d}')
                os.makedirs(d, exist_ok=True)
                from PIL import Image
                for bi in range(b):
                    for li in range(l):
                        arr = (np.clip(batch01[bi, li], 0, 1) * 255
                               ).astype(np.uint8)
                        Image.fromarray(arr, 'RGBA').save(
                            os.path.join(d, f'{bi:02d}_{li:02d}.png'))
            if run_latent_interpolation:
                # 9 rows × 8-step lerp sheet (reference: :536-550, 768-777)
                lerp_len, lerp_num = 8, 9
                rnd = np.random.RandomState(random_seed + 3)
                z1 = rnd.randn(lerp_num, cfg.z_dim)
                z2 = rnd.randn(lerp_num, cfg.z_dim)
                zs = np.stack([z1 + (z2 - z1) * (i / (lerp_len - 1))
                               for i in range(lerp_len)], axis=1)
                zs = zs.reshape(lerp_num * lerp_len, cfg.z_dim)
                sheets = []
                for off in range(0, zs.shape[0], grid_size):
                    out = np.asarray(sample_fn(
                        ema_vars, jnp.asarray(zs[off:off + grid_size],
                                              dtype=jnp.float32)))
                    sheets.append(np.clip(out, -1, 1))
                lerped = (np.concatenate(sheets) + 1) / 2
                save_image_grid(alpha_composite_np(lerped),
                                os.path.join(
                                    run_dir,
                                    f'interpolate{cur_nimg // 1000:06d}.png'),
                                nrow=lerp_len)

        # network snapshot
        snapshot_path = None
        if primary and network_snapshot_ticks is not None and \
                (done or cur_tick % network_snapshot_ticks == 0):
            host_state = jax.device_get(state)
            snapshot_path = ckpt.save_train_state(run_dir, cur_nimg // 1000,
                                                  host_state)
            ema_tree = dict(host_state.ema)
            renderer_vars = host_state.variables.get('renderer')
            ckpt.save_ema_snapshot(
                os.path.join(run_dir, f'ema-snapshot-{cur_nimg // 1000:06d}'),
                cfg, ema_tree, renderer_vars)

        # metrics on the EMA ensemble (reference: training_loop_aio.py:837-857;
        # like the reference, requires the global path — FID needs the STN)
        if primary and metrics and cfg.train_global and \
                (done or (network_snapshot_ticks is not None
                          and cur_tick % network_snapshot_ticks == 0)):
            from ..metrics import metric_main
            from ..metrics.features import build_extractor
            from ..ops.composite import alpha_composite
            host_state = jax.device_get(state)
            ema_vars = dict(host_state.ema)

            # jit ONCE across ticks; EMA weights enter as arguments, not as
            # baked-in program constants (avoids a full recompile per tick)
            if _metric_cache.get('synth') is None:
                @jax.jit
                def _metric_synth(vars_, z):
                    placed, _ = ens.run_global_g(vars_, z, noise_mode='const')
                    return alpha_composite(
                        normalize_zero1(jnp.clip(placed, -1, 1)))

                @jax.jit
                def _metric_map(vars_, z):
                    return ens.mapping.apply(vars_['mapping'], z)

                @jax.jit
                def _metric_synth_ws(vars_, ws):
                    placed, _ = ens.run_global_g_from_ws(vars_, ws,
                                                         noise_mode='const')
                    return alpha_composite(
                        normalize_zero1(jnp.clip(placed, -1, 1)))
                _metric_cache['synth'] = _metric_synth
                _metric_cache['map'] = _metric_map
                _metric_cache['synth_ws'] = _metric_synth_ws
                _metric_cache['extractor'] = build_extractor('auto')

            def metric_sample_fn(z):
                return _metric_cache['synth'](ema_vars, z)

            def metric_map_fn(z):
                return _metric_cache['map'](ema_vars, z)

            def metric_synth_ws_fn(ws):
                return _metric_cache['synth_ws'](ema_vars, ws)

            extractor = _metric_cache['extractor']
            for metric in ([] if metric_fn else metrics):
                result = metric_main.calc_metric(
                    metric, dataset=dataset, sample_fn=metric_sample_fn,
                    map_fn=metric_map_fn, synth_fn=metric_synth_ws_fn,
                    ppl_samples=2000,  # in-training tracking budget
                    z_dim=cfg.z_dim, extractor=extractor,
                    cache_dir=os.path.join(run_dir, 'metric-cache'),
                    # fan eval over the training mesh (single-process only:
                    # on multi-host the primary cannot address the global
                    # mesh's remote devices for a host-side batch put)
                    mesh=mesh if nproc == 1 else None)
                metric_main.report_metric(result, run_dir=run_dir,
                                          snapshot_pkl=snapshot_path)
                for k, v in result.results.items():
                    acc.report(f'Metrics/{k}', v)
            if metric_fn is not None:
                for metric in metrics:
                    result = metric_fn(metric, state, ens, dataset, run_dir)
                    if result is not None:
                        acc.report_dict(result)

        collector.update()
        if jsonl is not None:
            jsonl.write(collector.as_dict(), timestamp=time.time())
        if tb is not None:
            for name, v in collector.as_dict().items():
                tb.add_scalar(name, v.mean, global_step=int(cur_nimg / 1e3))
            tb.flush()
        if progress_fn is not None:
            progress_fn(cur_nimg // 1000, total_kimg)

        cur_tick += 1
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        maintenance_time = tick_start_time - tick_end_time
        # per-phase wall-times on the first step of each tick (reference
        # per-phase CUDA-event timing, training_loop_aio.py:511-516)
        time_next_step = use_phase_executor
        if done or run_once:
            break

    prefetcher.stop()
    if jsonl is not None:
        jsonl.close()
    print('Exiting...')
    return jax.device_get(state)
