"""Stage-0 renderer pretraining.

Capability parity with the reference's diff_rendering/main_united.py
(reference: diff_rendering/main_united.py:17-159): randomly translate real
layer stacks, train the renderer to match the alpha-composite target with
L1/MSE, Adam lr 1e-3 (amsgrad), PSNR per step, periodic checkpoints with
optimizer state.  The PIL compositing target is replaced by the exact
differentiable composite (stop-gradient), eliminating the CPU round-trip.
"""

from __future__ import annotations

import os
import time

import click
import numpy as np


@click.command()
@click.option('--data', required=True, metavar='DIR')
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--renderer-type', type=click.Choice(['tanh', 'sigmoid',
                                                    'subpixel']),
              default='tanh')
@click.option('--loss-type', type=click.Choice(['mse', 'l1']), default='mse')
@click.option('--batch', type=int, default=64)
@click.option('--steps', type=int, default=32000)
@click.option('--lr', type=float, default=1e-3)
@click.option('--snap-every', type=int, default=4000)
@click.option('--seed', type=int, default=0)
def main(data, outdir, renderer_type, loss_type, batch, steps, lr,
         snap_every, seed):
    """Pretrain the differentiable renderer on randomly-placed real layers."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.dataset import DatasetAIO
    from ..data.sampler import InfiniteSampler
    from ..models.renderer import build_renderer
    from ..ops.composite import alpha_composite
    from ..utils import checkpoint as ckpt
    from ..utils.image_utils import calc_psnr, normalize_minus11, random_position

    os.makedirs(outdir, exist_ok=True)
    dataset = DatasetAIO(data)
    sampler = iter(InfiniteSampler(len(dataset), seed=seed))

    renderer = build_renderer(renderer_type, img_resolution=dataset.resolution,
                              img_channels=dataset.num_channels,
                              img_layers=dataset.num_layers)
    dummy = jnp.zeros((1, dataset.num_layers, dataset.resolution,
                       dataset.resolution, dataset.num_channels))
    params = renderer.init({'params': jax.random.PRNGKey(seed)}, dummy)

    tx = optax.amsgrad(lr, b1=0.9, b2=0.999)
    opt_state = tx.init(params['params'])

    sigmoid_range = renderer_type == 'sigmoid'

    @jax.jit
    def step(params, opt_state, stack01, key):
        """stack01: [B, L, H, W, C] in [0, 1]."""
        placed01 = random_position(stack01, key, pad_value=0.0)
        target = jax.lax.stop_gradient(alpha_composite(placed01))
        model_in = placed01 if sigmoid_range else normalize_minus11(placed01)

        def loss_fn(p):
            out = renderer.apply({'params': p}, model_in)
            out01 = out if sigmoid_range else (out + 1.0) / 2.0
            if loss_type == 'mse':
                loss = jnp.mean(jnp.square(out01 - target))
            else:
                loss = jnp.mean(jnp.abs(out01 - target))
            return loss, out01

        (loss, out01), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params['params'])
        updates, opt_state = tx.update(grads, opt_state, params['params'])
        new_params = {'params': optax.apply_updates(params['params'], updates)}
        psnr = calc_psnr(jax.lax.stop_gradient(out01), target)
        return new_params, opt_state, loss, psnr

    print(f'Pretraining renderer ({renderer_type}, {loss_type}) for '
          f'{steps} steps, batch {batch}...')
    t0 = time.time()
    for global_step in range(1, steps + 1):
        idxs = [next(sampler) for _ in range(batch)]
        stack01 = jnp.asarray(np.stack([dataset[i] for i in idxs]))
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 1), global_step)
        params, opt_state, loss, psnr = step(params, opt_state, stack01, key)
        if global_step % 100 == 0 or global_step == 1:
            print(f'step {global_step:6d} loss {float(loss):.6f} '
                  f'psnr {float(psnr):.2f} dB '
                  f'({(time.time() - t0):.0f}s)')
        if global_step % snap_every == 0 or global_step == steps:
            ckpt.save_pytree(os.path.join(
                outdir, f'renderer{global_step:06d}.msgpack'),
                {'global_step': global_step, 'renderer': params,
                 'opt_state': opt_state})
    print('Done.')


if __name__ == '__main__':
    main()
