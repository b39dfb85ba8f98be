"""Stage-0 STN pretraining as an R1-GAN.

Capability parity with the reference's fukuwarai/main_tanh.py
(reference: fukuwarai/main_tanh.py:16-179): a discriminator judges real
composites vs STN-placed pseudo-fakes (re-centered real layers) rendered by a
FROZEN pretrained renderer; non-saturating softplus losses, R1 on reals,
theta-constraint penalty; three-way batch split (D-real / D-fake / G);
Adam lr 1e-3 betas (0.9, 0.999) for both nets.
"""

from __future__ import annotations

import os
import time

import click
import numpy as np


@click.command()
@click.option('--data', required=True, metavar='DIR')
@click.option('--outdir', required=True, metavar='DIR')
@click.option('--renderer-ckpt', required=True, metavar='PATH',
              help='Pretrained renderer (.msgpack from pretrain_renderer, '
                   'or a reference .pth.tar)')
@click.option('--renderer-type', type=click.Choice(['tanh', 'subpixel']),
              default='tanh')
@click.option('--batch', type=int, default=16)
@click.option('--steps', type=int, default=26000)
@click.option('--lr', type=float, default=1e-3)
@click.option('--r1-gamma', type=float, default=10.0)
@click.option('--discriminator', type=click.Choice(['sg2', 'simple', 'simplev2']),
              default='sg2')
@click.option('--snap-every', type=int, default=1000)
@click.option('--seed', type=int, default=0)
def main(data, outdir, renderer_ckpt, renderer_type, batch, steps, lr,
         r1_gamma, discriminator, snap_every, seed):
    """Pretrain the STN position estimator adversarially."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    import optax

    from ..data.dataset import DatasetAIO
    from ..data.sampler import InfiniteSampler
    from ..models.discriminator import Discriminator
    from ..models.renderer import build_renderer
    from ..models.simple_d import (SimpleGlobalDiscriminator,
                                   SimpleGlobalDiscriminatorV2)
    from ..models.stn import STN, auto_stn_stages
    from ..ops.composite import alpha_composite
    from ..training.losses import theta_constrain_loss
    from ..utils import checkpoint as ckpt
    from ..utils.image_utils import (generate_pseudo_fake_np,
                                     normalize_minus11, normalize_zero1)
    from ..utils.torch_import import load_reference_renderer

    os.makedirs(outdir, exist_ok=True)
    dataset = DatasetAIO(data, xflip=True)
    sampler = iter(InfiniteSampler(len(dataset), seed=seed))
    res, nch, nl = dataset.resolution, dataset.num_channels, dataset.num_layers

    renderer = build_renderer(renderer_type, img_resolution=res,
                              img_channels=nch, img_layers=nl)
    if renderer_ckpt.endswith(('.pth', '.pth.tar')):
        renderer_vars = load_reference_renderer(renderer_ckpt, renderer_type)
    else:
        dummy = jnp.zeros((1, nl, res, res, nch))
        template = renderer.init({'params': jax.random.PRNGKey(0)}, dummy)
        saved = ckpt.restore_pytree(renderer_ckpt,
                                    {'global_step': 0, 'renderer': template,
                                     'opt_state': None})
        renderer_vars = saved['renderer']

    stn = STN(img_resolution=res, img_channels=nch, img_layers=nl,
              num_stages=auto_stn_stages(res))
    if discriminator == 'sg2':
        d_net = Discriminator(img_resolution=res, img_channels=nch)
    elif discriminator == 'simple':
        d_net = SimpleGlobalDiscriminator(img_resolution=res, img_channels=nch)
    else:
        d_net = SimpleGlobalDiscriminatorV2(img_resolution=res,
                                            img_channels=nch)

    key = jax.random.PRNGKey(seed)
    stack_dummy = jnp.zeros((1, nl, res, res, nch))
    img_dummy = jnp.zeros((1, res, res, nch))
    stn_vars = stn.init({'params': key}, stack_dummy)
    d_vars = d_net.init({'params': jax.random.fold_in(key, 1)}, img_dummy)

    tx = optax.adam(lr, b1=0.9, b2=0.999)
    opt_d = tx.init(d_vars['params'])
    opt_stn = tx.init(stn_vars['params'])

    def softplus(x):
        return jax.nn.softplus(x)

    @jax.jit
    def train_d(d_params, opt_d, stn_vars, real1_01, pseudo2_01):
        """D step on (real composite, STN-placed pseudo-fake)."""
        x_real = normalize_minus11(alpha_composite(real1_01))
        placed, _ = stn.apply(stn_vars, normalize_minus11(pseudo2_01))
        rendered = jax.lax.stop_gradient(
            renderer.apply(renderer_vars, placed))

        def loss_fn(p):
            dv = {**d_vars, 'params': p}

            def d_sum(img):
                logits = d_net.apply(dv, img)
                return jnp.sum(logits), logits

            grads_real, real_logits = jax.grad(d_sum, has_aux=True)(x_real)
            gp = 0.5 * r1_gamma * jnp.mean(
                jnp.sum(jnp.square(grads_real), axis=(1, 2, 3)))
            fake_logits = d_net.apply(dv, rendered)
            loss = (jnp.mean(softplus(-real_logits)) + gp
                    + jnp.mean(softplus(fake_logits)))
            return loss, (jnp.mean(real_logits), gp)

        (loss, (score_real, gp)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_params)
        updates, opt_d = tx.update(grads, opt_d, d_params)
        return optax.apply_updates(d_params, updates), opt_d, loss, score_real, gp

    @jax.jit
    def train_stn(stn_params, opt_stn, d_params, pseudo3_01):
        def loss_fn(p):
            sv = {**stn_vars, 'params': p}
            placed, theta = stn.apply(sv, normalize_minus11(pseudo3_01))
            rendered = renderer.apply(renderer_vars, placed)
            logits = d_net.apply({**d_vars, 'params': d_params}, rendered)
            g_loss = jnp.mean(softplus(-logits))
            c_loss = theta_constrain_loss(theta)
            # renderer sanity metric (not trained here):
            target = alpha_composite(normalize_zero1(
                jax.lax.stop_gradient(placed)))
            r_loss = jnp.mean(jnp.square(normalize_zero1(rendered) - target))
            return g_loss + c_loss, (g_loss, c_loss, r_loss,
                                     jnp.mean(logits))

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            stn_params)
        updates, opt_stn = tx.update(grads, opt_stn, stn_params)
        return optax.apply_updates(stn_params, updates), opt_stn, loss, aux

    d_params, stn_params = d_vars['params'], stn_vars['params']
    print(f'Pretraining STN ({discriminator} D) for {steps} steps...')
    t0 = time.time()
    for step in range(steps + 1):
        idxs = [next(sampler) for _ in range(batch * 3)]
        data01 = np.stack([dataset[i] for i in idxs])
        d1, d2, d3 = np.split(data01, 3)
        pseudo2 = jnp.asarray(generate_pseudo_fake_np(d2))
        pseudo3 = jnp.asarray(generate_pseudo_fake_np(d3))

        d_params, opt_d, d_loss, score_real, gp = train_d(
            d_params, opt_d, {**stn_vars, 'params': stn_params},
            jnp.asarray(d1), pseudo2)
        stn_params, opt_stn, g_loss, (g_r1, g_con, r_loss, score_fake) = \
            train_stn(stn_params, opt_stn, d_params, pseudo3)

        if step % 100 == 0:
            print(f'Step: {step}, D Loss: {float(d_loss):.4f}, '
                  f'G Loss: {float(g_loss):.4f}, gp: {float(gp):.4f}, '
                  f'renderer_mse: {float(r_loss):.6f}, '
                  f'Time: {time.time() - t0:.0f}s')
        if step % snap_every == 0 or step == steps:
            ckpt.save_pytree(
                os.path.join(outdir, f'r1gan{step:06d}.msgpack'),
                {'global_step': step,
                 'D': {**d_vars, 'params': d_params},
                 'stn': {**stn_vars, 'params': stn_params},
                 'opt_d': opt_d, 'opt_stn': opt_stn})
    print('Done.')


if __name__ == '__main__':
    main()
