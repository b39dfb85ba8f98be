"""Latent inversion: project a target image into W space.

Capability parity with the reference's projector.py
(reference: projector.py:26-132): initialize w at the mapping average with
std from 10k samples, optimize (w, per-layer noise buffers) with Adam under a
cosine-ramped lr schedule, add ramped-down noise to w, regularize the noise
buffers for spatial decorrelation at multiple scales.

The perceptual distance is pluggable: the reference downloads VGG16-LPIPS
(projector.py:61-63); offline we default to a multi-scale pixel+feature
distance over the fixed random feature pyramid (relative, deterministic), and
use LPIPS weights when provided.
"""

from __future__ import annotations

import os

import click
import numpy as np


@click.command()
@click.option('--network', 'network_path', required=True, metavar='PATH')
@click.option('--target', 'target_path', required=True, metavar='FILE',
              help='Target RGBA image (will be composited over white if RGB '
                   'is required)')
@click.option('--layer', 'layer_idx', type=int, default=None,
              help='Project into a single local G (default: full ensemble)')
@click.option('--num-steps', type=int, default=1000)
@click.option('--seed', type=int, default=303)
@click.option('--save-video', is_flag=True, default=False)
@click.option('--optimize-noise/--no-optimize-noise', default=True,
              help='Co-optimize per-layer noise buffers with decorrelation '
                   'regularization (reference: projector.py:71-77,106-114)')
@click.option('--outdir', required=True)
def main(network_path, target_path, layer_idx, num_steps, seed, save_video,
         optimize_noise, outdir):
    """Project a target image into the latent space of a snapshot."""
    from ..utils.platform import select_platform
    select_platform()
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from ..metrics.features import RandomFeatures
    from ..ops.composite import alpha_composite
    from ..utils.checkpoint import load_ema_snapshot
    from ..utils.image_utils import normalize_zero1

    os.makedirs(outdir, exist_ok=True)
    cfg, ens, tree = load_ema_snapshot(network_path)
    res = cfg.base_resolution

    img = Image.open(target_path).convert('RGBA').resize((res, res),
                                                         Image.LANCZOS)
    target01 = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]

    # w statistics from 10k mapping samples (reference: projector.py:50-55)
    print('Computing W statistics...')
    z = jax.random.normal(jax.random.PRNGKey(seed), (10000, cfg.z_dim))
    ws_samples = ens.mapping.apply(tree['mapping'], z)
    w_avg = jnp.mean(ws_samples, axis=0, keepdims=True)
    w_std = float(jnp.sqrt(jnp.mean(jnp.square(ws_samples - w_avg))))

    # perceptual distance: VGG16-LPIPS when converted weights are available
    # (the reference's detector, projector.py:61-63); else the deterministic
    # random-feature fallback
    from ..metrics.features import build_extractor
    extractor = build_extractor('auto_lpips')
    if isinstance(extractor, RandomFeatures):
        extractor = RandomFeatures(seed=1)
    use_lpips = extractor.name == 'vgg16_lpips'

    # trainable per-layer noise buffers (reference: projector.py:56-59 —
    # noise_bufs are randn-reinitialized and co-optimized with w)
    noise_init = tuple(gv.get('noise') for gv in tree['local_g'])
    if optimize_noise:
        key_n = jax.random.PRNGKey(seed + 7)
        noise_init = jax.tree_util.tree_map(
            lambda n: jax.random.normal(
                jax.random.fold_in(key_n, n.size), n.shape), noise_init)

    def render(ws, noise_trees=None):
        if noise_trees is not None:
            g_vars = tuple({**gv, 'noise': nt} if nt else gv
                           for gv, nt in zip(tree['local_g'], noise_trees))
            vtree = {**tree, 'local_g': g_vars}
        else:
            vtree = tree
        stack = ens.synthesize_layers(vtree, ws, noise_mode='const')
        if ens.stn is not None and layer_idx is None:
            stack, _ = ens.stn.apply(tree['stn'], stack)
        if layer_idx is not None:
            comp = normalize_zero1(jnp.clip(stack[:, layer_idx], -1, 1))
        else:
            comp = alpha_composite(normalize_zero1(jnp.clip(stack, -1, 1)))
        return comp  # [B, H, W, 4] in [0, 1]

    # target features are loop-invariant: compute once, not per step
    # (the reference also extracts target_features once, projector.py:64-68)
    target_features = extractor(target01[..., :3] * 255.0)

    def distance(a01, b01_features, b01):
        fa = extractor(a01[..., :3] * 255.0)
        if use_lpips:
            # squared-L2 of LPIPS features = LPIPS distance
            # (reference: projector.py:98-104)
            return jnp.sum(jnp.square(fa - b01_features))
        # fallback: multi-scale pixel + random-feature distance
        d = jnp.mean(jnp.square(a01 - b01))
        return d + jnp.mean(jnp.square(fa - b01_features)) * 1e-4

    # schedule constants (reference: projector.py:28-35,82-89)
    initial_lr = 0.1
    initial_noise_factor = 0.05
    lr_rampdown_length = 0.25
    lr_rampup_length = 0.05
    noise_ramp_length = 0.75

    regularize_noise_weight = 1e5  # (reference: projector.py:35)

    def noise_reg(noise_trees):
        """Multi-scale autocorrelation penalty on each noise buffer
        (reference: projector.py:106-114)."""
        reg = 0.0
        for leaf in jax.tree_util.tree_leaves(noise_trees):
            n = leaf[None, :, :, None]  # [1, H, W, 1]
            while True:
                reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=2)) ** 2
                reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=1)) ** 2
                if min(n.shape[1], n.shape[2]) <= 8:
                    break
                n = jax.lax.reduce_window(
                    n, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                    'VALID') / 4.0
        return reg

    def normalize_noise(noise_trees):
        """Zero-mean/unit-std renormalization after each step
        (reference: projector.py:127-131)."""
        return jax.tree_util.tree_map(
            lambda n: (n - jnp.mean(n)) / (jnp.std(n) + 1e-8), noise_trees)

    tx = optax.adam(initial_lr, b1=0.9, b2=0.999)
    params = {'w': jnp.zeros_like(w_avg) + w_avg}
    if optimize_noise:
        params['noise'] = noise_init
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, t, key):
        w_noise_scale = (w_std * initial_noise_factor
                         * jnp.maximum(0.0, 1.0 - t / noise_ramp_length) ** 2)
        lr_ramp = jnp.minimum(1.0, (1.0 - t) / lr_rampdown_length)
        lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * jnp.pi)
        lr_ramp = lr_ramp * jnp.minimum(1.0, t / lr_rampup_length)
        lr = initial_lr * lr_ramp

        def loss_fn(p):
            w_in = p['w'] + jax.random.normal(key, p['w'].shape) * w_noise_scale
            out01 = render(w_in, p.get('noise'))
            d = distance(out01, target_features, target01)
            if 'noise' in p:
                d = d + noise_reg(p['noise']) * regularize_noise_weight
            return d

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        # emulate per-step lr by scaling the update (optax adam used lr=0.1)
        updates = jax.tree_util.tree_map(lambda u: u * (lr / initial_lr),
                                         updates)
        params = optax.apply_updates(params, updates)
        if 'noise' in params:
            params['noise'] = normalize_noise(params['noise'])
        return params, opt_state, loss

    print(f'Projecting for {num_steps} steps...')
    frames = []
    for i in range(num_steps):
        t = i / num_steps
        params, opt_state, loss = step(params, opt_state, t,
                                       jax.random.fold_in(
                                           jax.random.PRNGKey(seed + 1), i))
        if (i + 1) % 100 == 0:
            print(f'step {i + 1:4d}/{num_steps}: dist {float(loss):.4f}')
        if save_video and i % 10 == 0:
            frames.append(np.asarray(
                render(params['w'], params.get('noise'))[0]))

    w_opt = params['w']
    out01 = np.asarray(render(w_opt, params.get('noise'))[0])
    Image.fromarray((np.clip(out01, 0, 1) * 255).astype(np.uint8),
                    'RGBA').save(os.path.join(outdir, 'proj.png'))
    img.save(os.path.join(outdir, 'target.png'))
    np.savez(os.path.join(outdir, 'projected_w.npz'),
             w=np.asarray(w_opt))
    if save_video and frames:
        # Animated progress video — the reference writes target|synth mp4
        # (projector.py:191-199); no ffmpeg backend exists offline, so write
        # an animated GIF (PIL native) with the same side-by-side layout.
        def _rgb_over_white(im01):
            rgb, a = im01[..., :3], im01[..., 3:4]
            return np.clip(rgb * a + (1.0 - a), 0, 1)

        tgt = _rgb_over_white(np.asarray(target01[0]))
        pil_frames = [
            Image.fromarray((np.concatenate(
                [tgt, _rgb_over_white(np.clip(fr, 0, 1))], axis=1)
                * 255).astype(np.uint8), 'RGB')
            for fr in frames]
        pil_frames[0].save(os.path.join(outdir, 'proj.gif'), save_all=True,
                           append_images=pil_frames[1:], duration=100, loop=0)
        print(f'Saved optimization progress video {outdir}/proj.gif')
    print('Done.')


if __name__ == '__main__':
    main()
