"""check-weights — metric-detector weights doctor.

The reference downloads its FID/LPIPS feature detectors at runtime
(reference: metrics/metric_utils.py:46-57, pointing at
``inception-2015-12-05.pt`` / ``vgg16.pt`` — frechet_inception_distance.py:23,
perceptual_path_length.py:44-47).  This framework runs in offline
environments, so the weights are supplied as converted ``.npz`` files
instead.  This command prints exactly what is present, what is missing, and
the one-liners that fix it — so absolute FID/KID/IS/PPL parity is two file
drops away with zero code reading (GAPS.md "Absolute FID/KID weights").

Exit code: 0 when every detector is available, 1 otherwise (script-friendly).
"""

from __future__ import annotations

import os
import sys

import click

from ..utils.platform import select_platform

_SPECS = [
    dict(
        key='inception',
        env='MGT_INCEPTION_WEIGHTS',
        used_for='FID / KID / IS (absolute values)',
        upstream=('pytorch-fid "pt_inception-2015-12-05-6726825d.pth" or a '
                  'torchvision inception_v3 checkpoint (same layout); the '
                  'reference\'s own download is '
                  'https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/'
                  'pretrained/metrics/inception-2015-12-05.pt'),
        convert=('python -m montage_gan_tpu.utils.convert_inception '
                 'pt_inception-2015-12-05-6726825d.pth inception.npz'),
        export='export MGT_INCEPTION_WEIGHTS=$PWD/inception.npz',
    ),
    dict(
        key='vgg16',
        env='MGT_VGG16_WEIGHTS',
        used_for='PPL and the projector (LPIPS perceptual distance)',
        upstream=('torchvision vgg16 checkpoint (+ optional LPIPS "lin" '
                  'head); the reference\'s own download is '
                  'https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/'
                  'pretrained/metrics/vgg16.pt'),
        convert=('python -m montage_gan_tpu.utils.convert_vgg16 '
                 'vgg16.pth vgg16.npz'),
        export='export MGT_VGG16_WEIGHTS=$PWD/vgg16.npz',
    ),
]


def _check_one(spec, smoke: bool):
    """Returns (ok, lines)."""
    lines = []
    path = os.environ.get(spec['env'])
    lines.append(f"[{spec['key']}] {spec['env']} — {spec['used_for']}")
    if not path:
        lines.append(f"  MISSING: {spec['env']} is not set.")
        lines.append(f"  1. obtain weights: {spec['upstream']}")
        lines.append(f"  2. convert:        {spec['convert']}")
        lines.append(f"  3. point at them:  {spec['export']}")
        return False, lines
    if not os.path.exists(path):
        lines.append(f"  MISSING: {spec['env']}={path} does not exist.")
        lines.append(f"  convert: {spec['convert']}")
        return False, lines
    lines.append(f"  found: {path} "
                 f"({os.path.getsize(path) / 1e6:.1f} MB)")
    try:
        if spec['key'] == 'inception':
            from ..metrics import inception_net
            params = inception_net.load_params(path)
        else:
            from ..metrics import vgg16_net
            params = vgg16_net.load_params(path)
        import jax
        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
        lines.append(f"  loads: OK ({n / 1e6:.1f}M parameters)")
    except Exception as e:  # corrupt / wrong-layout file: report, don't die
        lines.append(f"  BROKEN: loading failed — {e}")
        lines.append(f"  re-convert: {spec['convert']}")
        return False, lines
    if smoke:
        import numpy as np
        from ..metrics.features import InceptionV3Features, VGG16Features
        cls = InceptionV3Features if spec['key'] == 'inception' \
            else VGG16Features
        feats = cls(path)(np.zeros((1, 64, 64, 3), np.float32))
        lines.append(f"  forward: OK (feature shape {tuple(feats.shape)})")
    return True, lines


@click.command(name='check-weights')
@click.option('--smoke', is_flag=True,
              help='Also run one image through each detector (compiles).')
def main(smoke):
    """Report which metric-detector weights are available and how to supply
    the missing ones (absolute FID/KID/IS/PPL need them; without them the
    deterministic random-feature extractor gives relative metrics only)."""
    select_platform()
    all_ok = True
    for spec in _SPECS:
        ok, lines = _check_one(spec, smoke)
        all_ok &= ok
        click.echo('\n'.join(lines))
        click.echo()
    if all_ok:
        click.echo('All detector weights available — metrics report '
                   'ABSOLUTE values (reference-comparable).')
    else:
        click.echo('Some detector weights missing — FID/KID/IS/PPL fall '
                   'back to the deterministic random-feature extractor '
                   '(RELATIVE metrics only: valid for comparing checkpoints '
                   'of the same run, not against published numbers).')
        sys.exit(1)


if __name__ == '__main__':
    main()
