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

import glob
import hashlib
import os
import re
import sys

import click

from ..utils.platform import select_platform

_SPECS = [
    dict(
        key='inception',
        env='MGT_INCEPTION_WEIGHTS',
        npz='inception.npz',
        used_for='FID / KID / IS (absolute values)',
        upstream=('pytorch-fid "pt_inception-2015-12-05-6726825d.pth" or a '
                  'torchvision inception_v3 checkpoint (same layout); the '
                  'reference\'s own download is '
                  'https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/'
                  'pretrained/metrics/inception-2015-12-05.pt'),
        official='pt_inception-2015-12-05-6726825d.pth',
        source_globs=('*inception*.pth', '*inception*.pt'),
        converter='montage_gan_tpu.utils.convert_inception',
    ),
    dict(
        key='vgg16',
        env='MGT_VGG16_WEIGHTS',
        npz='vgg16.npz',
        used_for='PPL and the projector (LPIPS perceptual distance)',
        upstream=('torchvision vgg16 checkpoint (+ optional LPIPS "lin" '
                  'head); the reference\'s own download is '
                  'https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/'
                  'pretrained/metrics/vgg16.pt'),
        official='vgg16-397923af.pth',
        source_globs=('vgg16*.pth', 'vgg16*.pt'),
        converter='montage_gan_tpu.utils.convert_vgg16',
    ),
]

# torch-hub checkpoint naming convention: the 8 hex chars before the
# extension are the sha256 prefix of the file itself — the offline
# integrity gate (the reference trusts its CDN URL instead,
# dnnlib/util.py open_url; offline the filename IS the manifest).
_HUB_SHA_RE = re.compile(r'-([0-9a-f]{8})\.pth?$')


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for chunk in iter(lambda: f.read(1 << 20), b''):
            h.update(chunk)
    return h.hexdigest()


def _scan_dropin_sources(spec, dropin):
    """Find torch source checkpoints for this detector in the drop-in dir
    and sha256-verify any that carry a filename-embedded digest.  Returns
    [(path, verdict)] with verdict in {'verified', 'CORRUPT', 'unverified'}.
    """
    seen, out = set(), []
    for pat in spec['source_globs']:
        for path in sorted(glob.glob(os.path.join(dropin, pat))):
            if path in seen or path.endswith('.npz'):
                continue
            seen.add(path)
            m = _HUB_SHA_RE.search(os.path.basename(path))
            if m is None:
                out.append((path, 'unverified'))
            elif _sha256(path).startswith(m.group(1)):
                out.append((path, 'verified'))
            else:
                out.append((path, 'CORRUPT'))
    return out


def _check_one(spec, smoke: bool, convert: bool):
    """Returns (ok, lines)."""
    from ..metrics.features import resolve_weights, weights_dropin_dir
    lines = []
    dropin = weights_dropin_dir()
    path = resolve_weights(spec['env'], spec['npz'])
    lines.append(f"[{spec['key']}] {spec['env']} — {spec['used_for']}")

    if not path or not os.path.exists(path):
        # no converted .npz yet — is a sha256-verifiable torch source
        # already dropped in?
        sources = _scan_dropin_sources(spec, dropin) if os.path.isdir(
            dropin) else []
        good = [p for p, v in sources if v != 'CORRUPT']
        for p, v in sources:
            mark = {'verified': 'sha256 VERIFIED (filename digest)',
                    'CORRUPT': 'sha256 MISMATCH vs filename digest — '
                               're-obtain this file',
                    'unverified': 'no filename digest to verify against'}[v]
            lines.append(f"  drop-in source: {p} — {mark}")
        dst = os.path.join(dropin, spec['npz'])
        if good and convert:
            src = good[0]
            lines.append(f"  converting {src} → {dst} ...")
            import importlib
            importlib.import_module(spec['converter']).main([src, dst])
            path = dst
        elif good:
            lines.append(f"  ready to convert — run:  python -m "
                         f"montage_gan_tpu check-weights --convert")
            lines.append(f"  (or: python -m {spec['converter']} "
                         f"{good[0]} {dst})")
            return False, lines
        else:
            env_p = os.environ.get(spec['env'])
            if env_p:
                lines.append(f"  MISSING: {spec['env']}={env_p} "
                             f"does not exist.")
            else:
                lines.append(f"  MISSING: {spec['env']} unset and no "
                             f"{spec['npz']} in the drop-in dir.")
            lines.append(f"  one-file handoff: copy {spec['official']} "
                         f"into {dropin}/")
            lines.append(f"    then run:  python -m montage_gan_tpu "
                         f"check-weights --convert")
            lines.append(f"  (manual route: python -m {spec['converter']} "
                         f"{spec['official']} {spec['npz']}; "
                         f"export {spec['env']}=$PWD/{spec['npz']})")
            lines.append(f"  obtain it: {spec['upstream']}")
            return False, lines
    if not os.path.exists(path):
        lines.append(f"  MISSING: {path} does not exist after conversion?")
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
        lines.append(f"  re-convert: python -m {spec['converter']} "
                     f"<source.pth> {spec['npz']}")
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
@click.option('--convert', is_flag=True,
              help='Convert any sha256-verified torch source found in the '
                   'drop-in dir to its .npz in place (the one-command '
                   'handoff to absolute FID).')
def main(smoke, convert):
    """Report which metric-detector weights are available and how to supply
    the missing ones (absolute FID/KID/IS/PPL need them; without them the
    deterministic random-feature extractor gives relative metrics only).

    Offline handoff: drop the official torch checkpoints into the drop-in
    directory (MGT_WEIGHTS_DIR, default ~/.cache/montage_gan_tpu/weights) —
    their sha256 is verified against the filename-embedded digest — then
    ``check-weights --convert`` writes the .npz next to them, which every
    metric picks up automatically."""
    select_platform()
    from ..metrics.features import weights_dropin_dir
    click.echo(f"weights drop-in dir: {weights_dropin_dir()}  "
               f"(override with MGT_WEIGHTS_DIR)")
    click.echo()
    all_ok = True
    for spec in _SPECS:
        ok, lines = _check_one(spec, smoke, convert)
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
