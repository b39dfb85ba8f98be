"""Canned training recipes — the reference's ``main.py`` launcher as a CLI.

The reference ships a top-level ``main.py`` whose commented-out blocks run
``train_aio.py`` with one canonical argument set (reference: main.py:7-16,
27-58): outdir/data + ``--mirror true --metrics none --kimg 5000
--target 0.6 --augpipe bgcfnc --net-snap 5 --cfg aio``, differing only in
``--resume`` / ``--metrics`` per routine.  Here each routine is a named
recipe of the ``run-recipe`` subcommand instead of a source edit.
"""

from __future__ import annotations

import click

# The canonical argument set (reference: main.py:7-16).
CANONICAL = {
    '--mirror': 'true',
    '--metrics': 'none',
    '--kimg': '5000',
    '--target': '0.6',
    '--augpipe': 'bgcfnc',
    '--net-snap': '5',
    '--cfg': 'aio',
}

# recipe → (needs_resume, extra flags) (reference: main.py:24-58)
RECIPES = {
    # step 1: joint pretraining from scratch (no resume)
    'step1': (False, {}),
    # step 2: resume from the step-1 snapshot
    'step2': (True, {}),
    # latent-interpolation sheet from a snapshot (the reference flips the
    # run_latent_interpolation/run_once config knobs,
    # custom/training_loop_aio.py:77-80)
    'interpolation': (True, {'--run-latent-interpolation': None,
                             '--run-once': None}),
    # metric evaluation of a snapshot (reference: main.py:50-58)
    'metrics': (True, {'--metrics': 'fid50k_full,is50k',
                       '--run-once': None}),
}


@click.command(context_settings=dict(ignore_unknown_options=True))
@click.argument('recipe', type=click.Choice(list(RECIPES)))
@click.option('--outdir', default='output', metavar='DIR')
@click.option('--data', required=True, metavar='DIR')
@click.option('--resume', default=None, metavar='PATH|ALIAS')
@click.option('--dry-run', is_flag=True, default=False)
@click.argument('overrides', nargs=-1, type=click.UNPROCESSED)
def main(recipe, outdir, data, resume, dry_run, overrides):
    """Run a canned train_aio recipe (reference main.py routine).

    Extra train_aio flags may be appended verbatim after the recipe name
    and override the canonical set, e.g.::

        run-recipe step1 --data data/global --kimg 100
    """
    needs_resume, extra = RECIPES[recipe]
    if needs_resume and not resume:
        raise click.UsageError(f'recipe {recipe!r} requires --resume '
                               '(reference main.py step-2 semantics)')

    flags = dict(CANONICAL)
    flags.update(extra)
    # overrides: alternating --flag [value] (a flag directly followed by
    # another --flag is boolean-style and carries no value)
    toks = list(overrides)
    i = 0
    while i < len(toks):
        tok = toks[i]
        if not tok.startswith('--'):
            raise click.UsageError(f'unexpected argument {tok!r}')
        if i + 1 < len(toks) and not toks[i + 1].startswith('--'):
            flags[tok] = toks[i + 1]
            i += 2
        else:
            flags[tok] = None
            i += 1

    argv = ['--outdir', outdir, '--data', data]
    if resume:
        argv += ['--resume', resume]
    for k, v in flags.items():
        argv.append(k)
        if v is not None:
            argv.append(str(v))
    if dry_run:
        argv.append('--dry-run')

    click.echo(f'run-recipe {recipe}: train-aio ' + ' '.join(argv))
    from .train_aio import main as train_aio_main
    train_aio_main.main(args=argv, standalone_mode=False)


if __name__ == '__main__':
    main()
