"""Unified CLI: ``python -m montage_gan_tpu <command> ...``.

The reference scatters entry points across top-level scripts plus a canned
launcher (reference: main.py:27-58, train_aio.py, generate.py, ...); here
every tool is a subcommand of one group (each also remains runnable as
``python -m montage_gan_tpu.cli.<name>``).
"""

import click


@click.group()
def cli():
    """montage_gan_tpu — TPU-native MontageGAN framework."""


def _register():
    from .cli.calc_metrics import main as calc_metrics
    from .cli.check_weights import main as check_weights
    from .cli.compare_renderers import main as compare_renderers
    from .cli.convert_pickle import main as convert_pickle
    from .cli.dataset_tool import main as dataset_tool
    from .cli.export_model import main as export_model
    from .cli.export_torch import main as export_torch
    from .cli.generate import main as generate
    from .cli.pretrain_renderer import main as pretrain_renderer
    from .cli.pretrain_stn import main as pretrain_stn
    from .cli.projector import main as projector
    from .cli.run_recipe import main as run_recipe
    from .cli.style_mixing import main as style_mixing
    from .cli.train import main as train
    from .cli.train_aio import main as train_aio

    for name, cmd in [('train-aio', train_aio), ('train', train),
                      ('run-recipe', run_recipe),
                      ('generate', generate), ('projector', projector),
                      ('style-mixing', style_mixing),
                      ('calc-metrics', calc_metrics),
                      ('dataset-tool', dataset_tool),
                      ('export-model', export_model),
                      ('export-torch', export_torch),
                      ('pretrain-renderer', pretrain_renderer),
                      ('pretrain-stn', pretrain_stn),
                      ('compare-renderers', compare_renderers),
                      ('convert-pickle', convert_pickle),
                      ('check-weights', check_weights)]:
        cli.add_command(cmd, name=name)


_register()

if __name__ == '__main__':
    cli()
