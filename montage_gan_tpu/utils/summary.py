"""Module parameter summaries (reference contract:
torch_utils/misc.py:206-277 print_module_summary — here computed from the
variables pytree instead of forward hooks)."""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def count_tree(tree: Any) -> Tuple[int, int]:
    """(num_arrays, num_elements) of a pytree."""
    leaves = jax.tree_util.tree_leaves(tree)
    return len(leaves), int(sum(np.prod(l.shape) for l in leaves))


def ensemble_summary(variables: Dict[str, Any],
                     layer_names=None) -> str:
    rows: List[Tuple[str, int, int]] = []

    def add(name, tree):
        if tree is None:
            return
        params = tree.get('params', tree) if isinstance(tree, dict) else tree
        n, e = count_tree(params)
        buffers = 0
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k != 'params':
                    buffers += count_tree(v)[1]
        rows.append((name, e, buffers))

    add('mapping', variables.get('mapping'))
    for i, g in enumerate(variables.get('local_g', ())):
        name = (layer_names[i] if layer_names else f'layer{i}')
        add(f'local_G[{name}]', g)
    for i, d in enumerate(variables.get('local_d', ())):
        name = (layer_names[i] if layer_names else f'layer{i}')
        add(f'local_D[{name}]', d)
    add('stn', variables.get('stn'))
    add('global_D', variables.get('global_d'))
    add('renderer', variables.get('renderer'))

    width = max(len(r[0]) for r in rows) + 2
    lines = [f"{'Module':<{width}}{'Parameters':>14}{'Buffers':>12}"]
    lines.append('-' * (width + 26))
    total_p = total_b = 0
    for name, p, b in rows:
        lines.append(f"{name:<{width}}{p:>14,}{b:>12,}")
        total_p += p
        total_b += b
    lines.append('-' * (width + 26))
    lines.append(f"{'Total':<{width}}{total_p:>14,}{total_b:>12,}")
    return '\n'.join(lines)
