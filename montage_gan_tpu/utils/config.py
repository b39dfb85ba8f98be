"""Configuration utilities: attribute-dict container and string-keyed DI.

Capability parity with the reference's dnnlib.EasyDict / construct_class_by_name
(reference: dnnlib/util.py:40-53, 225-292), which the whole framework uses as its
plugin mechanism — every network/dataset/optimizer/loss is built from a
``class_name``-keyed kwargs dict.
"""

from __future__ import annotations

import importlib
import types
from typing import Any, Tuple


class EasyDict(dict):
    """dict with attribute access. Universal config container."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]


def _split_module_and_obj(name: str) -> Tuple[types.ModuleType, str]:
    """Resolve 'pkg.mod.Obj' (or 'pkg.mod.Obj.attr') to (module, obj_path)."""
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:i])
        try:
            module = importlib.import_module(module_name)
            return module, ".".join(parts[i:])
        except ImportError:
            continue
    raise ImportError(f"Cannot resolve module for '{name}'")


def get_obj_by_name(name: str) -> Any:
    module, obj_path = _split_module_and_obj(name)
    obj = module
    for attr in obj_path.split("."):
        obj = getattr(obj, attr)
    return obj


def construct_class_by_name(*args: Any, class_name: str, **kwargs: Any) -> Any:
    """Instantiate ``class_name`` with the given args/kwargs."""
    return get_obj_by_name(class_name)(*args, **kwargs)


def call_func_by_name(*args: Any, func_name: str, **kwargs: Any) -> Any:
    return get_obj_by_name(func_name)(*args, **kwargs)
