"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the analogue of the reference's single-process fallback testing story
(SURVEY.md §4): multi-device code paths are exercised without TPU hardware via
XLA's host-platform device splitting.
"""

import os
import sys

# NOTE: this environment pre-imports jax via sitecustomize (the axon TPU
# plugin), so plain env-var assignment here is too late for JAX_PLATFORMS —
# use jax.config.update below.  XLA_FLAGS is still read lazily at first
# backend initialization, so set it before any device query.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The upstream reference (read-only) doubles as the numerical oracle when
# present; tests that need it skip gracefully otherwise.
REFERENCE_PATH = "/root/reference/montage_gan"
HAS_REFERENCE = os.path.isdir(REFERENCE_PATH)
if HAS_REFERENCE and REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — this image's
# remote-compile relay can produce CPU artifacts for a different machine's
# feature set, and loading them back causes SIGILL/segfaults.

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))


def stub_torchvision():
    """Install a minimal torchvision stub so reference modules that import it
    at module scope (e.g. custom_utils.image_utils) can be loaded as oracles.
    Only the names used at import time are provided."""
    import types
    if 'torchvision' in sys.modules:
        return
    tv = types.ModuleType('torchvision')
    transforms = types.ModuleType('torchvision.transforms')
    utils = types.ModuleType('torchvision.utils')

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError('torchvision stub: not available')

    transforms.ToTensor = _Unavailable
    transforms.ToPILImage = _Unavailable
    utils.make_grid = _Unavailable
    utils.save_image = _Unavailable
    tv.transforms = transforms
    tv.utils = utils
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.transforms'] = transforms
    sys.modules['torchvision.utils'] = utils


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "reference: test needs the upstream reference repo as oracle")
    config.addinivalue_line(
        "markers", "quick: curated fast tier — `pytest -m quick` verifies the "
                   "core contracts in <2 min (ops parity subset, composite "
                   "oracle, sampler, config/CLI plumbing)")
    config.addinivalue_line(
        "markers", "slow: heavy-compile / e2e tests excluded from the quick "
                   "tier (full suite documents its wall time in README)")
    config.addinivalue_line(
        "markers", "mid: medium tier — `pytest -m 'quick or mid'` covers the "
                   "train-step semantics invariants (accumulation linearity, "
                   "w_avg sequencing, executor-vs-monolithic equality) at "
                   "micro configs inside a CI budget (<8 min)")


def pytest_collection_modifyitems(config, items):
    if HAS_REFERENCE:
        return
    skip = pytest.mark.skip(reason="reference repo not available")
    for item in items:
        if "reference" in item.keywords:
            item.add_marker(skip)
