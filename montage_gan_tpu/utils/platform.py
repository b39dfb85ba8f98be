"""Backend/platform selection helper.

Some deployment images pre-register an accelerator PJRT plugin via
sitecustomize and pin JAX_PLATFORMS at interpreter startup, which makes
plain env vars ineffective.  ``select_platform`` gives CLIs and tests a
reliable switch: it must be called before the first device query.

Honors the MGT_PLATFORM environment variable ('cpu' | 'tpu' | 'axon' | ...);
an explicit argument wins.
"""

from __future__ import annotations

import os
from typing import Optional


def select_platform(name: Optional[str] = None) -> None:
    import jax
    name = name or os.environ.get("MGT_PLATFORM")
    if name:
        jax.config.update("jax_platforms", name)
    # Optional persistent compile cache (opt-in via MGT_COMPILE_CACHE).
    # NOT enabled by default: under remote-compile relays (e.g. axon's
    # PALLAS_AXON_REMOTE_COMPILE) CPU artifacts may be compiled on a machine
    # with different CPU features, and loading them back SIGILLs the host.
    cache = os.environ.get("MGT_COMPILE_CACHE")
    if cache and cache != "off":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
