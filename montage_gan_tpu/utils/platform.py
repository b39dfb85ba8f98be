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
