"""Backend selection helper.

The session environment force-registers the axon TPU plugin and overrides
JAX_PLATFORMS at import time; jax.config.update('jax_platforms', ...) after
import is the reliable switch. Call ensure_platform() before any jax use.
"""

from __future__ import annotations

import os


def ensure_platform(platform: str | None = None) -> str:
    """Pin the jax backend. Resolution order: explicit arg >
    VKR_PLATFORM env > JAX_PLATFORMS env > leave as-is."""
    import jax

    want = platform or os.environ.get("VKR_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if want:
        jax.config.update("jax_platforms", want)
    return jax.default_backend()
