"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (the driver separately dry-runs the
multi-chip path the same way — see __graft_entry__.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env sets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin overrides JAX_PLATFORMS at import; config.update wins.
import jax

jax.config.update("jax_platforms", "cpu")
