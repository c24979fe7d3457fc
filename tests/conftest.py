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

# Persistent XLA:CPU compilation cache for the suite: interpret-mode Pallas
# golden renders dominate the suite's runtime and their compiles are the
# cost (not execution). Host-local dir (never committed) keyed by the CPU
# feature fingerprint: AOT artifacts embed host features and must not
# travel between machines (SIGILL risk — core/platform.host_fingerprint).
from vkr_tpu.core.platform import host_fingerprint

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/vkr_jax_cache_cpu" + host_fingerprint())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


# ---- slow-test opt-in (default run stays under the ~15-min bar) ----
# The multi-minute tail is a handful of FULL-frame interpret-mode
# renders (band-sharded frames, the textured golden, probe-GI frame).
# They are marked @pytest.mark.slow and SKIPPED by default; run the
# whole suite with:  python -m pytest tests/ --runslow
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute full-frame "
             "interpret renders)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute full-frame interpret render; "
        "excluded unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
