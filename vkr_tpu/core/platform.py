"""Backend selection helper.

The session environment force-registers the axon TPU plugin and overrides
JAX_PLATFORMS at import time; jax.config.update('jax_platforms', ...) after
import is the reliable switch. Call ensure_platform() before any jax use.
"""

from __future__ import annotations

import os


def host_fingerprint() -> str:
    """Short digest of this host's CPU feature set. XLA:CPU AOT cache
    entries embed machine features; loading them on a different host
    warns 'could lead to execution errors such as SIGILL' (observed:
    /tmp survived a VM migration and served another machine's
    avx512-tuned blobs). Keying the cache dir by this digest makes a
    host change start a FRESH cache instead of loading incompatible
    code."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
            else:
                feats = ""
    except OSError:
        import platform as _p

        feats = _p.processor() + _p.machine()
    return "_" + hashlib.sha1(feats.encode()).hexdigest()[:8]


def ensure_platform(platform: str | None = None) -> str:
    """Pin the jax backend. Resolution order: explicit arg >
    VKR_PLATFORM env > JAX_PLATFORMS env > leave as-is."""
    import jax

    want = platform or os.environ.get("VKR_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if want:
        jax.config.update("jax_platforms", want)

    # Persistent compilation cache. TPU compiles go through a remote tunnel
    # here (~minutes for the full frame graph); cache hits make re-runs
    # fast — repo-local dir, safe to commit alongside. XLA:CPU AOT
    # artifacts embed host machine features and can SIGILL when loaded on
    # a different host, so CPU gets a HOST-LOCAL /tmp dir instead (never
    # committed): interpret-mode Pallas compiles dominate CPU wall-clock
    # (the round-3 dryrun_multichip rc=124 timeout was exactly this).
    if jax.default_backend() != "cpu":
        cache_dir = os.environ.get("VKR_JAX_CACHE",
                                   "/root/repo/.jax_cache")
    else:
        cache_dir = os.environ.get("VKR_JAX_CACHE_CPU",
                                   "/tmp/vkr_jax_cache_cpu"
                                   + host_fingerprint())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:
        pass
    return jax.default_backend()
