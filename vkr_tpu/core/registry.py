"""Kernel registry — the analog of the reference's shader manifest.

The reference declares its 33 shader programs by name in
src/shaders/config.json and loads them at startup (main.cpp:178-215). Here
kernels are Python callables, but the named registry is kept (SURVEY.md §7
design table) for discoverability, the dev re-jit loop (the hot-reload
analog, SURVEY.md §5.3) and parity checks in tests.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_REGISTRY: Dict[str, Callable] = {}


def register(name: str) -> Callable[[Callable], Callable]:
    """Decorator: register a kernel/pass entry point under a program name
    mirroring the reference's config.json names (e.g. 'gtao_main',
    'sssr_trace', 'taa_resolve', 'defered_shading')."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = fn
        return fn

    return deco


def get(name: str) -> Callable:
    return _REGISTRY[name]


def names() -> List[str]:
    return sorted(_REGISTRY)


def clear_jit_caches() -> None:
    """The hot-reload analog (reference: key R -> gpu::reload_shaders(),
    main.cpp:319-321): drop every registered function's jit cache so edited
    kernel code takes effect without restarting the host process."""
    for fn in _REGISTRY.values():
        clear = getattr(fn, "clear_cache", None)
        if clear is not None:
            clear()
