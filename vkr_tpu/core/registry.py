"""Kernel registry + hot reload — the analog of the reference's shader
manifest and shader hot-reload.

The reference declares its 36 shader programs by name in
src/shaders/config.json, loads them at startup (main.cpp:178-215), and
rebuilds every pipeline when `R` is pressed (gpu::reload_shaders,
main.cpp:319-321, shader_program.cpp:349-360). Here "programs" are pass
entry-point functions; the registry stores (module, qualname) rather than
the function object, so `get()` always resolves against the LIVE module —
after `importlib.reload(<edited pass module>)` the next frame trace picks
up the new code. The frame graph (frame.py) builds every pass through
`get()`, making this load-bearing, not decorative.

Hot reload = `reload()`: re-import the registered pass modules and drop
the jit caches of every tracked frame-level jit (track with `track_jit`).
"""

from __future__ import annotations

import importlib
import sys
from typing import Callable, Dict, List, Optional, Tuple

# program name -> (module name, qualified attribute name)
_REGISTRY: Dict[str, Tuple[str, str]] = {}
# frame-level jitted callables whose caches must drop on reload
_TRACKED_JITS: List[Callable] = []


def register(name: str) -> Callable[[Callable], Callable]:
    """Decorator: register a pass/kernel entry point under a program name
    mirroring the reference's config.json (e.g. 'gtao_main', 'sssr_trace',
    'taa_resolve', 'defered_shading')."""

    def deco(fn: Callable) -> Callable:
        _REGISTRY[name] = (fn.__module__, fn.__qualname__)
        return fn

    return deco


def get(name: str) -> Callable:
    """Resolve a program name against the live module (so a reloaded
    module's new definition wins)."""
    mod_name, qualname = _REGISTRY[name]
    mod = sys.modules.get(mod_name)
    if mod is None:
        mod = importlib.import_module(mod_name)
    obj = mod
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


def names() -> List[str]:
    return sorted(_REGISTRY)


def track_jit(jitted: Callable) -> Callable:
    """Track a frame-level jitted callable so reload()/clear_jit_caches()
    can invalidate it (the pipeline-rebuild half of the reference's
    reload_shaders, pipelines.cpp:49-60)."""
    _TRACKED_JITS.append(jitted)
    return jitted


def clear_jit_caches() -> None:
    """Drop the cache of every tracked jit (and of any registered function
    that is itself a jit wrapper)."""
    for fn in _TRACKED_JITS:
        clear = getattr(fn, "clear_cache", None)
        if clear is not None:
            clear()
    for name in _REGISTRY:
        clear = getattr(get(name), "clear_cache", None)
        if clear is not None:
            clear()


def reload(only_module: Optional[str] = None) -> List[str]:
    """Hot reload (reference: key R -> gpu::reload_shaders): re-import the
    registered pass modules (or just `only_module`) and invalidate tracked
    jit caches so edited kernel code takes effect without restarting the
    host process. Returns the module names reloaded."""
    mods = sorted(
        {m for (m, _) in _REGISTRY.values()}
        if only_module is None
        else {only_module}
    )
    for m in mods:
        if m in sys.modules:
            importlib.reload(sys.modules[m])
    clear_jit_caches()
    return mods
