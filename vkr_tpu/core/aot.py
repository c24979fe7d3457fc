"""AOT trace cache: skip per-process Python tracing of the frame graph.

The reference cold-starts in seconds (main.cpp:225-309 — pipelines come
from a Vulkan pipeline cache); the rebuild's warm start was dominated by
RE-TRACING the frame function every process (measured round 5,
BENCH_STARTUP_PROFILE: trace+lower is first-order even when the XLA
compile hits the persistent .jax_cache). jax.export serializes the
traced+lowered module once; later processes deserialize it (no tracing)
and the XLA compile of the embedded module hits the persistent cache.

Artifacts are keyed on (package source digest, jax version, backend,
callsite name, abstract arg signature) — ANY source edit anywhere in the
package invalidates conservatively.
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

_PKG_DIGEST = None


def _package_digest() -> str:
    """Digest of every .py source in the vkr_tpu package (cached)."""
    global _PKG_DIGEST
    if _PKG_DIGEST is None:
        root = Path(__file__).resolve().parent.parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
        _PKG_DIGEST = h.hexdigest()[:16]
    return _PKG_DIGEST


def _signature(name: str, args, extra_key: str = "") -> str:
    import jax

    h = hashlib.sha256()
    h.update(_package_digest().encode())
    h.update(jax.__version__.encode())
    h.update(jax.default_backend().encode())
    h.update(name.encode())
    h.update(extra_key.encode())
    for leaf in jax.tree_util.tree_leaves(args):
        h.update(str(jax.api_util.shaped_abstractify(leaf)).encode())
    h.update(str(jax.tree_util.tree_structure(args)).encode())
    return h.hexdigest()[:24]


_REGISTERED = False


def _register_serializations():
    """Register the package's NamedTuple pytree nodes with jax.export
    (serialized artifacts must name every custom node type)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as _export

    from vkr_tpu.core.framestate import FrameState
    from vkr_tpu.frame import CameraFrame, SSRResources, Tuning
    from vkr_tpu.passes.gbuffer import GBuffer, SceneDevice
    from vkr_tpu.raster.texture import TextureArray

    for cls in (CameraFrame, SSRResources, Tuning, GBuffer,
                SceneDevice):
        try:
            _export.register_namedtuple_serialization(
                cls, serialized_name=f"vkr_tpu.{cls.__name__}")
        except ValueError as e:
            if "already registered" not in str(e):
                raise

    import json

    def _reg_node(cls, ser, des):
        try:
            _export.register_pytree_node_serialization(
                cls, serialized_name=f"vkr_tpu.{cls.__name__}",
                serialize_auxdata=ser, deserialize_auxdata=des)
        except ValueError as e:
            if "already registered" not in str(e):
                raise

    # FrameState: custom pytree class, auxdata None
    _reg_node(FrameState, lambda aux: b"", lambda b: None)

    def _ser(aux):  # TextureArray auxdata: nested tuples of ints/None
        return json.dumps(aux).encode()

    def _des(b):
        offsets, sizes, flat_len, uniform_wrap, n_levels = json.loads(b)
        return (tuple(offsets), tuple(sizes), flat_len, uniform_wrap,
                n_levels)

    _reg_node(TextureArray, _ser, _des)
    _REGISTERED = True


def cached_jit(name: str, fn, example_args, *, donate_argnums=(),
               cache_dir: str | None = None, verbose: bool = False,
               extra_key: str = ""):
    """extra_key: any closed-over configuration that shapes the trace
    (e.g. repr of the RenderConfig) — it must be part of the artifact
    key since the abstract arg signature can't see closures."""
    return _cached_jit_impl(name, fn, example_args,
                            donate_argnums=donate_argnums,
                            cache_dir=cache_dir, verbose=verbose,
                            extra_key=extra_key)


def _cached_jit_impl(name: str, fn, example_args, *, donate_argnums,
                     cache_dir, verbose, extra_key):
    """Return a compiled-callable for fn(*example_args)-shaped inputs.

    Cache hit: deserialize the exported module (no Python tracing) and
    jit its .call (compile hits the persistent XLA cache). Miss: trace +
    export + serialize for next time. Falls back to plain jax.jit if
    export or deserialization fails (version drift, unsupported backend).
    Set VKR_AOT=0 to disable.
    """
    import jax

    if os.environ.get("VKR_AOT", "1") != "1":
        return jax.jit(fn, donate_argnums=donate_argnums)

    from jax import export as _export

    _register_serializations()

    if cache_dir is None:  # repo-local, beside the other content caches
        cache_dir = str(
            Path(__file__).resolve().parents[2] / ".vkr_cache" / "aot")
    sig = _signature(name, example_args, extra_key)
    path = Path(cache_dir) / f"{name}-{sig}.bin"
    if path.exists():
        try:
            exp = _export.deserialize(path.read_bytes())
            if verbose:
                print(f"aot: loaded {path.name}", file=sys.stderr, flush=True)
            return jax.jit(exp.call, donate_argnums=donate_argnums)
        except Exception as e:  # stale/incompatible blob: re-export
            if verbose:
                print(f"aot: reload failed ({e}); re-exporting",
                      file=sys.stderr, flush=True)
    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    try:
        exp = _export.export(jitted)(*example_args)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(exp.serialize())
        os.replace(tmp, path)
        if verbose:
            print(f"aot: exported {path.name} "
                  f"({path.stat().st_size/1e6:.1f} MB)", file=sys.stderr, flush=True)
        # Serve THIS process from the export too: its lowered module is
        # byte-stable across processes, so the persistent-cache entry
        # compiled now is the one later runs will hit.
        return jax.jit(exp.call, donate_argnums=donate_argnums)
    except Exception as e:
        if verbose:
            print(f"aot: export failed ({e}); plain jit", file=sys.stderr, flush=True)
        return jitted
