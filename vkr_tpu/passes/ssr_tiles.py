"""SSR tile classification + per-tile plane regression.

Reference: shaders/advanced_ssr/{classification,regression,trace_indirect}
.comp (+ numpy prototype pyscript/debug_regression.py) — the indirect-
dispatch tile path that the reference constructs but leaves disabled in
AdvancedSSR::run (advanced_ssr.cpp:540-554). TPU-native mapping (SURVEY.md
§7 hard part 6): the atomic-append tile lists become a dense tile-class
mask plus compacted index lists; "dispatch indirect" becomes dense masked
execution over the tile grid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vkr_tpu.mathlib.projection import reconstruct_view_vec

from vkr_tpu.core.registry import register

TILE = 8  # classification.comp TILE_SIZE


class TileClassification(NamedTuple):
    """classification.comp output: mirror-vs-glossy tile partition."""

    avg_roughness: jnp.ndarray     # (tiles_y, tiles_x) f32
    is_reflective: jnp.ndarray     # (tiles_y, tiles_x) bool
    reflective_tiles: jnp.ndarray  # (n_tiles,) i32 packed ids (pad -1)
    reflective_count: jnp.ndarray  # () i32
    glossy_tiles: jnp.ndarray      # (n_tiles,) i32 packed ids (pad -1)
    glossy_count: jnp.ndarray      # () i32


@register("sssr_classification")
def classify_tiles(material_full, max_roughness: float,
                   glossy_value: float) -> TileClassification:
    """Per-8x8-tile roughness vote (classification.comp): tiles whose mean
    biased roughness < glossy_value go to the reflective (mirror) list."""
    h, w = material_full.shape[:2]
    ty, tx = h // TILE, w // TILE
    rough = material_full[: ty * TILE, : tx * TILE, 1] * max_roughness
    avg = rough.reshape(ty, TILE, tx, TILE).mean(axis=(1, 3))
    is_refl = avg < glossy_value

    n_tiles = ty * tx
    ids = jnp.arange(n_tiles, dtype=jnp.int32)
    flat = is_refl.reshape(-1)
    # compact both partitions: stable sort by class puts members first
    refl_order = jnp.argsort(~flat)   # reflective (True -> ~=False) first
    glossy_order = jnp.argsort(flat)  # glossy first
    refl_count = flat.sum().astype(jnp.int32)
    glossy_count = (n_tiles - refl_count).astype(jnp.int32)
    slot = jnp.arange(n_tiles, dtype=jnp.int32)
    refl_tiles = jnp.where(slot < refl_count, ids[refl_order], -1)
    glossy_tiles = jnp.where(slot < glossy_count, ids[glossy_order], -1)
    return TileClassification(
        avg_roughness=avg,
        is_reflective=is_refl,
        reflective_tiles=refl_tiles,
        reflective_count=refl_count,
        glossy_tiles=glossy_tiles,
        glossy_count=glossy_count,
    )


@register("tile_regression")
def tile_plane_regression(depth, camera_to_world, fovy, aspect, znear,
                          zfar):
    """Per-8x8-tile least-squares plane fit (regression.comp): solve the
    3x3 normal equations for plane p with dot(p, x_i) = 1 over the tile's
    camera-relative world points; returns (tiles_y, tiles_x, 4) =
    (plane xyz, mean squared error).

    The shared-memory parallel reduction becomes a reshape-reduce; the
    3x3 inverse is closed-form adjugate (prototyped against numpy in the
    reference's pyscript/debug_regression.py)."""
    h, w = depth.shape
    ty, tx = h // TILE, w // TILE
    # NOTE: regression.comp uses uv = pixel/size (no half-texel)
    xs = jnp.arange(w, dtype=jnp.float32) / w
    ys = jnp.arange(h, dtype=jnp.float32) / h
    uv = jnp.stack(jnp.meshgrid(xs, ys), axis=-1)
    view_vec = reconstruct_view_vec(uv, depth, fovy, aspect, znear, zfar)
    m = jnp.asarray(camera_to_world)
    pts = view_vec @ m[:3, :3].T  # world_vec - world_origin

    p = pts[: ty * TILE, : tx * TILE].reshape(ty, TILE, tx, TILE, 3)

    def tsum(a):
        return a.sum(axis=(1, 3))

    s = tsum(p)                       # sum x_i
    sq = tsum(p * p)                  # sum x^2, y^2, z^2
    xy = tsum(p[..., 0:1] * p[..., 1:2])[..., 0]
    xz = tsum(p[..., 0:1] * p[..., 2:3])[..., 0]
    yz = tsum(p[..., 1:2] * p[..., 2:3])[..., 0]

    a11, a22, a33 = sq[..., 0], sq[..., 1], sq[..., 2]
    a12, a13, a23 = xy, xz, yz
    # closed-form inverse of the symmetric 3x3
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    det = a11 * c11 + a12 * c12 + a13 * c13
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

    bx, by, bz = s[..., 0], s[..., 1], s[..., 2]
    plane = jnp.stack(
        [
            (c11 * bx + c12 * by + c13 * bz) * inv_det,
            (c12 * bx + c22 * by + c23 * bz) * inv_det,
            (c13 * bx + c23 * by + c33 * bz) * inv_det,
        ],
        axis=-1,
    )  # (ty, tx, 3)

    err = jnp.einsum("yxc,yaxbc->yaxb",
                     plane, p) - 1.0
    err = err * err
    err = jnp.where(jnp.isnan(err), 1e10, err)
    mse = err.mean(axis=(1, 3))
    return jnp.concatenate([plane, mse[..., None]], axis=-1)


def trace_indirect_mask(classification: TileClassification, height: int,
                        width: int):
    """The dispatch_indirect analog: a per-pixel mask of the reflective
    (mirror) tiles, for dense masked execution of the mirror-ray variant
    (trace_indirect.comp consumes the tile list; on TPU the cheap form is
    running the trace masked to these pixels)."""
    m = classification.is_reflective
    return jnp.repeat(jnp.repeat(m, TILE, axis=0), TILE, axis=1)[
        :height, :width
    ]
