"""End-to-end raster pipeline: geometry in, visibility buffer out.

Ties together transform -> near clip -> setup -> binning -> Pallas raster.
The analog of the reference's per-frame G-buffer draw task
(scene_renderer.cpp:140-215) minus attribute output, which happens in the
deferred resolve (resolve.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from vkr_tpu.raster import kernel as _kernel
from vkr_tpu.raster import setup as _setup


class VisibilityBuffer(NamedTuple):
    depth: jnp.ndarray      # (H, W) f32 hardware depth, 1.0 = background
    tri_id: jnp.ndarray     # (H, W) i32 clipped-triangle id, -1 = background
    setup: _setup.TriangleSetup  # clipped-triangle raster setup (TC = 2T)
    weights: jnp.ndarray    # (TC, 3, 3) near-clip corner weights
    src: jnp.ndarray        # (TC,) source triangle ids
    corners: jnp.ndarray    # (TC, 3, 4) clip-space corner positions
    overflow: jnp.ndarray   # () i32 dropped bin pairs (0 = healthy)
    # Binning products (None on the jnp-oracle path), reused by the fused
    # Pallas resolve kernel (resolve_kernel.py):
    pair_tri: Optional[jnp.ndarray] = None    # (CAP_AL,) i32
    seg_starts: Optional[jnp.ndarray] = None  # (n_tiles,) i32
    seg_counts: Optional[jnp.ndarray] = None  # (n_tiles,) i32
    tri_id_padded: Optional[jnp.ndarray] = None  # (H', W') tile-aligned
    pair_rows: Optional[jnp.ndarray] = None   # (n, 128) shared pair rows


def rasterize(
    clip,
    indices,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    pair_capacity: Optional[int] = None,
    pair_factor: float = 4.0,
    jitter=None,
    use_pallas: bool = True,
    interpret: bool = False,
    full_height: Optional[int] = None,
    y_offset=None,
    vertex_attrs=None,
    tri_mat=None,
) -> VisibilityBuffer:
    """Rasterize `indices` (T, 3) over clip-space positions `clip` (V, 4).

    jitter: optional (2,) NDC offset applied to coverage only (TAA).
    use_pallas=False falls back to the brute-force jnp oracle (tests).
    full_height/y_offset: band-viewport mode (multi-chip pixel sharding).
    vertex_attrs (V, 9) + tri_mat (T,): when given (Pallas path), the
    shared pair rows also carry the resolve planes so the fused attribute
    resolve kernel can reuse them (raster/pair_rows.py).
    pair_factor: bin-pair capacity as a multiple of the triangle count
    (measured scenes run ~1.7x; capacity-sized sort/gather work dominates
    the raster front end, so keep this tight).
    """
    corners, weights, src, valid = _setup.clip_near_triangles(clip, indices)
    setup = _setup.triangle_setup(corners, valid, width, height, jitter,
                                  full_height=full_height,
                                  y_offset=y_offset)

    if pair_capacity is None:
        # Headroom for small scenes whose few triangles span many tiles.
        n_tiles = (-(-width // tile_w)) * (-(-height // tile_h))
        pair_capacity = max(int(indices.shape[0] * pair_factor),
                            4 * n_tiles, 4096)

    if use_pallas:
        from vkr_tpu.raster import pair_rows as _rows
        from vkr_tpu.raster.resolve import corner_attributes

        pair_tri, seg_starts, seg_counts, overflow = _setup.bin_triangles(
            setup, width, height, tile_h, tile_w, pair_capacity
        )
        if vertex_attrs is not None:
            cattrs = corner_attributes(vertex_attrs, indices, weights, src)
            tri_rows = _rows.build_tri_rows(setup, cattrs, tri_mat[src])
        else:
            tri_rows = _rows.build_tri_rows(setup)
        pair_setup = _rows.expand_pair_rows(tri_rows, pair_tri)
        zbuf, tid = _kernel.rasterize_tiles(
            pair_setup,
            seg_starts,
            seg_counts,
            width=width,
            height=height,
            tile_h=tile_h,
            tile_w=tile_w,
            interpret=interpret,
        )
        tid_padded = tid
        zbuf = zbuf[:height, :width]
        tid = tid[:height, :width]
        return VisibilityBuffer(
            depth=zbuf, tri_id=tid, setup=setup, weights=weights, src=src,
            corners=corners, overflow=overflow, pair_tri=pair_tri,
            seg_starts=seg_starts, seg_counts=seg_counts,
            tri_id_padded=tid_padded, pair_rows=pair_setup,
        )

    zbuf, tid = _kernel.rasterize_reference(setup, width, height)
    overflow = jnp.zeros((), jnp.int32)
    return VisibilityBuffer(
        depth=zbuf,
        tri_id=tid,
        setup=setup,
        weights=weights,
        src=src,
        corners=corners,
        overflow=overflow,
    )
