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
    # Resolved per-pixel attributes from the merged Pallas raster+resolve
    # kernel (gbuf_kernel.py), set when vertex_attrs were passed:
    # (N_CHANNELS + 1, H, W) = [uv(2), normal(3), prev_clip(4), mat_id].
    resolved: Optional[jnp.ndarray] = None
    # Front-end products retained for kernel re-runs over the same
    # geometry (the alpha-MASK depth-peel pass differs from the first
    # masked pass ONLY in peel_depth — rerunning clip/setup/bin/rows for
    # it was pure waste). None unless keep_prepared=True.
    prepared: Optional["RasterPrepared"] = None


class RasterPrepared(NamedTuple):
    """Everything the Pallas kernels need, independent of peel_depth."""

    pair_setup: jnp.ndarray   # (n_rows, 128) expanded pair rows
    seg_starts: jnp.ndarray   # (n_tiles,) i32
    seg_counts: jnp.ndarray   # (n_tiles,) i32


def rasterize(
    clip,
    indices,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    pair_capacity: Optional[int] = None,
    pair_factor: float = 1.5,
    jitter=None,
    use_pallas: bool = True,
    interpret: bool = False,
    full_height: Optional[int] = None,
    y_offset=None,
    vertex_attrs=None,
    tri_mat=None,
    peel_depth=None,
    corners_t=None,
    corner_attrs_t=None,
    keep_prepared: bool = False,
    prepared: Optional["VisibilityBuffer"] = None,
) -> VisibilityBuffer:
    """Rasterize `indices` (T, 3) over clip-space positions `clip` (V, 4).

    jitter: optional (2,) NDC offset applied to coverage only (TAA).
    use_pallas=False falls back to the brute-force jnp oracle (tests).
    full_height/y_offset: band-viewport mode (multi-chip pixel sharding).
    vertex_attrs (V, 9) + tri_mat (T,): when given (Pallas path), the
    shared pair rows also carry the resolve planes so the fused attribute
    resolve kernel can reuse them (raster/pair_rows.py).
    pair_factor: bin-pair capacity as a multiple of the triangle count
    (the 16 bench orbit frames peak at 1.265x — measured round 5,
    experiments note in ROADMAP.md; capacity-sized sort/gather work
    dominates the raster front end, so keep this tight — overflow is
    surfaced loudly via VisibilityBuffer.overflow / GBuffer.overflow
    and fails the bench).
    peel_depth: optional (H, W) f32 — only fragments strictly BEHIND it
    survive (depth peeling; the alpha-MASK second-layer pass).
    corners_t (4, 3T) + corner_attrs_t (9, 3T): PRE-GATHERED per-corner
    clip positions / attribute values in component-major layout
    (corner-major columns [c*T, (c+1)*T)) — the static-scene fast path
    (gbuffer.upload_scene pre-expands the shared vertex set once;
    per-frame there is then no scalarized `clip[indices]` /
    `vertex_attrs[indices]` gather, and the whole front end runs on
    dense (T,) components instead of lane-padded (T, 3) arrays).
    clip/indices/vertex_attrs are ignored when given. Value-identical
    to the generic path (reductions transcribed in the same order).
    keep_prepared: retain the expanded pair rows + segment table on the
    result so a depth-peel pass can rerun just the kernel (`prepared=`).
    prepared: a prior VisibilityBuffer from the SAME geometry+camera —
    skip the whole front end and rerun only the Pallas kernel (for
    peel_depth passes). Requires the merged-resolve Pallas path.
    """
    if prepared is not None:
        if not use_pallas or prepared.prepared is None:
            raise ValueError(
                "prepared= rerun requires a Pallas-path VisibilityBuffer "
                "built with keep_prepared=True"
            )
        from vkr_tpu.raster import gbuf_kernel as _gk

        prep = prepared.prepared
        zbuf, tid, attrs = _gk.gbuf_tiles(
            prep.pair_setup, prep.seg_starts, prep.seg_counts, peel_depth,
            y_offset, width=width, height=height, tile_h=tile_h,
            tile_w=tile_w, interpret=interpret,
        )
        return VisibilityBuffer(
            depth=zbuf[:height, :width], tri_id=tid[:height, :width],
            setup=prepared.setup, weights=prepared.weights,
            src=prepared.src, corners=prepared.corners,
            overflow=jnp.zeros((), jnp.int32),
            resolved=attrs[:, :height, :width],
            prepared=prep if keep_prepared else None,
        )

    soa = corners_t is not None
    if soa:
        n_src = corners_t.shape[1] // 3
        tri2, weights_t, valid = _setup.clip_near_corners_t(
            corners_t, n_src)
        corners_c = _setup._corners_from_weights_t(tri2, weights_t)
        setup_t = _setup.triangle_setup_t(
            corners_c, valid, width, height, jitter,
            full_height=full_height, y_offset=y_offset)
        # row-major records for the VisibilityBuffer (DCE'd when the
        # merged kernel's resolved output is consumed instead)
        setup = setup_t.to_rowmajor()
        weights = jnp.stack(
            [jnp.stack(weights_t[c], -1) for c in range(3)], axis=1)
        corners = jnp.stack(
            [jnp.stack(corners_c[c], -1) for c in range(3)], axis=1)
        src = jnp.concatenate(
            [jnp.arange(n_src, dtype=jnp.int32)] * 2)
    else:
        corners, weights, src, valid = _setup.clip_near_triangles(
            clip, indices)
        n_src = indices.shape[0]
        setup = _setup.triangle_setup(corners, valid, width, height,
                                      jitter, full_height=full_height,
                                      y_offset=y_offset)

    if pair_capacity is None:
        # Headroom for small scenes whose few triangles span many tiles.
        n_tiles = (-(-width // tile_w)) * (-(-height // tile_h))
        pair_capacity = max(int(n_src * pair_factor),
                            4 * n_tiles, 4096)

    if use_pallas:
        from vkr_tpu.raster import gbuf_kernel as _gk
        from vkr_tpu.raster import pair_rows as _rows
        from vkr_tpu.raster.resolve import corner_attributes

        # NOTE (round 5, measured): front-to-back segment ordering +
        # early-z walk termination was implemented and REVERTED — on the
        # bench camera only 1.2% of pairs are skippable (tiles mix near
        # and far surfaces, so the tile's max depth almost never clears
        # the remaining pairs' bound), while the depth sort + row gather
        # cost 26 ms (experiments/earlyz_potential.py).
        if soa:
            pair_tri, seg_starts, seg_counts, overflow = (
                _setup.bin_triangles_t(
                    setup_t.bbox, setup_t.valid, width, height, tile_h,
                    tile_w, pair_capacity))
        else:
            pair_tri, seg_starts, seg_counts, overflow = (
                _setup.bin_triangles(
                    setup, width, height, tile_h, tile_w, pair_capacity))
        kw = dict(width=width, height=height, tile_h=tile_h,
                  tile_w=tile_w, interpret=interpret)
        if vertex_attrs is not None or corner_attrs_t is not None:
            # Merged raster + resolve: one pass over the segments.
            # src is [0..T, 0..T] by construction: stack, don't gather.
            mat2 = jnp.concatenate([tri_mat, tri_mat], axis=0)
            if soa:
                cattrs_t = _rows.corner_attributes_pre_t(
                    corner_attrs_t, weights_t, n_src)
                tri_rows = _rows.build_tri_rows_t(setup_t, cattrs_t, mat2)
            else:
                cattrs = corner_attributes(vertex_attrs, indices, weights,
                                           src)
                tri_rows = _rows.build_tri_rows(setup, cattrs, mat2)
            pair_setup = _rows.expand_pair_rows(tri_rows, pair_tri)
            zbuf, tid, attrs = _gk.gbuf_tiles(
                pair_setup, seg_starts, seg_counts, peel_depth, y_offset,
                **kw
            )
            resolved = attrs[:, :height, :width]
        else:
            if peel_depth is not None:
                raise ValueError(
                    "peel_depth requires the merged raster+resolve "
                    "kernel (pass vertex_attrs) or use_pallas=False"
                )
            tri_rows = _rows.build_tri_rows(setup)
            pair_setup = _rows.expand_pair_rows(tri_rows, pair_tri)
            zbuf, tid = _kernel.rasterize_tiles(
                pair_setup, seg_starts, seg_counts, y_offset, **kw
            )
            resolved = None
        zbuf = zbuf[:height, :width]
        tid = tid[:height, :width]
        return VisibilityBuffer(
            depth=zbuf, tri_id=tid, setup=setup, weights=weights, src=src,
            corners=corners, overflow=overflow, resolved=resolved,
            prepared=(RasterPrepared(pair_setup, seg_starts, seg_counts)
                      if keep_prepared else None),
        )

    zbuf, tid = _kernel.rasterize_reference(setup, width, height,
                                            peel_depth=peel_depth,
                                            row_offset=y_offset)
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
