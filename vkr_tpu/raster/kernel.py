"""The Pallas tile rasterizer — visibility-buffer core.

The one genuinely new native component of the TPU build (SURVEY.md §7 hard
part 1): replaces Vulkan fixed-function rasterization. The frame's triangle
work lists (setup.py binning) are walked per (tile_h, tile_w) pixel tile;
each tile keeps its depth/tri-id state in registers, streams its binned
triangle setup rows HBM -> SMEM with DOUBLE-BUFFERED async DMA (SMEM is
untiled, so the 64-float rows are legal to slice), and the scalar unit
feeds per-triangle edge/depth plane coefficients to full-tile VPU ops.
LESS_OR_EQUAL depth wins; output is a visibility buffer (depth + winning
triangle id).

Two kernels share the machinery:
  * `_raster_kernel` — visibility only (depth + tri id); used when no
    vertex attributes are requested.
  * `gbuf_kernel.gbuf_tiles` — the merged raster + attribute-resolve
    kernel (one pass over the segments, selecting the winning pair's
    resolve-plane coefficients per pixel); used for G-buffer rendering.

Memory layout: pair rows are the shared 64-f32 layout of
raster/pair_rows.py; the buffer is viewed as (n_rows, 128). Segments are
dense (unaligned, setup.bin_triangles); each tile rounds its DMA start
down to an 8-row boundary and skips the leading pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pair rows are the shared 64-f32 layout of raster/pair_rows.py (raster
# fields at [0:16), resolve fields at [16:64)).
from vkr_tpu.raster.pair_rows import PAIRS_PER_ROW, ROW_WIDTH

_CHUNK = 32                          # pairs per DMA chunk
_CHUNK_ROWS = _CHUNK * ROW_WIDTH // 128  # 16 rows of 128 lanes
_ROW_ALIGN = 8                       # DMA start rounded to 8 rows


def segment_window(starts_ref, counts_ref, tile_id):
    """(row0, skip, total): aligned DMA start row, leading pairs to skip,
    and total pairs (skip + count) to walk for this tile's segment."""
    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    row0 = (start // PAIRS_PER_ROW) // _ROW_ALIGN * _ROW_ALIGN
    skip = start - row0 * PAIRS_PER_ROW  # in [0, _ROW_ALIGN*PAIRS_PER_ROW)
    return row0, skip, skip + count


def chunk_dma(pair_hbm, scratch, sem, row0):
    """Double-buffer helper: DMA chunk `ci` into scratch slot `slot`."""

    def get(slot, ci):
        return pltpu.make_async_copy(
            pair_hbm.at[pl.ds(row0 + ci * _CHUNK_ROWS, _CHUNK_ROWS)],
            scratch.at[slot],
            sem.at[slot],
        )

    return get


def _raster_kernel(
    starts_ref,   # scalar prefetch: (n_tiles,) i32 dense segment starts
    counts_ref,   # scalar prefetch: (n_tiles,) i32 pair counts
    yoff_ref,     # scalar prefetch: (1,) i32 band row offset (band-exact
                  # viewports: pixel rows are FULL-frame coordinates)
    pair_hbm,     # (n_rows, 128) f32 pair buffer (2 pairs per row), HBM
    zbuf_ref,     # out: (TH, TW) f32
    tid_ref,      # out: (TH, TW) i32
    scratch,      # SMEM (2, _CHUNK_ROWS, 128) f32 double buffer
    sem,          # DMA semaphores (2,)
    *,
    tile_h: int,
    tile_w: int,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    tile_id = ty * tiles_x + tx

    row0, skip, total = segment_window(starts_ref, counts_ref, tile_id)
    get_dma = chunk_dma(pair_hbm, scratch, sem, row0)

    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        + tx * tile_w
    ).astype(jnp.float32) + 0.5
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        + ty * tile_h + yoff_ref[0]
    ).astype(jnp.float32) + 0.5

    zbuf0 = jnp.ones((tile_h, tile_w), jnp.float32)
    tid0 = jnp.full((tile_h, tile_w), -1.0, jnp.float32)
    num_chunks = pl.cdiv(total, _CHUNK)

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, carry):
        zbuf, tid = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < num_chunks)
        def _():
            get_dma(1 - slot, ci + 1).start()

        get_dma(slot, ci).wait()
        base = ci * _CHUNK
        for t in range(_CHUNK):  # static unroll; static SMEM indices
            g = base + t
            valid = (g >= skip) & (g < total)
            flat = t * ROW_WIDTH

            def f(k, flat=flat):
                return scratch[slot, (flat + k) // 128, (flat + k) % 128]

            e0 = f(0) * px + f(3) * py + f(6)
            e1 = f(1) * px + f(4) * py + f(7)
            e2 = f(2) * px + f(5) * py + f(8)
            d = f(9) * px + f(10) * py + f(11)
            cover = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (d >= 0.0) & (d <= 1.0) & (d <= zbuf) & valid
            )
            zbuf = jnp.where(cover, d, zbuf)
            tid = jnp.where(cover, f(12), tid)
        return zbuf, tid

    zbuf, tid = jax.lax.fori_loop(0, num_chunks, chunk_body, (zbuf0, tid0))
    zbuf_ref[...] = zbuf
    tid_ref[...] = tid.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def rasterize_tiles(
    pair_setup,
    seg_starts,
    seg_counts,
    row_offset=None,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
):
    """Run the Pallas visibility rasterizer.

    row_offset: optional () i32 — first pixel row of this band in
    full-frame coordinates (band-exact viewports).

    Returns (zbuf (H', W') f32, tri_id (H', W') i32) where H'/W' are the
    tile-aligned dimensions (crop to (height, width) for consumption).
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    yoff = jnp.zeros((1,), jnp.int32) if row_offset is None else (
        jnp.asarray(row_offset, jnp.int32).reshape(1)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, _CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zbuf, tid = pl.pallas_call(
        functools.partial(_raster_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(seg_starts, seg_counts, yoff, pair_setup)
    return zbuf, tid


def rasterize_reference(setup, width: int, height: int, tri_chunk: int = 64,
                        peel_depth=None, row_offset=None):
    """Brute-force jnp rasterizer (no binning): the correctness oracle for
    the Pallas kernel, usable on any backend. O(T * pixels) — small scenes
    and tests only. peel_depth: depth-peeling floor (see pipeline);
    row_offset: band-exact viewport row origin."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    if row_offset is not None:
        ys = ys + jnp.asarray(row_offset, jnp.float32)
    px = xs[None, :]
    py = ys[:, None]

    n_tri = setup.a.shape[0]
    zbuf = jnp.ones((height, width), jnp.float32)
    tid = jnp.full((height, width), -1, jnp.int32)
    peel = (jnp.full((height, width), -1.0, jnp.float32)
            if peel_depth is None else peel_depth)

    def body(i, carry):
        zbuf, tid = carry
        a, b, c = setup.a[i], setup.b[i], setup.c[i]
        zp = setup.zplane[i]
        e0 = a[0] * px + b[0] * py + c[0]
        e1 = a[1] * px + b[1] * py + c[1]
        e2 = a[2] * px + b[2] * py + c[2]
        d = zp[0] * px + zp[1] * py + zp[2]
        cover = (
            (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            & (d >= 0.0) & (d <= 1.0) & (d <= zbuf)
            & (d > peel) & setup.valid[i]
        )
        return jnp.where(cover, d, zbuf), jnp.where(cover, i, tid)

    return jax.lax.fori_loop(0, n_tri, body, (zbuf, tid))
