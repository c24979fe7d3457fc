"""Merged Pallas raster + attribute-resolve kernel (one pass, one DMA
stream).

Replaces the two-kernel pipeline (visibility raster then plane-replay
resolve) for G-buffer rendering: a single walk over each tile's binned
pair segment performs the depth test AND latches the winning pair's
resolve-plane coefficients per pixel (31 scalar-broadcast selects under
the cover mask). Attributes are evaluated ONCE per tile at the end from
the latched planes — perspective-correct interpolation as in
the plane-replay scheme: every channel is a plane (p, q, r) divided
by the shared denominator plane, all linear in screen (x, y).

vs. the two-pass scheme this halves the pair-row DMA traffic and chunk
count, drops one kernel launch and the HBM round-trip of the visibility
buffer, and does the same amount of VPU select work. DMAs are
double-buffered (kernel.py helpers).

Reference parity: this IS the reference's single G-buffer renderpass
(scene_renderer.cpp:140-215, one pass writing all 5 attachments) in
TPU-native form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkr_tpu.raster.kernel import _CHUNK, _CHUNK_ROWS, chunk_dma, \
    segment_window
from vkr_tpu.raster.pair_rows import N_CHANNELS, RESOLVE_BASE, ROW_WIDTH

# latched per-pixel state: denom plane (3) + N_CHANNELS planes (3 each) +
# material id (1)
_N_COEF = 3 + 3 * N_CHANNELS + 1


def _gbuf_kernel(
    starts_ref,   # scalar prefetch: (n_tiles,) i32 dense segment starts
    counts_ref,   # scalar prefetch: (n_tiles,) i32 pair counts
    yoff_ref,     # scalar prefetch: (1,) i32 band row offset
    pair_hbm,     # (n_rows, 128) f32 shared pair rows, HBM
    peel_ref,     # (TH, TW) f32 depth-peel floor (-1 = no peeling)
    zbuf_ref,     # out: (TH, TW) f32
    tid_ref,      # out: (TH, TW) i32
    attr_ref,     # out: (N_CHANNELS + 1, TH, TW) f32 — attrs + mat id
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

    # depth-peeling floor: only fragments strictly behind the previous
    # layer survive (the visibility-buffer analog of a second fragment
    # layer under per-fragment discard)
    peel = peel_ref[...]

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    init = (
        [jnp.ones_like(zero),                      # zbuf (clear 1.0)
         jnp.full_like(zero, -1.0)]                # tri id
        # denom plane (p, q, r) = (0, 0, 1): background denom = 1
        + [zero, zero, jnp.ones_like(zero)]
        + [zero] * (3 * N_CHANNELS)                # channel planes
        + [jnp.full_like(zero, -1.0)]              # material id
    )
    num_chunks = pl.cdiv(total, _CHUNK)

    @pl.when(num_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, carry):
        carry = list(carry)
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
                & (d >= 0.0) & (d <= 1.0) & (d <= carry[0])
                & (d > peel) & valid
            )
            carry[0] = jnp.where(cover, d, carry[0])
            carry[1] = jnp.where(cover, f(12), carry[1])
            for k in range(_N_COEF):
                carry[2 + k] = jnp.where(
                    cover, f(RESOLVE_BASE + k), carry[2 + k]
                )
        return tuple(carry)

    res = jax.lax.fori_loop(0, num_chunks, chunk_body, tuple(init))

    zbuf_ref[...] = res[0]
    tid_ref[...] = res[1].astype(jnp.int32)
    c = res[2:]
    denom = c[0] * px + c[1] * py + c[2]
    inv_denom = 1.0 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    for ch in range(N_CHANNELS):
        o = 3 + 3 * ch
        attr_ref[ch] = (c[o] * px + c[o + 1] * py + c[o + 2]) * inv_denom
    attr_ref[N_CHANNELS] = c[_N_COEF - 1]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def gbuf_tiles(
    pair_rows,
    seg_starts,
    seg_counts,
    peel_depth=None,
    row_offset=None,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
):
    """Run the merged raster + resolve kernel.

    peel_depth: optional (H, W) f32 — only fragments strictly BEHIND it
    survive (depth-peeling layer for the alpha-MASK second pass).
    row_offset: optional () i32 band row origin (band-exact viewports).

    Returns (zbuf (H', W') f32, tri_id (H', W') i32,
    attrs (N_CHANNELS + 1, H', W') f32 = [uv(2), normal(3), prev_clip(4),
    mat_id]) — tile-aligned; crop to (height, width)."""
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    if peel_depth is None:
        peel = jnp.full((tiles_y * tile_h, tiles_x * tile_w), -1.0,
                        jnp.float32)
    else:
        peel = jnp.pad(
            peel_depth,
            ((0, tiles_y * tile_h - peel_depth.shape[0]),
             (0, tiles_x * tile_w - peel_depth.shape[1])),
            constant_values=-1.0,
        )

    yoff = jnp.zeros((1,), jnp.int32) if row_offset is None else (
        jnp.asarray(row_offset, jnp.int32).reshape(1)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((N_CHANNELS + 1, tile_h, tile_w),
                         lambda i, j, *_: (0, i, j)),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, _CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zbuf, tid, attrs = pl.pallas_call(
        functools.partial(_gbuf_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.int32),
            jax.ShapeDtypeStruct(
                (N_CHANNELS + 1, tiles_y * tile_h, tiles_x * tile_w),
                jnp.float32,
            ),
        ],
        interpret=interpret,
    )(seg_starts, seg_counts, yoff, pair_rows, peel)
    return zbuf, tid, attrs
