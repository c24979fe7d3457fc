"""Fused Pallas attribute-resolve kernel.

XLA's TPU gather is scalarized (~0.09 Gtaps/s measured — a 2M-pixel
attribute resolve costs ~85 ms), so the deferred resolve instead REPLAYS
each tile's binned pair segment: perspective-correct interpolation of any
vertex attribute is (sum_i e_i(x,y) * attr_i / w_i) / (sum_i e_i(x,y) / w_i)
and both numerator and denominator are linear in screen (x, y), so every
channel is a plane (p, q, r) evaluated where the pair's triangle id matches
the visibility buffer — streaming DMA + FMA + select, zero gathers.

Pair rows are the shared 64-f32 layout of raster/pair_rows.py (built once
per raster call, streamed by both this kernel and the raster kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vkr_tpu.raster.pair_rows import (
    N_CHANNELS,
    RESOLVE_BASE,
    ROW_WIDTH,
)

_CHUNK = 32                                 # pairs per DMA chunk
_CHUNK_ROWS = _CHUNK * ROW_WIDTH // 128     # 16 rows of 128 lanes


def _resolve_kernel(
    starts_ref,
    counts_ref,
    rows_hbm,
    tid_ref,        # in: (TH, TW) i32 visibility buffer block
    out_ref,        # out: (TH, TW, N_CHANNELS + 1) f32 — attrs + mat_id
    scratch,        # SMEM (_CHUNK_ROWS, 128)
    sem,
    *,
    tile_h: int,
    tile_w: int,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    tile_id = ty * tiles_x + tx

    start = starts_ref[tile_id]
    count = counts_ref[tile_id]
    row0 = start // (128 // ROW_WIDTH)

    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        + tx * tile_w
    ).astype(jnp.float32) + 0.5
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        + ty * tile_h
    ).astype(jnp.float32) + 0.5

    tid = tid_ref[...].astype(jnp.float32)

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    init = (
        [jnp.ones((tile_h, tile_w), jnp.float32)]      # denom
        + [zero] * N_CHANNELS
        + [jnp.full((tile_h, tile_w), -1.0, jnp.float32)]  # mat id
    )

    def chunk_body(ci, carry):
        carry = list(carry)
        cp = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row0 + ci * _CHUNK_ROWS, _CHUNK_ROWS)],
            scratch,
            sem,
        )
        cp.start()
        cp.wait()
        base = ci * _CHUNK
        for t in range(_CHUNK):
            flat = t * ROW_WIDTH

            def f(k, flat=flat):
                return scratch[(flat + k) // 128, (flat + k) % 128]

            valid = (base + t) < count
            match = (tid == f(12)) & valid  # shared row: id at [12]
            rb = RESOLVE_BASE
            carry[0] = jnp.where(
                match, f(rb) * px + f(rb + 1) * py + f(rb + 2), carry[0]
            )
            for ch in range(N_CHANNELS):
                o = rb + 3 + 3 * ch
                carry[1 + ch] = jnp.where(
                    match, f(o) * px + f(o + 1) * py + f(o + 2),
                    carry[1 + ch],
                )
            carry[-1] = jnp.where(match, f(rb + 30), carry[-1])
        return tuple(carry)

    num_chunks = pl.cdiv(count, _CHUNK)
    res = jax.lax.fori_loop(0, num_chunks, chunk_body, tuple(init))

    denom = res[0]
    inv_denom = 1.0 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    for ch in range(N_CHANNELS):
        out_ref[ch] = res[1 + ch] * inv_denom
    out_ref[N_CHANNELS] = res[-1]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def resolve_tiles(
    resolve_rows,
    seg_starts,
    seg_counts,
    tid_full,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
):
    """Returns (N_CHANNELS + 1, H', W'): interpolated [uv(2), normal(3),
    prev_clip(4)] + mat_id (channel-major), tile-aligned (crop to
    height/width)."""
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
        ],
        out_specs=pl.BlockSpec(
            (N_CHANNELS + 1, tile_h, tile_w), lambda i, j, *_: (0, i, j)
        ),
        scratch_shapes=[
            pltpu.SMEM((_CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_resolve_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (N_CHANNELS + 1, tiles_y * tile_h, tiles_x * tile_w),
            jnp.float32,
        ),
        interpret=interpret,
    )(seg_starts, seg_counts, resolve_rows, tid_full)
    return out
