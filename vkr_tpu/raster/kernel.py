"""The Pallas tile rasterizer — visibility-buffer core.

The one genuinely new native component of the TPU build (SURVEY.md §7 hard
part 1): replaces Vulkan fixed-function rasterization. The frame's triangle
work lists (setup.py binning) are walked per (tile_h, tile_w) pixel tile;
each tile keeps a VMEM depth buffer and triangle-id buffer, streams its
binned triangle setup rows from HBM by async DMA, evaluates three edge
functions + the depth plane over the whole tile per triangle on the VPU,
and resolves LESS_OR_EQUAL depth wins. The output is a visibility buffer
(depth + winning triangle id); attribute interpolation and texturing happen
in a separate deferred resolve pass (resolve.py) so the hot loop stays
gather-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pair_setup row layout (f32):
#   [0:3]  a0 a1 a2   edge x coefficients
#   [3:6]  b0 b1 b2   edge y coefficients
#   [6:9]  c0 c1 c2   edge constants (fill-rule biased)
#   [9:12] za zb zc   screen-linear depth plane
#   [12]   triangle id (exact in f32: < 2^24 triangles)
#   [13:16] padding
SETUP_WIDTH = 16
_CHUNK = 32  # pairs streamed per DMA / evaluated per VPU batch


def _raster_kernel(
    offsets_ref,  # scalar prefetch: (n_tiles+1,) int32 CSR offsets
    pair_hbm,     # (CAP + CHUNK, 16) f32 pair-expanded setup, in ANY/HBM
    zbuf_ref,     # out: (TH, TW) f32
    tid_ref,      # out: (TH, TW) i32
    scratch,      # VMEM (CHUNK, 16) f32
    sem,          # DMA semaphore
    *,
    tile_h: int,
    tile_w: int,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tiles_x = pl.num_programs(1)
    tile_id = ty * tiles_x + tx

    start = offsets_ref[tile_id]
    count = offsets_ref[tile_id + 1] - start

    px = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        + tx * tile_w + 0.5
    )
    py = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        + ty * tile_h + 0.5
    )

    zbuf0 = jnp.ones((tile_h, tile_w), jnp.float32)
    tid0 = jnp.full((tile_h, tile_w), -1.0, jnp.float32)

    def chunk_body(ci, carry):
        zbuf, tid = carry
        cp = pltpu.make_async_copy(
            pair_hbm.at[pl.ds(start + ci * _CHUNK, _CHUNK)], scratch, sem
        )
        cp.start()
        cp.wait()
        data = scratch[...]  # (CHUNK, 16)
        base = ci * _CHUNK

        # All CHUNK triangles at once: (CHUNK, TH, TW) edge/depth planes
        # evaluated on the VPU, then a masked min-reduce resolves the
        # chunk's local winner before merging with the carried z-buffer.
        def col(k):
            return data[:, k][:, None, None]

        pxb = px[None]
        pyb = py[None]
        e0 = col(0) * pxb + col(3) * pyb + col(6)
        e1 = col(1) * pxb + col(4) * pyb + col(7)
        e2 = col(2) * pxb + col(5) * pyb + col(8)
        d = col(9) * pxb + col(10) * pyb + col(11)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (_CHUNK, tile_h, tile_w), 0
        )
        cover = (
            (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
            & (d >= 0.0) & (d <= 1.0)
            & (base + lane < count)
        )
        dm = jnp.where(cover, d, 2.0)  # 2.0 > any valid depth
        # LESS_OR_EQUAL + submission order: the LAST triangle achieving the
        # chunk minimum wins (max lane among the minima).
        chunk_min = jnp.min(dm, axis=0)  # (TH, TW)
        at_min = dm <= chunk_min[None]
        win = jnp.max(jnp.where(at_min, lane, -1), axis=0)
        onehot = lane == win[None]
        ids = col(12)
        chunk_tid = jnp.sum(jnp.where(onehot, ids, 0.0), axis=0)

        better = chunk_min <= zbuf  # chunk is later than all carried work
        zbuf = jnp.where(better, chunk_min, zbuf)
        tid = jnp.where(better, chunk_tid, tid)
        return zbuf, tid

    num_chunks = pl.cdiv(count, _CHUNK)
    zbuf, tid = jax.lax.fori_loop(0, num_chunks, chunk_body, (zbuf0, tid0))
    zbuf_ref[...] = zbuf
    tid_ref[...] = tid.astype(jnp.int32)


def build_pair_setup(setup, pair_tri_sorted):
    """Gather the binned, tile-sorted per-pair setup rows (jnp).

    Returns (CAP + CHUNK, 16) f32, padded so the kernel's fixed-size chunk
    DMAs never run off the end.
    """
    t = jnp.maximum(pair_tri_sorted, 0)
    rows = jnp.concatenate(
        [
            setup.a[t],
            setup.b[t],
            setup.c[t],
            setup.zplane[t],
            pair_tri_sorted[:, None].astype(jnp.float32),
            jnp.zeros((t.shape[0], 3), jnp.float32),
        ],
        axis=-1,
    )
    pad = jnp.zeros((_CHUNK, SETUP_WIDTH), jnp.float32)
    return jnp.concatenate([rows, pad], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def rasterize_tiles(
    pair_setup,
    offsets,
    *,
    width: int,
    height: int,
    tile_h: int = 8,
    tile_w: int = 128,
    interpret: bool = False,
):
    """Run the Pallas visibility rasterizer.

    Returns (zbuf (H', W') f32, tri_id (H', W') i32) where H'/W' are the
    tile-aligned dimensions (crop to (height, width) for consumption).
    """
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
        ],
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, SETUP_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA,
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
    )(offsets, pair_setup)
    return zbuf, tid


def rasterize_reference(setup, width: int, height: int, tri_chunk: int = 64):
    """Brute-force jnp rasterizer (no binning): the correctness oracle for
    the Pallas kernel, usable on any backend. O(T * pixels) — small scenes
    and tests only."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    px = xs[None, :]
    py = ys[:, None]

    n_tri = setup.a.shape[0]
    zbuf = jnp.ones((height, width), jnp.float32)
    tid = jnp.full((height, width), -1, jnp.int32)

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
            & (d >= 0.0) & (d <= 1.0) & (d <= zbuf) & setup.valid[i]
        )
        return jnp.where(cover, d, zbuf), jnp.where(cover, i, tid)

    return jax.lax.fori_loop(0, n_tri, body, (zbuf, tid))
