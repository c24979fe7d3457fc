"""Two-pass raster experiment: visibility walk + MXU winner-replay.

The merged gbuf kernel pays 31 resolve-coefficient selects + 31 scalar
loads per PAIR (measured 32.5 ms / ~83 ns per pair at 1080p). Pass 1
latches only depth + the winning pair's GLOBAL slot index g (2 selects);
pass 2 re-walks the chunks and gathers the winner's whole 64-f32 row
with a one-hot MXU einsum per chunk: oh (1024, 16 rows) @ chunk
(16, 128) -> (8, 128, 128) accumulated — each pixel's g matches exactly
one (chunk, row, half), so the accumulation IS the row gather. f32
exactness via on-the-fly hi/lo bf16 split of the chunk (the MXU
truncates f32 operands).

Compares output bit-exactness vs gbuf_tiles and times both.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/twopass_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel():
    from vkr_tpu.raster.kernel import _CHUNK, _CHUNK_ROWS, chunk_dma, \
        segment_window
    from vkr_tpu.raster.pair_rows import N_CHANNELS, RESOLVE_BASE, \
        ROW_WIDTH

    def kernel(starts_ref, counts_ref, yoff_ref, pair_hbm, peel_ref,
               zbuf_ref, tid_ref, attr_ref, scratch, vmem_rows, sem,
               vsem, *, tile_h, tile_w):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        tiles_x = pl.num_programs(1)
        tile_id = ty * tiles_x + tx

        row0, skip, total = segment_window(starts_ref, counts_ref,
                                           tile_id)
        get_dma = chunk_dma(pair_hbm, scratch, sem, row0)

        px = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            + tx * tile_w
        ).astype(jnp.float32) + 0.5
        py = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            + ty * tile_h + yoff_ref[0]
        ).astype(jnp.float32) + 0.5
        peel = peel_ref[...]
        num_chunks = pl.cdiv(total, _CHUNK)

        # ---- pass 1: depth + winning slot index ----
        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        zbuf0 = jnp.ones((tile_h, tile_w), jnp.float32)
        g0 = jnp.full((tile_h, tile_w), -1.0, jnp.float32)
        tid0 = jnp.full((tile_h, tile_w), -1.0, jnp.float32)

        def body1(ci, carry):
            zbuf, gwin, tid = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < num_chunks)
            def _():
                get_dma(1 - slot, ci + 1).start()

            get_dma(slot, ci).wait()
            base = ci * _CHUNK
            for t in range(_CHUNK):
                g = base + t
                valid = (g >= skip) & (g < total)
                flat = t * ROW_WIDTH

                def f(k, flat=flat):
                    return scratch[slot, (flat + k) // 128,
                                   (flat + k) % 128]

                e0 = f(0) * px + f(3) * py + f(6)
                e1 = f(1) * px + f(4) * py + f(7)
                e2 = f(2) * px + f(5) * py + f(8)
                d = f(9) * px + f(10) * py + f(11)
                cover = (
                    (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                    & (d >= 0.0) & (d <= 1.0) & (d <= zbuf)
                    & (d > peel) & valid
                )
                zbuf = jnp.where(cover, d, zbuf)
                gf = jnp.asarray(g, jnp.float32)
                gwin = jnp.where(cover, gf, gwin)
                # tri id latched in pass 1: its integer range exceeds
                # the hi/lo bf16 replay's exactness (ids up to 2^20)
                tid = jnp.where(cover, f(12), tid)
            return zbuf, gwin, tid

        zbuf, gwin, tid1 = jax.lax.fori_loop(
            0, num_chunks, body1, (zbuf0, g0, tid0))
        zbuf_ref[...] = zbuf
        tid_ref[...] = tid1.astype(jnp.int32)

        # ---- pass 2: winner row replay via one-hot MXU ----
        # vmem_rows double buffer: (2, _CHUNK_ROWS, 128) f32 VMEM
        def vdma(slot, ci):
            return pltpu.make_async_copy(
                pair_hbm.at[pl.ds(row0 + ci * _CHUNK_ROWS, _CHUNK_ROWS)],
                vmem_rows.at[slot], vsem.at[slot])

        @pl.when(num_chunks > 0)
        def _():
            vdma(0, 0).start()

        r_iota = jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w, _CHUNK_ROWS), 2)
        # winner's chunk row and half: slot g -> row (g*64)//128 within
        # chunk, half = g & 1 (64-lane offset)
        gi = gwin.astype(jnp.int32)
        grow = jax.lax.rem(gi, _CHUNK) // 2
        gchunk = gi // _CHUNK

        def body2(ci, acc):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < num_chunks)
            def _():
                vdma(1 - slot, ci + 1).start()

            vdma(slot, ci).wait()
            rows = vmem_rows[slot]  # (16, 128) f32
            hi = rows.astype(jnp.bfloat16)
            lo = (rows - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            sel = (gchunk == ci)
            oh = (jnp.where(sel, grow, -1)[..., None]
                  == r_iota).astype(jnp.bfloat16)
            part = jnp.einsum("xyr,rc->xyc", oh, hi,
                              preferred_element_type=jnp.float32)
            part = part + jnp.einsum("xyr,rc->xyc", oh, lo,
                                     preferred_element_type=jnp.float32)
            return acc + part

        acc = jax.lax.fori_loop(
            0, num_chunks, body2,
            jnp.zeros((tile_h, tile_w, 128), jnp.float32))

        odd = (gi & 1) == 1

        def fld(k):
            return jnp.where(odd, acc[..., 64 + k], acc[..., k])

        bg = gwin < 0.0
        denom = fld(16) * px + fld(17) * py + fld(18)
        denom = jnp.where(bg, 1.0, denom)
        inv_denom = 1.0 / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        for ch in range(N_CHANNELS):
            o = RESOLVE_BASE + 3 + 3 * ch
            attr_ref[ch] = (fld(o) * px + fld(o + 1) * py
                            + fld(o + 2)) * inv_denom
        attr_ref[N_CHANNELS] = jnp.where(bg, -1.0, fld(46))

    return kernel


@functools.partial(jax.jit, static_argnames=("width", "height"))
def gbuf_tiles_twopass(pair_rows, seg_starts, seg_counts, *, width,
                       height):
    from vkr_tpu.raster.kernel import _CHUNK_ROWS
    from vkr_tpu.raster.pair_rows import N_CHANNELS

    tile_h, tile_w = 8, 128
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    peel = jnp.full((tiles_y * tile_h, tiles_x * tile_w), -1.0,
                    jnp.float32)
    yoff = jnp.zeros((1,), jnp.int32)
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
            pltpu.VMEM((2, _CHUNK_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_make_kernel(), tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.float32),
            jax.ShapeDtypeStruct((tiles_y * tile_h, tiles_x * tile_w),
                                 jnp.int32),
            jax.ShapeDtypeStruct(
                (N_CHANNELS + 1, tiles_y * tile_h, tiles_x * tile_w),
                jnp.float32),
        ],
    )(seg_starts, seg_counts, yoff, pair_rows, peel)


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.raster import setup as RS
    from vkr_tpu.raster import pair_rows as RR
    from vkr_tpu.raster import gbuf_kernel as GK
    from vkr_tpu.raster.resolve import corner_attributes
    from vkr_tpu.raster import transform_normals, transform_vertices
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(
        columns=24, tessellation=80, tex_size=64))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    reps = 8

    clip = jax.jit(lambda s: transform_vertices(
        s.positions, s.vert_transform, s.transforms, cam.mvp))(scene)
    world_n = jax.jit(lambda s: transform_normals(
        s.normals, s.vert_transform, s.normal_mats))(scene)
    vattrs = jnp.concatenate(
        [scene.uvs, world_n, jnp.zeros((clip.shape[0], 4))], axis=-1)
    corners, weights, src, valid = jax.jit(RS.clip_near_triangles)(
        clip, scene.tri_opaque)
    setup = jax.jit(lambda c, v: RS.triangle_setup(
        c, v, W, H, cam.jitter))(corners, valid)
    cap = max(int(scene.tri_opaque.shape[0] * 2.0), 4096)
    pair_tri, ss, sc, _ = jax.jit(lambda s: RS.bin_triangles(
        s, W, H, 8, 128, cap))(setup)
    cattrs = jax.jit(corner_attributes)(vattrs, scene.tri_opaque,
                                        weights, src)
    rows = jax.jit(RR.build_tri_rows)(setup, cattrs,
                                      scene.tri_opaque_mat[src])
    ps = jax.jit(RR.expand_pair_rows)(rows, pair_tri)

    def bench(name, f, *a):
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]
                       .reshape(-1)[0])
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]
                       .reshape(-1)[0])
        print(f"{name:22s} {(time.time()-t0)/reps*1e3:9.2f} ms",
              flush=True)
        return out

    z1, t1, a1 = bench("merged kernel", jax.jit(
        lambda p, s1, s2: GK.gbuf_tiles(p, s1, s2, None, None,
                                        width=W, height=H)), ps, ss, sc)
    z2, t2, a2 = bench("two-pass kernel", functools.partial(
        gbuf_tiles_twopass, width=W, height=H), ps, ss, sc)

    z1, t1, a1, z2, t2, a2 = (np.asarray(x)
                              for x in (z1, t1, a1, z2, t2, a2))
    print("zbuf equal:", np.array_equal(z1, z2))
    print("tid equal:", np.array_equal(t1, t2))
    cov = t1 >= 0
    err = np.abs(a1 - a2)[:, cov].max() if cov.any() else 0.0
    print(f"attr max |err| on covered: {err:.3e}")


if __name__ == "__main__":
    main()
