"""Upper-bound the early-z break's pair savings on the bench camera.

For each tile: pairs whose zfloor exceeds the tile's FINAL max depth
could have been skipped by a perfect front-to-back walk. Reports the
skippable fraction (chunk-rounded, like the kernel's 32-pair chunks).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/earlyz_potential.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.raster import setup as RS
    from vkr_tpu.raster import transform_vertices
    from vkr_tpu.raster.pipeline import rasterize
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24, tessellation=80,
                                                tex_size=64))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)

    clip = jax.jit(lambda s: transform_vertices(
        s.positions, s.vert_transform, s.transforms, cam.mvp))(scene)
    corners, weights, src, valid = jax.jit(RS.clip_near_triangles)(
        clip, scene.tri_opaque)
    setup = jax.jit(lambda c, v: RS.triangle_setup(c, v, W, H, cam.jitter)
                    )(corners, valid)

    # min corner NDC depth per clipped triangle (the early-z sort key;
    # computed here since the production TriangleSetup dropped the field
    # when the experiment came back negative)
    wc = corners[..., 3]
    zmin_t = jnp.min(corners[..., 2] / jnp.where(
        jnp.abs(wc) < 1e-20, 1e-20, wc), axis=-1)
    tc = int(setup.a.shape[0])
    shift = max(tc, 1).bit_length()
    nb = 1 << min(16, 31 - shift)
    qz = jnp.clip((zmin_t * nb).astype(jnp.int32), 0, nb - 1)
    qz = jnp.where(setup.valid, qz, nb - 1)
    order = (jnp.sort((qz << shift) + jnp.arange(tc, dtype=jnp.int32))
             & ((1 << shift) - 1))
    zfloor = np.asarray(qz.astype(jnp.float32) / nb - 1e-4)[
        np.asarray(order)]
    bs = setup._replace(bbox=setup.bbox[order], valid=setup.valid[order])
    cap = max(int(scene.tri_opaque.shape[0] * 3.0), 4096)
    pair_tri, seg_starts, seg_counts, _ = jax.jit(
        lambda s: RS.bin_triangles(s, W, H, 8, 128, cap))(bs)

    vis = rasterize(clip, scene.tri_opaque, width=W, height=H,
                    jitter=cam.jitter, use_pallas=True, interpret=False)
    depth = np.asarray(vis.depth)

    th, twl = 8, 128
    tiles_x = -(-W // twl)
    tiles_y = -(-H // th)
    dpad = np.pad(depth, ((0, tiles_y * th - H), (0, tiles_x * twl - W)),
                  constant_values=1.0)
    tile_zmax = dpad.reshape(tiles_y, th, tiles_x, twl).max((1, 3))

    pt = np.asarray(pair_tri)
    ss = np.asarray(seg_starts)
    sc = np.asarray(seg_counts)
    total_pairs = int(sc.sum())
    walked = 0
    skipped = 0
    chunks_total = 0
    chunks_walked = 0
    for t in range(tiles_y * tiles_x):
        n = int(sc[t])
        if n == 0:
            continue
        seg = pt[ss[t]: ss[t] + n]
        zf = zfloor[seg]
        zmax = tile_zmax[t // tiles_x, t % tiles_x]
        # chunk-rounded: the kernel checks between 32-pair chunks
        # (aligned to the DMA window start, 16-pair granularity skip)
        row0p = (ss[t] // 2) // 8 * 8 * 2
        skip0 = ss[t] - row0p
        tot = skip0 + n
        nch = -(-tot // 32)
        chunks_total += nch
        w = nch
        for ci in range(1, nch):
            base = ci * 32
            if base - skip0 < n and zf[base - skip0] > zmax:
                w = ci
                break
        chunks_walked += w
        wp = min(w * 32 - skip0, n)
        walked += max(wp, 0)
        skipped += n - max(wp, 0)

    print(f"pairs total {total_pairs} walked {walked} "
          f"skipped {skipped} ({skipped / max(total_pairs, 1):.1%})")
    print(f"chunks total {chunks_total} walked {chunks_walked} "
          f"({1 - chunks_walked / max(chunks_total, 1):.1%} saved)")


if __name__ == "__main__":
    main()
