"""Per-(8,128)-tile texture-sampling coherence on the bench camera —
sizes the tile-window texture engine and its fallback paths.

Per tile, pixels are grouped into (pair, level) CLASSES. The engine
design under test:
  * top-K classes get a mip-matched VMEM window each (+ the l+1 window
    for trilinear);
  * pixels at COARSE levels (>= L_GLOBAL) read a globally VMEM-resident
    all-pairs coarse table instead (levels >= 5 of every pair fit VMEM);
  * remaining stragglers fall back to a tile-compacted dense gather —
    priced by the fraction of TILES containing any straggler.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/texwindow_stats.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

L_GLOBAL = 5
WINY, WINX = 48, 224   # per-class window texels (level-l)
TOPK = 2


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
    from vkr_tpu.raster import rasterize, transform_normals, \
        transform_vertices
    from vkr_tpu.raster.texture import quad_derivative_lod, small_lookup
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24, tessellation=80,
                                                tex_size=1024))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)

    clip = jax.jit(lambda s: transform_vertices(
        s.positions, s.vert_transform, s.transforms, cam.mvp))(scene)
    world_n = jax.jit(lambda s: transform_normals(
        s.normals, s.vert_transform, s.normal_mats))(scene)
    vattrs = jnp.concatenate(
        [scene.uvs, world_n, jnp.zeros((clip.shape[0], 4))], axis=-1)
    vis = rasterize(clip, scene.tri_opaque, width=W, height=H,
                    jitter=cam.jitter, vertex_attrs=vattrs,
                    tri_mat=scene.tri_opaque_mat, use_pallas=True)

    uv = np.asarray(jnp.moveaxis(vis.resolved[0:2], 0, -1))
    mat = np.asarray(vis.resolved[9]).astype(np.int32)
    lod = np.asarray(jax.jit(
        lambda u: quad_derivative_lod(u, scene.tex.sizes[0])
    )(jnp.asarray(uv)))
    pidx = np.asarray(small_lookup(scene.tex.mat_pair,
                                   jnp.maximum(jnp.asarray(mat), 0)))
    n_levels = len(scene.tex.sizes)
    level = np.round(np.clip(lod, 0, n_levels - 1)).astype(np.int32)
    sizes = np.asarray(scene.tex.sizes)

    th, tw = 8, 128
    ty, tx = H // th, W // tw

    def tiles(a):
        return a[: ty * th, : tx * tw].reshape(ty, th, tx, tw) \
            .transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)

    pid_t = tiles(pidx)
    lvl_t = tiles(level)
    cov_t = tiles(mat >= 0)
    u_t = tiles(uv[..., 0])
    v_t = tiles(uv[..., 1])

    n_tiles = ty * tx
    pix_total = 0
    pix_window = 0       # covered by a top-K class window
    pix_global = 0       # coarse level >= L_GLOBAL
    pix_straggler = 0
    tiles_with_straggler = 0
    windows_used = []

    for t in range(n_tiles):
        c = cov_t[t]
        if not c.any():
            continue
        p = pid_t[t][c]
        lv = lvl_t[t][c]
        uu = u_t[t][c]
        vv = v_t[t][c]
        pix_total += int(c.sum())

        fine = lv < L_GLOBAL
        pix_global += int((~fine).sum())

        # top-K fine classes by pixel count
        cls = Counter(zip(p[fine].tolist(), lv[fine].tolist()))
        straggle = 0
        used = 0
        for (cp, cl), cnt in cls.most_common():
            m = fine & (p == cp) & (lv == cl)
            s = sizes[min(cl, len(sizes) - 1)]
            du = np.ceil((uu[m] * s).max() - (uu[m] * s).min()) + 2
            dv = np.ceil((vv[m] * s).max() - (vv[m] * s).min()) + 2
            if used < TOPK and dv <= WINY and du <= WINX:
                pix_window += cnt
                used += 1
            else:
                straggle += cnt
        windows_used.append(used)
        if straggle:
            pix_straggler += straggle
            tiles_with_straggler += 1

    print(f"pixels: total {pix_total} window {pix_window / pix_total:.1%} "
          f"global-coarse {pix_global / pix_total:.1%} "
          f"straggler {pix_straggler / pix_total:.2%}")
    print(f"tiles with stragglers: {tiles_with_straggler}/{n_tiles} "
          f"({tiles_with_straggler / n_tiles:.1%})")
    wu = np.asarray(windows_used)
    print(f"windows/tile: mean {wu.mean():.2f} "
          f"(1 window {np.mean(wu == 1):.1%}, 2 {np.mean(wu == 2):.1%})")
    # coarse global table footprint: levels >= L_GLOBAL of every pair
    n_pairs = int(np.asarray(scene.tex.mat_pair).max()) + 1
    texels = sum(int(sizes[l]) ** 2 for l in range(L_GLOBAL, n_levels))
    print(f"global coarse table: {n_pairs} pairs x {texels} texels x 32B "
          f"= {n_pairs * texels * 32 / 1024:.0f} KB")


if __name__ == "__main__":
    main()
