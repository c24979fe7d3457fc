"""Per-(8,128)-tile texture-sampling coherence on the bench camera —
decides the tile-window texture engine's window shape and fallback rate.

For each pixel tile reports:
  * number of distinct material-pair indices
  * mip-level spread (max - min rounded level)
  * texel bbox (dy, dx) of the tile's samples at the tile's MIN level,
    in that level's texel units, unwrapped (REPEAT handled by taking
    the bbox of uv*size without mod, since uv itself is continuous)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/texwindow_stats.py
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
    covered = mat >= 0

    def tiles(a):
        return a[: ty * th, : tx * tw].reshape(ty, th, tx, tw) \
            .transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)

    pid_t = tiles(pidx)
    lvl_t = tiles(level)
    cov_t = tiles(covered)
    u_t = tiles(uv[..., 0])
    v_t = tiles(uv[..., 1])

    n_pairs = np.zeros(ty * tx, np.int32)
    lspread = np.zeros(ty * tx, np.int32)
    bby = np.zeros(ty * tx, np.int32)
    bbx = np.zeros(ty * tx, np.int32)
    for t in range(ty * tx):
        c = cov_t[t]
        if not c.any():
            continue
        p = pid_t[t][c]
        n_pairs[t] = len(np.unique(p))
        lv = lvl_t[t][c]
        lspread[t] = lv.max() - lv.min()
        s = sizes[min(int(lv.min()), len(sizes) - 1)]
        uu = u_t[t][c] * s
        vv = v_t[t][c] * s
        bbx[t] = int(np.ceil(uu.max() - uu.min())) + 2
        bby[t] = int(np.ceil(vv.max() - vv.min())) + 2

    act = cov_t.any(1)
    n = act.sum()
    print(f"tiles {ty * tx} active {n}")
    for name, a in (("distinct pairs", n_pairs), ("level spread", lspread)):
        va = a[act]
        print(f"{name}: p50 {np.percentile(va, 50):.0f} "
              f"p90 {np.percentile(va, 90):.0f} "
              f"p99 {np.percentile(va, 99):.0f} max {va.max()}")
    for name, a in (("bbox dy", bby), ("bbox dx", bbx)):
        va = a[act]
        print(f"{name}: p50 {np.percentile(va, 50):.0f} "
              f"p90 {np.percentile(va, 90):.0f} "
              f"p99 {np.percentile(va, 99):.0f} max {va.max()}")
    # engine viability: 1 pair, spread <= 1, bbox fits window
    for wy, wx in ((48, 224), (64, 256), (96, 320)):
        ok = act & (n_pairs == 1) & (lspread <= 1) & (bby <= wy) \
            & (bbx <= wx)
        print(f"window {wy}x{wx}: fit {ok.sum() / max(n, 1):.1%}")


if __name__ == "__main__":
    main()
