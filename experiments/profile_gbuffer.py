"""Sub-profile the G-buffer pass: raster front end vs texture sampling.

    python experiments/profile_gbuffer.py [--tex-size 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--tex-size", type=int, default=1024)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args(argv)

    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.raster import (rasterize, transform_normals,
                                transform_vertices)
    from vkr_tpu.raster.texture import (quad_derivative_lod, sample_alpha,
                                        sample_material_pair, small_lookup)
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H)
    t0 = time.time()
    scene_cpu = sponza_colonnade_scene(columns=24, tessellation=80,
                                       tex_size=args.tex_size)
    print(f"scene build {time.time()-t0:.1f}s")
    t0 = time.time()
    scene = upload_scene(scene_cpu)
    print(f"upload+pack {time.time()-t0:.1f}s "
          f"(opaque {scene.tri_opaque.shape[0]} masked "
          f"{scene.tri_masked.shape[0]} tris)")
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)

    def bench(name, f, *a):
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.time()
        for _ in range(args.reps):
            out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        print(f"{name:24s} {(time.time()-t0)/args.reps*1e3:9.2f} ms",
              flush=True)
        return out

    vp, pvp, jit_ = cam.mvp, cam.prev_mvp, cam.jitter

    clip = bench("transform (3x)", jax.jit(lambda s: (
        transform_vertices(s.positions, s.vert_transform, s.transforms, vp),
        transform_vertices(s.positions, s.vert_transform, s.transforms,
                           pvp),
        transform_normals(s.normals, s.vert_transform, s.normal_mats),
    )), scene)
    clip_c, prev_clip, world_n = clip
    vattrs = jnp.concatenate([scene.uvs, world_n, prev_clip], axis=-1)

    rkw = dict(width=W, height=H, jitter=jit_, use_pallas=True,
               interpret=False)

    vis = bench("raster opaque", jax.jit(
        lambda c, v, s: rasterize(c, s.tri_opaque,
                                  tri_mat=s.tri_opaque_mat,
                                  vertex_attrs=v, **rkw)),
        clip_c, vattrs, scene)
    vis_b = bench("raster masked", jax.jit(
        lambda c, v, s: rasterize(c, s.tri_masked,
                                  tri_mat=s.tri_masked_mat,
                                  vertex_attrs=v, **rkw)),
        clip_c, vattrs, scene)

    uv = jnp.moveaxis(vis.resolved[0:2], 0, -1)
    mat_id = vis.resolved[9].astype(jnp.int32)
    uv_b = jnp.moveaxis(vis_b.resolved[0:2], 0, -1)
    mat_b = vis_b.resolved[9].astype(jnp.int32)

    def alpha_test(s, uvb, matb):
        lod_b = quad_derivative_lod(uvb, s.tex.sizes[0])
        aidx_b = small_lookup(s.mat_albedo_tex, jnp.maximum(matb, 0))
        return sample_alpha(s.tex, jnp.maximum(aidx_b, 0), uvb, lod_b)

    bench("alpha MASK test", jax.jit(alpha_test), scene, uv_b, mat_b)

    def pair(s, uv, mid):
        lod = quad_derivative_lod(uv, s.tex.sizes[0])
        return sample_material_pair(s.tex, mid, uv, lod)

    bench("pair texture sample", jax.jit(pair), scene, uv, mat_id)

    def lodonly(s, uv):
        return quad_derivative_lod(uv, s.tex.sizes[0])

    bench("lod only", jax.jit(lodonly), scene, uv)


if __name__ == "__main__":
    main()
