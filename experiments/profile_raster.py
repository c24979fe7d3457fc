"""Sub-profile the raster front end: setup / binning / row expansion /
kernel, to locate the cost inside 'raster opaque' (~108 ms at 1080p).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/profile_raster.py
"""

from __future__ import annotations

import time


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
    from vkr_tpu.raster import pair_rows as RR
    from vkr_tpu.raster import gbuf_kernel as GK
    from vkr_tpu.raster.resolve import corner_attributes
    from vkr_tpu.raster import transform_normals, transform_vertices
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24, tessellation=80,
                                                tex_size=64))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    reps = 8

    def bench(name, f, *a):
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.time()
        for _ in range(reps):
            out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        print(f"{name:22s} {(time.time()-t0)/reps*1e3:9.2f} ms", flush=True)
        return out

    vp, jit_ = cam.mvp, cam.jitter
    indices, tri_mat = scene.tri_opaque, scene.tri_opaque_mat
    T = int(indices.shape[0])
    cap = max(int(T * 1.5), 4096)  # pipeline.py pair_factor default
    print(f"tris {T} cap {cap}")

    # static pre-expansion SoA fast path (round 5): transposed per-corner
    # world tables from upload_scene; per-frame transform is one matmul,
    # no gathers, all front-end math on dense (T,) components
    clip_o = bench("corner transform x2", jax.jit(
        lambda cw: (RS.corner_transform_t(cw, vp),
                    RS.corner_transform_t(cw, vp))),
        scene.corner_world_o)[0]
    cattr9 = jnp.concatenate(
        [scene.corner_attr_o, RS.corner_transform_t(scene.corner_world_o,
                                                    vp)], axis=0)

    def clip_setup(c):
        tri2, weights_t, valid = RS.clip_near_corners_t(c, T)
        setup_t = RS.triangle_setup_t(
            RS._corners_from_weights_t(tri2, weights_t), valid, W, H,
            jit_)
        return setup_t, weights_t

    setup_t, weights_t = bench("clip+setup", jax.jit(clip_setup), clip_o)

    binned = bench("bin_triangles", jax.jit(
        lambda s: RS.bin_triangles_t(s.bbox, s.valid, W, H, 8, 128,
                                     cap)), setup_t)
    pair_tri, seg_starts, seg_counts, overflow = binned
    print("overflow", int(overflow),
          "real pairs", int(np.asarray(seg_counts).sum()))

    def rows(s, wt, c9):
        cattrs_t = RR.corner_attributes_pre_t(c9, wt, T)
        return RR.build_tri_rows_t(
            s, cattrs_t, jnp.concatenate([tri_mat, tri_mat]))

    tri_rows = bench("cattr+tri_rows", jax.jit(rows), setup_t, weights_t,
                     cattr9)

    pair_setup = bench("expand_pair_rows", jax.jit(
        RR.expand_pair_rows), tri_rows, pair_tri)

    bench("gbuf kernel", jax.jit(
        lambda ps, ss, sc: GK.gbuf_tiles(
            ps, ss, sc, None, None, width=W, height=H)),
        pair_setup, seg_starts, seg_counts)
    # visibility-only walk = "pass 1" of a deferred-resolve two-pass
    # scheme (latch depth+id only; 13 scalar loads + ~22 vec ops per pair
    # vs the merged kernel's 44 loads + ~53 ops)
    from vkr_tpu.raster import kernel as RK
    bench("visibility kernel", jax.jit(
        lambda ps, ss, sc: RK.rasterize_tiles(
            ps, ss, sc, None, width=W, height=H)),
        pair_setup, seg_starts, seg_counts)
    # round-5 note: a front-to-back (early-z break) variant was measured
    # here and reverted — kernel delta ~0 (skippable pairs 1.2%, see
    # experiments/earlyz_potential.py) vs +26 ms of sort+gather.


if __name__ == "__main__":
    main()
