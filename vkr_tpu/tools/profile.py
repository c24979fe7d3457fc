"""Per-pass wall-clock profiler (the RenderDoc-label analog, SURVEY.md
§5.1): times each pass standalone with readback-synced loops.

    python -m vkr_tpu.tools.profile --width 1920 --height 1080
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="colonnade",
                        choices=["colonnade", "sponza"])
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--columns", type=int, default=16)
    parser.add_argument("--tessellation", type=int, default=64)
    parser.add_argument("--tex-size", type=int, default=512)
    parser.add_argument("--lut-size", type=int, default=1024)
    parser.add_argument("--ssr-iters", type=int, default=80)
    parser.add_argument("--reps", type=int, default=8)
    args = parser.parse_args(argv)

    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core.framestate import FrameState
    from vkr_tpu.frame import (_inv4, _normal_mat4, build_ssr_resources,
                               camera_frame)
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes import gtao as G
    from vkr_tpu.passes import ssr as S
    from vkr_tpu.passes import taa as T
    from vkr_tpu.passes.downsample import build_hiz
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.passes.shading import ShadingParams, deferred_shading
    from vkr_tpu.scene import colonnade_scene
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = args.width, args.height
    cfg = RenderConfig(width=W, height=H)
    if args.scene == "sponza":
        scene_cpu = sponza_colonnade_scene(columns=24, tessellation=80,
                                           tex_size=args.tex_size)
    else:
        scene_cpu = colonnade_scene(columns=args.columns,
                                    tessellation=args.tessellation,
                                    tex_size=args.tex_size)
    scene = upload_scene(scene_cpu)
    res = build_ssr_resources(args.lut_size)
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    state = FrameState.initial(H, W)
    interpret = jax.default_backend() != "tpu"

    def bench(name, f, *a):
        t0 = time.time()
        out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        c = time.time() - t0
        t0 = time.time()
        for _ in range(args.reps):
            out = f(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        print(f"{name:22s} {(time.time()-t0)/args.reps*1e3:9.2f} ms"
              f"   (compile {c:.0f}s)", flush=True)
        return out

    gb = bench("gbuffer", jax.jit(
        lambda s, c: render_gbuffer(s, c.mvp, c.prev_mvp, c.jitter,
                                    width=W, height=H,
                                    interpret=interpret)), scene, cam)
    hiz = bench("hiz", jax.jit(build_hiz), gb.depth, gb.normal,
                gb.velocity)
    dh = hiz.mips[0]
    nm = _normal_mat4(cam.view)
    inv = _inv4(cam.view)
    sp = S.SSRParams(normal_mat=nm, fovy=cfg.camera.fovy,
                     aspect=cfg.aspect, znear=cfg.camera.znear,
                     zfar=cfg.camera.zfar)
    mips = tuple(hiz.mips)

    def trace_fn(nh, mat, fr):
        return S.ssr_trace(S.pack_pyramid(mips), nh, mat, res.pdf_lut,
                           sp, fr, res.halton,
                           max_iterations=args.ssr_iters,
                           use_kernel=True, interpret=interpret)

    tr = bench("ssr_trace", jax.jit(trace_fn), hiz.normal_half,
               gb.material, jnp.asarray(0, jnp.int32))
    refl = bench("ssr_filter", jax.jit(
        lambda r, d, a, nh, m: S.ssr_filter(r, d, a, nh, m, sp)),
        tr[0], dh, gb.albedo, hiz.normal_half, gb.material)
    bp = S.SSRBlurParams(inverse_camera=inv, prev_inverse_camera=inv,
                         fovy=cfg.camera.fovy, aspect=cfg.aspect,
                         znear=cfg.camera.znear, zfar=cfg.camera.zfar)
    bench("ssr_blur", jax.jit(
        lambda r, d, nh, m, h2, v, pd: S.ssr_blur(
            r, d, nh, m, h2, v, pd, bp, use_kernel_gather=True,
            interpret=interpret)),
        refl, dh, hiz.normal_half, gb.material, state.ssr_history,
        hiz.velocity_half, state.prev_depth_half)
    gp = G.GTAOParams(normal_mat=nm, fovy=cfg.camera.fovy,
                      aspect=cfg.aspect, znear=cfg.camera.znear,
                      zfar=cfg.camera.zfar)
    raw = bench("gtao_window", jax.jit(
        lambda d, nh, b: G.gtao_main_window(d, nh, gp, b,
                                            interpret=interpret)),
        dh, hiz.normal_half, jnp.asarray(0.3))
    filt = bench("gtao_filter", jax.jit(
        lambda d, r: G.gtao_filter(d, r, cfg.camera.znear,
                                   cfg.camera.zfar)), dh, raw)
    ap = G.GTAOAccumParams(inverse_camera=inv, prev_inverse_camera=inv,
                           mvp=cam.mvp, fovy=cfg.camera.fovy,
                           aspect=cfg.aspect, znear=cfg.camera.znear,
                           zfar=cfg.camera.zfar)
    acc = bench("gtao_accum", jax.jit(
        lambda d, pd, f2, v, h2: G.gtao_accumulate(
            d, pd, f2, v, h2, ap, jnp.asarray(False),
            use_kernel_gather=True, interpret=interpret)),
        dh, state.prev_depth_half, filt, hiz.velocity_half,
        state.gtao_accum)
    shp = ShadingParams(inverse_camera=inv, fovy=cfg.camera.fovy,
                        aspect=cfg.aspect, znear=cfg.camera.znear,
                        zfar=cfg.camera.zfar)
    col = bench("shading", jax.jit(
        lambda g, o, r, pd: deferred_shading(
            g, shp, occlusion=o, reflections=r, brdf_lut=res.brdf_lut,
            depth_half=pd)),
        gb, acc[..., 0], state.ssr_history, dh)
    tp = T.TAAParams(inverse_camera=inv, prev_inverse_camera=inv,
                     fovy=cfg.camera.fovy, aspect=cfg.aspect,
                     znear=cfg.camera.znear, zfar=cfg.camera.zfar)
    bench("taa", jax.jit(
        lambda h2, hd, cd, v, c: T.taa_resolve(
            h2, hd, cd, v, c, tp, use_kernel_gather=True,
            interpret=interpret)),
        state.taa_history, state.prev_depth, gb.depth, gb.velocity, col)


if __name__ == "__main__":
    main()
