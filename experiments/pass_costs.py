"""K-rep differential cost of every NON-march pass in the fused frame.

The bench segments give mid=200.5 / tail=55 ms; march_inner pins the
march at ~136 ms — this harness attributes the remaining ~120 ms
across hiz / SSR filter / SSR blur / probes / GTAO main+filter+accum /
shading / TAA with the same trustworthy pattern as march_inner.py: K
perturbed-input reps inside ONE jit, 4-byte readback, slope = per-rep
cost (defeats tunnel dispatch noise AND XLA CSE).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/pass_costs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform(), flush=True)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core import registry
    from vkr_tpu.core.framestate import FrameState
    from vkr_tpu.frame import (Tuning, _inv4, _normal_mat4, camera_frame,
                               frame_mid)
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes import gtao as _gtao
    from vkr_tpu.passes import ssr as _ssr
    from vkr_tpu.passes import taa as _taa
    from vkr_tpu.passes.downsample import build_hiz
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.passes.shading import ShadingParams
    from vkr_tpu.frame import build_ssr_resources
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    t = Tuning.of(cfg)
    scene = upload_scene(sponza_colonnade_scene(
        columns=24, tessellation=80,
        tex_size=int(os.environ.get("BENCH_TEX", "1024"))))
    ssr_res = build_ssr_resources(1024)
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 1)
    state = FrameState.initial(H, W)
    state = state.replace(frame_index=jnp.asarray(1, jnp.int32))

    gb = jax.jit(lambda s, c: render_gbuffer(
        s, c.mvp, c.prev_mvp, c.jitter, width=W, height=H))(scene, cam)
    # one full mid to get realistic intermediates for the tail
    mid = jax.jit(lambda g, st, c: frame_mid(
        g, st, c, ssr_res, cfg))(gb, state, cam)

    hiz = jax.jit(build_hiz)(gb.depth, gb.normal, gb.velocity)
    depth_half = hiz.mips[0]
    nm = _normal_mat4(cam.view)
    inv_view = _inv4(cam.view)
    prev_inv_view = _inv4(cam.prev_view)
    sp = _ssr.SSRParams(normal_mat=nm, fovy=cfg.camera.fovy,
                        aspect=cfg.aspect, znear=cfg.camera.znear,
                        zfar=cfg.camera.zfar,
                        max_roughness=t.ssr_max_roughness)
    # eager: pack_pyramid's NamedTuple carries static ints that a jit
    # boundary would turn into device arrays
    pyr = _ssr.pack_pyramid(hiz.mips)
    frame_random = state.frame_index % t.ssr_temporal_rays
    # pyr carries static metadata (mip widths) — close over it, don't
    # pass it through the jit boundary (ints become tracers there).
    rays, ssr_occ = jax.jit(lambda nh, mat: registry.get("sssr_trace")(
        pyr, nh, mat, ssr_res.pdf_lut, sp, frame_random, ssr_res.halton,
        max_iterations=cfg.ssr.max_iterations, use_kernel=True))(
        hiz.normal_half, gb.material)
    reflections = jax.jit(lambda *a: registry.get("sssr_filter")(
        *a, flags_normalize=cfg.ssr.normalize_filter,
        flags_bilateral=cfg.ssr.bilateral_filter))(
        rays, depth_half, gb.albedo, hiz.normal_half, gb.material, sp)
    blur_params = _ssr.SSRBlurParams(
        inverse_camera=inv_view, prev_inverse_camera=prev_inv_view,
        fovy=cfg.camera.fovy, aspect=cfg.aspect, znear=cfg.camera.znear,
        zfar=cfg.camera.zfar, max_roughness=t.ssr_max_roughness,
        accumulate=cfg.ssr.accumulate, disable_blur=not cfg.ssr.use_blur)
    gp = _gtao.GTAOParams(normal_mat=nm, fovy=cfg.camera.fovy,
                          aspect=cfg.aspect, znear=cfg.camera.znear,
                          zfar=cfg.camera.zfar)
    base_angle = _gtao.frame_base_angle(state.frame_index)
    raw_ao = jax.jit(lambda *a: registry.get("gtao_main_mis")(
        *a, weight_ratio=t.weight_ratio,
        reflections_only=cfg.gtao.reflections_only, use_kernel=True))(
        depth_half, hiz.normal_half, gb.material, ssr_res.pdf_lut,
        ssr_occ, gp, base_angle)
    filtered_ao = jax.jit(lambda *a: registry.get("gtao_filter")(
        *a, cfg.camera.znear, cfg.camera.zfar))(depth_half, raw_ao)
    ap = _gtao.GTAOAccumParams(
        inverse_camera=inv_view, prev_inverse_camera=prev_inv_view,
        mvp=cam.mvp, fovy=cfg.camera.fovy, aspect=cfg.aspect,
        znear=cfg.camera.znear, zfar=cfg.camera.zfar)
    shade_params = ShadingParams(
        inverse_camera=inv_view, fovy=cfg.camera.fovy, aspect=cfg.aspect,
        znear=cfg.camera.znear, zfar=cfg.camera.zfar,
        min_roughness=t.shade_min_roughness,
        max_roughness=t.shade_max_roughness, show_ao=cfg.show_ao_only)
    color = jax.jit(lambda g, occ, refl: registry.get("defered_shading")(
        g, shade_params, occlusion=occ, reflections=refl,
        brdf_lut=ssr_res.brdf_lut, depth_half=depth_half))(
        gb, mid["occlusion"], mid["ssr_blurred"])
    tp = _taa.TAAParams(
        inverse_camera=inv_view, prev_inverse_camera=prev_inv_view,
        fovy=cfg.camera.fovy, aspect=cfg.aspect,
        znear=cfg.camera.znear, zfar=cfg.camera.zfar)

    REPS = 5

    def diff(name, fn, x, *rest):
        """per-rep cost of fn(x, *rest) by the K-rep differential."""
        def runner(k):
            def f(x_in):
                acc = jnp.zeros((), jnp.float32)
                for r in range(k):
                    xr = x_in + jnp.asarray(r, x_in.dtype) * jnp.asarray(
                        1e-12, x_in.dtype)
                    out = fn(xr, *rest)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
                return acc

            g = jax.jit(f)
            _ = np.asarray(g(x))  # compile+warm
            t0 = time.time()
            for _ in range(REPS):
                _ = np.asarray(g(x))
            return (time.time() - t0) / REPS

        t1 = runner(1)
        t4 = runner(4)
        ms = (t4 - t1) / 3.0 * 1e3
        print(f"{name:18s} {ms:8.2f} ms/rep  (k1 {t1*1e3:.1f} "
              f"k4 {t4*1e3:.1f})", flush=True)

    diff("build_hiz", lambda d: build_hiz(d, gb.normal, gb.velocity),
         gb.depth)
    diff("sssr_filter", lambda r: registry.get("sssr_filter")(
        r, depth_half, gb.albedo, hiz.normal_half, gb.material, sp,
        flags_normalize=cfg.ssr.normalize_filter,
        flags_bilateral=cfg.ssr.bilateral_filter), rays)
    diff("sssr_blur", lambda r: registry.get("sssr_blur")(
        r, depth_half, hiz.normal_half, gb.material, state.ssr_history,
        hiz.velocity_half, state.prev_depth_half, blur_params,
        use_kernel_gather=True), reflections)
    diff("gtao_main_mis", lambda d: registry.get("gtao_main_mis")(
        d, hiz.normal_half, gb.material, ssr_res.pdf_lut, ssr_occ, gp,
        base_angle, weight_ratio=t.weight_ratio,
        reflections_only=cfg.gtao.reflections_only, use_kernel=True),
        depth_half)
    # NOTE: perturb an input the pass's GATHER path depends on — a pass
    # whose window gathers are invariant to the perturbed input gets
    # them CSE'd/hoisted across the K reps and reads near-zero (first
    # run of this harness measured taa_resolve "0.33 ms" by perturbing
    # color while the history reprojection depends on velocity/history).
    diff("gtao_filter", lambda d: registry.get("gtao_filter")(
        d, raw_ao, cfg.camera.znear, cfg.camera.zfar), depth_half)
    diff("gtao_accumulate", lambda v: registry.get("gtao_accumulate")(
        depth_half, state.prev_depth_half, filtered_ao, v,
        state.gtao_accum, ap, state.frame_index == 0,
        use_kernel_gather=True), hiz.velocity_half)
    diff("defered_shading", lambda d: registry.get("defered_shading")(
        gb._replace(depth=d), shade_params, occlusion=mid["occlusion"],
        reflections=mid["ssr_blurred"],
        brdf_lut=ssr_res.brdf_lut, depth_half=depth_half),
        gb.depth)
    diff("taa_resolve", lambda v: registry.get("taa_resolve")(
        state.taa_history, state.prev_depth, gb.depth, v, color,
        tp, use_kernel_gather=True), gb.velocity)
    diff("sssr_blur/vel", lambda v: registry.get("sssr_blur")(
        reflections, depth_half, hiz.normal_half, gb.material,
        state.ssr_history, v, state.prev_depth_half, blur_params,
        use_kernel_gather=True), hiz.velocity_half)

    # whole-tail pair under one perturbed dependency (everything in
    # shading+taa depends on gb.depth) — the trustworthy tail number
    def tail(d):
        gb2 = gb._replace(depth=d)
        col = registry.get("defered_shading")(
            gb2, shade_params, occlusion=mid["occlusion"],
            reflections=mid["ssr_blurred"], brdf_lut=ssr_res.brdf_lut,
            depth_half=depth_half)
        return registry.get("taa_resolve")(
            state.taa_history, state.prev_depth, gb2.depth, gb.velocity,
            col, tp, use_kernel_gather=True)

    diff("tail(shade+taa)", tail, gb.depth)


if __name__ == "__main__":
    main()
