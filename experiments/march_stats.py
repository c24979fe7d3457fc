"""Measure SSR march ray displacement vs iteration on the bench scene.

Sizes the round-3 windowed phase-B march: per-tile multi-mip VMEM
windows only pay off if most rays stay within a bounded distance of
their launch tile through iterations 16..48.  Prints, at several
iteration caps, the distribution of |dx|, |dy| (mip-0 texels at the
half-res trace grid) from the launch pixel, and the fraction of rays
still alive.

    PYTHONPATH=/root/repo python experiments/march_stats.py
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
    from vkr_tpu.frame import (_inv4, _normal_mat4, build_ssr_resources,
                               camera_frame)
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.mathlib.octahedral import decode_normal
    from vkr_tpu.mathlib.projection import (project_view_vec,
                                            reconstruct_view_vec)
    from vkr_tpu.passes import ssr as S
    from vkr_tpu.passes.downsample import build_hiz
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.passes.sampling import screen_uv_grid
    from vkr_tpu.passes.ssr_march import hierarchical_march_pallas
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24, tessellation=80,
                                                tex_size=256))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    gb = jax.jit(lambda s, c: render_gbuffer(
        s, c.mvp, c.prev_mvp, c.jitter, width=W, height=H))(scene, cam)
    hiz = jax.jit(build_hiz)(gb.depth, gb.normal, gb.velocity)
    mips = list(hiz.mips)
    h, w = mips[0].shape
    params = S.SSRParams(normal_mat=_normal_mat4(cam.view),
                         fovy=cfg.camera.fovy, aspect=cfg.aspect,
                         znear=cfg.camera.znear, zfar=cfg.camera.zfar)

    # mirror rays off the G-buffer (deterministic, roughness-0)
    pyr = S.pack_pyramid(mips)
    uv = screen_uv_grid(h, w)
    depth = pyr.flat[: h * w].reshape(h, w)
    n = decode_normal(hiz.normal_half)
    nm = jnp.asarray(params.normal_mat)
    n = n @ nm[:3, :3].T
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-20)
    view_vec = reconstruct_view_vec(uv, depth, params.fovy, params.aspect,
                                    params.znear, params.zfar)
    r = view_vec - 2.0 * (view_vec * n).sum(-1, keepdims=True) * n
    o = project_view_vec(view_vec + 0.001 * n, params.fovy, params.aspect,
                         params.znear, params.zfar)
    o = o.at[..., 2].add(-0.0001)
    d = project_view_vec(view_vec + r, params.fovy, params.aspect,
                         params.znear, params.zfar) - o
    scale = (1.0 - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-20,
                                          1e-20, d[..., 2])
    d = d * scale[..., None]
    w0 = -view_vec / jnp.linalg.norm(view_vec, axis=-1,
                                     keepdims=True).clip(1e-20)

    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
    for cap in (16, 24, 32, 48, 80):
        t0 = time.time()
        pos, hor, iters = jax.jit(
            lambda caps=cap: hierarchical_march_pallas(
                mips, o, d, view_vec, w0, params, caps)
        )()
        pos = np.asarray(pos)
        it = np.asarray(iters)
        dt = time.time() - t0
        alive = it > cap  # retired rays have iters <= cap
        dx = np.abs(pos[..., 0] * w - np.asarray(xs))
        dy = np.abs(pos[..., 1] * h - np.asarray(ys))
        fin = np.isfinite(dx) & np.isfinite(dy)
        dx = np.where(fin, dx, 1e9)
        dy = np.where(fin, dy, 1e9)
        q = lambda a: np.percentile(a, [50, 90, 95, 99])
        print(f"cap={cap:3d} alive={alive.mean():.3f}  "
              f"dx p50/90/95/99={np.round(q(dx), 1)}  "
              f"dy={np.round(q(dy), 1)}  ({dt:.0f}s)", flush=True)
        # escape-rate estimate for candidate windows (rays needing
        # fetches beyond the margin at mips 0..3; coarse-mip fetches
        # always hit the global smalls table)
        for my, mx in ((32, 128), (48, 128), (64, 160), (96, 224)):
            esc = ((dx > mx) | (dy > my)).mean()
            print(f"    margin (+-{my} rows, +-{mx} cols): "
                  f"beyond = {esc:.4f}")


if __name__ == "__main__":
    main()
