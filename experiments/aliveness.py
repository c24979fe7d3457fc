"""Aliveness curve of the SSR march on the enclosed bench hall.

One no-drop march (compact_frac=1.0, cap 80) returns per-ray retire
iterations; alive(i) = fraction with iters > i gives the ENTIRE curve
in a single run — this is what the phase-B compaction capacity schedule
(passes/ssr_march.py seg_fracs) must cover with margin. Runs on CPU via
the pure-XLA replicas (same numerics as the compiled kernels, incl. the
bf16 hi/lo tables) or on TPU.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python experiments/aliveness.py [scale]

scale (default 2): render at 1920/scale x 1080/scale. The curve is
resolution-stable (it is a property of the scene geometry and the
hi-Z march semantics), so scale 2 is fine for the fit; use scale 1 on
TPU for the exact bench workload.
"""

from __future__ import annotations

import sys
import time


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.frame import _normal_mat4, camera_frame
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

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    W, H = 1920 // scale, 1080 // scale
    W, H = (W // 256) * 256, (H // 16) * 16  # keep tile-aligned
    interpret = jax.default_backend() != "tpu"
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24,
                                                tessellation=80,
                                                tex_size=64))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    gb = jax.jit(lambda s, c: render_gbuffer(
        s, c.mvp, c.prev_mvp, c.jitter, width=W, height=H,
        use_pallas=not interpret, interpret=interpret))(scene, cam)
    hiz = jax.jit(build_hiz)(gb.depth, gb.normal, gb.velocity)
    mips = list(hiz.mips)
    h, w = mips[0].shape
    params = S.SSRParams(normal_mat=_normal_mat4(cam.view),
                         fovy=cfg.camera.fovy, aspect=cfg.aspect,
                         znear=cfg.camera.znear, zfar=cfg.camera.zfar)

    # deterministic mirror rays off the G-buffer (march_stats.py setup)
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
    scale_z = (1.0 - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-20,
                                            1e-20, d[..., 2])
    d = d * scale_z[..., None]
    w0 = -view_vec / jnp.linalg.norm(view_vec, axis=-1,
                                     keepdims=True).clip(1e-20)

    cap = 80
    t0 = time.time()
    pos, hor, iters = jax.jit(lambda: hierarchical_march_pallas(
        mips, o, d, view_vec, w0, params, cap, compact_frac=1.0,
        interpret=interpret))()
    it = np.asarray(iters)
    print(f"march ({h}x{w}, no-drop, cap {cap}): "
          f"{time.time() - t0:.0f}s", flush=True)

    # retired rays have iters <= cap; invalid/oob keep cap+1 but are
    # NOT alive work — count them separately
    valid = it <= cap
    print(f"valid-hit fraction: {valid.mean():.4f}")
    alive = np.where(valid, it, 0)
    total = it.size
    print("iter  alive-frac  (rays still marching after iteration i)")
    for i in (8, 16, 24, 32, 40, 48, 56, 64, 72, 79):
        frac = (alive > i).mean() + (~valid).mean()
        print(f"{i:4d}  {frac:.4f}")
    # tile-iteration cost of the CURRENT schedule vs this curve
    n_px = total
    sched = [(16, 32, 1.0), (32, 48, 0.5), (48, 80, 0.2)]
    cur = sum((e - s) * f * n_px / 1024 for s, e, f in sched)
    print(f"current schedule tile-iters: {cur:.0f}")
    for s, e, f in sched:
        a = (alive > s).mean() + (~valid).mean()
        ok = "OK " if f >= a else "DROPS"
        print(f"  seg [{s},{e}) cap {f:.2f} vs alive {a:.4f} {ok}")


if __name__ == "__main__":
    main()
