"""Trustworthy march timing: K perturbed-input reps inside ONE jit call
(defeats both per-call dispatch noise and XLA CSE), 4-byte readback.
Per-rep cost = (t(K) - t(1)) / (K - 1).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/march_inner.py [cap]
"""

from __future__ import annotations

import sys
import time


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform(), "cap:", cap)
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
    print(f"trace grid {h}x{w}", flush=True)

    def reps(k):
        def f(o_in):
            acc = jnp.zeros((), jnp.float32)
            for i in range(k):
                oo = o_in.at[..., 2].add(1e-12 * (i + 1))
                _, _, it = hierarchical_march_pallas(
                    mips, oo, d, view_vec, w0, params, cap)
                acc = acc + it.sum().astype(jnp.float32)
            return acc
        return jax.jit(f)

    f1, f4 = reps(1), reps(4)
    for name, f in (("k1", f1), ("k4", f4)):
        t0 = time.time()
        np.asarray(f(o))
        print(f"{name} compile+first {time.time()-t0:.0f}s", flush=True)
    for name, f in (("k1", f1), ("k4", f4)):
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(o))
            ts.append((time.time() - t0) * 1e3)
        print(f"{name}: median {np.median(ts):.1f} ms  min {min(ts):.1f}",
              flush=True)
        if name == "k1":
            t1 = np.median(ts)
        else:
            print(f"per-rep (k4-k1)/3 = {(np.median(ts)-t1)/3.0:.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
