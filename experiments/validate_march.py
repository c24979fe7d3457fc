"""Validate + time the round-3 2-phase windowed march on real TPU.

Compares hierarchical_march_pallas (phase W windowed + phase G global)
against the no-drop XLA oracle at bench-scene scale (1080p half-res
trace grid, mirror rays off the real colonnade G-buffer), then times
the Pallas march standalone (readback-synced; the axon tunnel ignores
block_until_ready).

    PYTHONPATH=/root/repo python experiments/validate_march.py
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
    MAX_IT = 80
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

    print(f"trace grid {h}x{w}, {len(mips)} mips, MAX_IT={MAX_IT}",
          flush=True)

    # ---- oracle (no-drop)
    t0 = time.time()
    pos_ref, hor_ref, it_ref = jax.jit(
        lambda: S._hierarchical_march(pyr, o, d, view_vec, w0, params,
                                      MAX_IT, compact_frac=0.0))()
    pos_ref = np.asarray(pos_ref)
    it_ref = np.asarray(it_ref)
    hor_ref = np.asarray(hor_ref)
    print(f"oracle done in {time.time()-t0:.0f}s", flush=True)

    # ---- pallas
    fn = jax.jit(lambda: hierarchical_march_pallas(
        mips, o, d, view_vec, w0, params, MAX_IT))
    t0 = time.time()
    pos_k, hor_k, it_k = fn()
    pos_k = np.asarray(pos_k)
    it_k = np.asarray(it_k)
    hor_k = np.asarray(hor_k)
    print(f"pallas compile+first in {time.time()-t0:.0f}s", flush=True)

    valid_ref = it_ref <= MAX_IT
    valid_k = it_k <= MAX_IT
    agree = (valid_ref == valid_k).mean()
    print(f"validity: ref {valid_ref.mean():.4f}  pallas "
          f"{valid_k.mean():.4f}  agreement {agree:.4f}", flush=True)
    both = valid_ref & valid_k
    if both.any():
        dp = np.abs(pos_k - pos_ref)[both]
        duv = dp[..., :2].max(-1)
        print(f"pos err (both-valid) p50/95/99 = "
              f"{np.percentile(duv, [50, 95, 99])}  (1 texel = "
              f"{1.0/w:.2e})", flush=True)
    dh = np.abs(hor_k - hor_ref)
    print(f"hor err p90/99 = {np.percentile(dh, [90, 99])}", flush=True)

    # ---- timing (synced via eager on-device sum + 4-byte pull; a full
    # (540,960) np.asarray costs ~94 ms of tunnel transfer)
    for _ in range(2):
        np.asarray(fn()[2].sum())
    reps = 5
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn()[2].sum())
        ts.append((time.time() - t0) * 1e3)
    print(f"pallas march standalone: median {np.median(ts):.1f} ms  "
          f"min {min(ts):.1f}  (reps {np.round(ts, 1)})", flush=True)


if __name__ == "__main__":
    main()
