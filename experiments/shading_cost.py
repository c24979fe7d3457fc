"""Differential split of defered_shading: full vs no-BRDF-LUT vs
no-upsample (perturbing gb.depth so nothing hoists).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/shading_cost.py
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
    from vkr_tpu.frame import _inv4, build_ssr_resources
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import GBuffer
    from vkr_tpu.passes.shading import ShadingParams

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    inv_view = _inv4(view)
    res = build_ssr_resources(1024)
    k = jax.random.PRNGKey(0)
    gb = GBuffer(
        albedo=jax.random.uniform(k, (H, W, 4)),
        normal=jax.random.uniform(jax.random.PRNGKey(1), (H, W, 2)),
        material=jax.random.uniform(jax.random.PRNGKey(2), (H, W, 4)),
        velocity=jnp.zeros((H, W, 2)),
        depth=jax.random.uniform(jax.random.PRNGKey(3), (H, W)),
        overflow=jnp.zeros((), jnp.int32),
    )
    occ = jax.random.uniform(jax.random.PRNGKey(4), (H // 2, W // 2))
    refl = jax.random.uniform(jax.random.PRNGKey(5), (H // 2, W // 2, 3))
    dh = jax.random.uniform(jax.random.PRNGKey(6), (H // 2, W // 2))
    sp = ShadingParams(
        inverse_camera=inv_view, fovy=cfg.camera.fovy, aspect=cfg.aspect,
        znear=cfg.camera.znear, zfar=cfg.camera.zfar)

    REPS = 5

    def diff(name, kw):
        def runner(kk):
            def f(d):
                acc = jnp.zeros((), jnp.float32)
                for r in range(kk):
                    g2 = gb._replace(depth=d + r * jnp.asarray(
                        1e-12, jnp.float32))
                    out = registry.get("defered_shading")(g2, sp, **kw)
                    acc = acc + out.reshape(-1)[0]
                return acc

            g = jax.jit(f)
            _ = np.asarray(g(gb.depth))
            t0 = time.time()
            for _ in range(REPS):
                _ = np.asarray(g(gb.depth))
            return (time.time() - t0) / REPS

        t1, t4 = runner(1), runner(4)
        print(f"{name:24s} {(t4-t1)/3*1e3:7.2f} ms/rep "
              f"(k1 {t1*1e3:.1f} k4 {t4*1e3:.1f})", flush=True)

    full = dict(occlusion=occ, reflections=refl, brdf_lut=res.brdf_lut,
                depth_half=dh)
    diff("full", full)
    if os.environ.get("SHADING_SPLIT", "0") == "1":
        diff("no brdf_lut", dict(full, brdf_lut=None))
        diff("no occ/upsample", dict(occlusion=None, reflections=None,
                                     brdf_lut=None, depth_half=None))


if __name__ == "__main__":
    main()
