"""K-rep differential cost of taa_resolve alone (fused-gather check).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/taa_cost.py
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
    from vkr_tpu.frame import _inv4
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes import taa as _taa

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    inv_view = _inv4(view)
    tp = _taa.TAAParams(
        inverse_camera=inv_view, prev_inverse_camera=inv_view,
        fovy=cfg.camera.fovy, aspect=cfg.aspect,
        znear=cfg.camera.znear, zfar=cfg.camera.zfar)
    k = jax.random.PRNGKey(0)
    hist = jax.random.uniform(k, (H, W, 3))
    pdepth = jax.random.uniform(jax.random.PRNGKey(1), (H, W))
    depth = jax.random.uniform(jax.random.PRNGKey(2), (H, W))
    vel = (jax.random.uniform(jax.random.PRNGKey(3), (H, W, 2)) - 0.5) \
        * 0.01
    color = jax.random.uniform(jax.random.PRNGKey(4), (H, W, 3))

    REPS = 5

    def runner(kk):
        def f(v):
            acc = jnp.zeros((), jnp.float32)
            for r in range(kk):
                vr = v + jnp.asarray(r, v.dtype) * 1e-12
                out = registry.get("taa_resolve")(
                    hist, pdepth, depth, vr, color, tp,
                    use_kernel_gather=True)
                acc = acc + out.reshape(-1)[0]
            return acc

        g = jax.jit(f)
        _ = np.asarray(g(vel))
        t0 = time.time()
        for _ in range(REPS):
            _ = np.asarray(g(vel))
        return (time.time() - t0) / REPS

    t1 = runner(1)
    t4 = runner(4)
    print(f"taa_resolve {((t4 - t1) / 3.0) * 1e3:.2f} ms/rep "
          f"(k1 {t1*1e3:.1f} k4 {t4*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
