"""Measure the static pre-expansion fast path vs the generic gather path
for the full G-buffer render (queued reps, one readback sync).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/gbuf_fast_path.py
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
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(
        columns=24, tessellation=80,
        tex_size=int(os.environ.get("BENCH_TEX", "1024"))))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 1)
    peel = int(os.environ.get("PEEL", "2"))
    reps = 8

    def bench(name, scn):
        f = jax.jit(lambda s, c: render_gbuffer(
            s, c.mvp, c.prev_mvp, c.jitter, width=W, height=H,
            mask_peel_layers=peel))
        out = f(scn, cam)
        _ = np.asarray(out.depth[0, 0])
        t0 = time.time()
        for _ in range(reps):
            out = f(scn, cam)
        _ = np.asarray(out.depth[0, 0])
        print(f"{name:28s} {(time.time()-t0)/reps*1e3:9.2f} ms",
              flush=True)
        return out

    g_fast = bench(f"gbuffer fast (peel={peel})", scene)
    scene_gen = scene._replace(corner_world_o=None, corner_attr_o=None,
                               corner_world_m=None, corner_attr_m=None)
    g_gen = bench(f"gbuffer generic (peel={peel})", scene_gen)
    # The fast path's corner transform rounds ~1 ulp differently from
    # the generic in-graph world->clip fusion, and the SoA attribute
    # planes carry FMA-contraction noise (<= ~3e-4 uv worst-case,
    # diagnosed round 5: 9/32768 actual winner flips; everything else
    # is same-winner sampling noise at contrasty texels). Gate on
    # winner-flip-scale deltas only.
    npx = g_fast.depth.size
    for fld in ["albedo", "normal", "material", "velocity", "depth"]:
        a = np.asarray(getattr(g_fast, fld))
        b = np.asarray(getattr(g_gen, fld))
        nd = int((a != b).sum())
        print(f"  {fld:10s} maxdev {float(np.abs(a - b).max()):.3e} "
              f"ndiff {nd} ({nd / a.size:.2%})")
        flips = (np.abs(a - b).reshape(npx, -1).max(-1) > 0.1).mean()
        assert flips < 0.005, (fld, flips)  # winner flips only


if __name__ == "__main__":
    main()
