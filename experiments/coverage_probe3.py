"""CPU repro of the frame>=12 coverage collapse: same hall geometry
(hall_l=60), same camera orbit, small res + cheap textures.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
       python experiments/coverage_probe3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vkr_tpu.core.platform import ensure_platform


def main():
    ensure_platform()
    import jax
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core import registry
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.scene.procedural import colonnade_scene

    width, height = 512, 256
    cfg = RenderConfig(width=width, height=height)
    interpret = jax.default_backend() != "tpu"

    scene_cpu = colonnade_scene(columns=24, tessellation=80, tex_size=64)
    scene = upload_scene(scene_cpu)
    print(f"tris: {scene.tri_opaque.shape[0] + scene.tri_masked.shape[0]}")

    eye = np.array([-18.0, 2.2, -2.0], np.float32)
    center = np.array([4.0, 1.8, 0.5], np.float32)

    def view_at(i):
        ang = 0.02 * i
        rot = np.array(
            [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
             [np.sin(ang), 0, np.cos(ang)]], np.float32)
        return look_at(center + rot @ (eye - center), center, (0, -1, 0))

    jit_gbuf = jax.jit(lambda s, c: registry.get("gbuf_opaque_taa")(
        s, c.mvp, c.prev_mvp, c.jitter, width=cfg.width,
        height=cfg.height, quantize=cfg.quantize_formats,
        use_pallas=True, interpret=interpret,
        mask_peel_layers=cfg.raster.mask_peel_layers,
        trilinear=cfg.trilinear_textures,
    ))

    for i in range(1, 16):
        cam = camera_frame(cfg, view_at(i), view_at(i - 1), i)
        gb = jit_gbuf(scene, cam)
        d = np.asarray(gb.depth)
        cov = (d < 1.0).mean()
        print(f"frame {i:2d}: coverage {cov:.4f}")


if __name__ == "__main__":
    main()
