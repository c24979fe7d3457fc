"""Follow-up: save the frame-15 background mask as a PNG + overflow +
per-frame coverage sweep to find when/where dropout starts."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vkr_tpu.core.platform import ensure_platform


def main():
    ensure_platform()
    import jax
    import numpy as np
    from PIL import Image

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core import registry
    from vkr_tpu.frame import camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height)
    cfg = dataclasses.replace(
        cfg, ssr=dataclasses.replace(cfg.ssr, max_iterations=80)
    )
    interpret = jax.default_backend() != "tpu"

    scene_cpu = sponza_colonnade_scene(columns=24, tessellation=80,
                                       tex_size=1024)
    scene = upload_scene(scene_cpu)

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

    for i in (1, 5, 9, 12, 14, 15):
        cam = camera_frame(cfg, view_at(i), view_at(i - 1), i)
        gb = jit_gbuf(scene, cam)
        d = np.asarray(gb.depth)
        ov = int(np.asarray(gb.overflow))
        cov = (d < 1.0).mean()
        print(f"frame {i:2d}: coverage {cov:.4f} overflow {ov}")
        if i in (14, 15):
            m = (d >= 1.0).astype(np.uint8) * 255
            Image.fromarray(m).save(f"/tmp/bgmask_f{i}.png")
            # depth image (min-max normalized, fg only)
            dv = np.where(d < 1.0, d, np.nan)
            lo, hi = np.nanmin(dv), np.nanmax(dv)
            img = np.where(np.isnan(dv), 0,
                           255 * (dv - lo) / max(hi - lo, 1e-9))
            Image.fromarray(img.astype(np.uint8)).save(
                f"/tmp/depth_f{i}.png")
    print("masks saved to /tmp/bgmask_f14.png /tmp/bgmask_f15.png")


if __name__ == "__main__":
    main()
