"""Parity measurement: Pallas pipeline vs jnp oracle, per G-buffer channel
and final frame (PSNR).

The BASELINE configs call for PSNR >= 40 dB per pass against reference
renders; without a Vulkan device, the measurable analog is the optimized
Pallas path against the straightforward jnp oracle path (both implement the
reference algorithms; the oracle has no Mosaic/layout constraints).

    VKR_PLATFORM=cpu python -m vkr_tpu.tools.parity --scene suzanne --size 256
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="suzanne")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--tex-size", type=int, default=128)
    parser.add_argument("--lut-size", type=int, default=128)
    parser.add_argument("--frames", type=int, default=3)
    args = parser.parse_args(argv)

    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core.framestate import FrameState
    from vkr_tpu.frame import (build_ssr_resources, camera_frame,
                               render_frame)
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.tools.render import load_preset

    cfg = RenderConfig(width=args.size, height=args.size)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, ssr=dataclasses.replace(cfg.ssr, max_iterations=32)
    )
    scene_cpu, preset = load_preset(args.scene, args.tex_size)
    scene = upload_scene(scene_cpu)
    ssr_res = build_ssr_resources(args.lut_size)
    view = look_at(preset["eye"], preset["center"], (0, -1, 0))
    interpret = jax.default_backend() != "tpu"

    results = {}
    outs = {}
    for mode, use_pallas in (("pallas", True), ("oracle", False)):
        state = FrameState.initial(cfg.height, cfg.width)
        f = jax.jit(
            lambda s, st, c, up=use_pallas: render_frame(
                s, st, c, ssr_res, cfg, use_pallas=up,
                interpret=interpret,
            )
        )
        for i in range(args.frames):
            cam = camera_frame(cfg, view, view, i)
            color, state, aux = f(scene, state, cam)
        g = aux["gbuffer"]
        outs[mode] = dict(
            albedo=g.albedo, normal=g.normal, depth=g.depth,
            velocity=g.velocity, material=g.material,
            ao=aux["ao"], ssr=aux["ssr"], color=color,
        )

    for key in outs["pallas"]:
        results[key] = round(psnr(outs["pallas"][key],
                                  outs["oracle"][key]), 2)
    print(json.dumps({"psnr_pallas_vs_oracle_db": results}))
    return results


if __name__ == "__main__":
    main()
