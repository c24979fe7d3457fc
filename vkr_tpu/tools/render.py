"""Headless render CLI — the app/frame-loop analog (reference main.cpp).

Renders a scene through the pipeline and writes a PNG. Examples:

    JAX_PLATFORMS=cpu python -m vkr_tpu.tools.render --scene suzanne \
        --size 256 --out /tmp/frame.png --dump-dag
    python -m vkr_tpu.tools.render --scene colonnade --width 1920 \
        --height 1080 --frames 8 --out /tmp/frame.png
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

ASSETS = "/root/reference/assets/gltf"

SCENE_PRESETS = {
    "suzanne": {
        "path": f"{ASSETS}/suzanne/Suzanne.gltf",
        "eye": (0.0, 0.3, 2.6),
        "center": (0.0, 0.0, 0.0),
    },
    "fox": {
        "path": f"{ASSETS}/fox/Fox.gltf",
        "eye": (0.0, 90.0, -220.0),
        "center": (0.0, 50.0, 0.0),
    },
    "colonnade": {
        "eye": (-8.0, 2.2, -2.0),
        "center": (4.0, 1.8, 0.5),
    },
}


def load_preset(name: str, tex_size: int):
    from vkr_tpu.scene import colonnade_scene, load_scene

    preset = SCENE_PRESETS.get(name)
    if preset is None:
        preset = {"path": name, "eye": (0, 1, -3), "center": (0, 0, 0)}
    if "path" in preset:
        scene = load_scene(preset["path"], tex_size=tex_size)
    else:
        scene = colonnade_scene(columns=8, tessellation=24,
                                tex_size=tex_size)
    return scene, preset


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default="suzanne")
    parser.add_argument("--size", type=int, default=None,
                        help="square resolution shorthand")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--tex-size", type=int, default=256)
    parser.add_argument("--frames", type=int, default=1)
    parser.add_argument("--out", default="captures/frame.png")
    parser.add_argument("--dump-dag", action="store_true")
    parser.add_argument("--no-pallas", action="store_true")
    parser.add_argument("--albedo-only", action="store_true")
    args = parser.parse_args(argv)

    if args.size:
        args.width = args.height = args.size

    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core.graph import PassGraph, add_task
    from vkr_tpu.core.readback import save_png
    from vkr_tpu.mathlib import look_at, perspective
    from vkr_tpu.mathlib.transforms import inverse_rigid
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.passes.shading import ShadingParams, deferred_shading

    cfg = RenderConfig(width=args.width, height=args.height)
    scene_cpu, preset = load_preset(args.scene, args.tex_size)
    print(
        f"scene: {scene_cpu.num_triangles} triangles, "
        f"{len(scene_cpu.positions)} vertices, "
        f"{scene_cpu.tex_mips[0].shape[0]} textures"
    )
    scene = upload_scene(scene_cpu)

    view = look_at(preset["eye"], preset["center"], (0, -1, 0))
    proj = perspective(cfg.camera.fovy, cfg.aspect, cfg.camera.znear,
                       cfg.camera.zfar)
    vp = proj @ view

    interpret = jax.default_backend() != "tpu"

    def frame(scene_in, vp_in):
        gbuf = add_task(
            "GbufferPass",
            lambda: render_gbuffer(
                scene_in, vp_in, vp_in, jnp.zeros(2, jnp.float32),
                width=cfg.width, height=cfg.height,
                use_pallas=not args.no_pallas, interpret=interpret,
            ),
        )
        params = ShadingParams(
            inverse_camera=jnp.asarray(inverse_rigid(view)),
            fovy=cfg.camera.fovy, aspect=cfg.aspect,
            znear=cfg.camera.znear, zfar=cfg.camera.zfar,
        )
        color = add_task(
            "DeferedShading", deferred_shading, gbuf, params
        )
        return gbuf, color

    if args.dump_dag:
        # Abstract trace: records the pass DAG without any device work.
        graph = PassGraph()
        with graph.recording():
            jax.eval_shape(frame, scene, jnp.zeros((4, 4), jnp.float32))
        print(graph.dump())

    jitted = jax.jit(frame)
    t0 = time.perf_counter()
    gbuf, color = jax.block_until_ready(jitted(scene, jnp.asarray(vp)))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(max(args.frames - 1, 0)):
        t0 = time.perf_counter()
        gbuf, color = jax.block_until_ready(jitted(scene, jnp.asarray(vp)))
        times.append(time.perf_counter() - t0)
    covered = float(np.mean(np.asarray(gbuf.depth) < 1.0))
    print(f"coverage: {covered:.3f}  compile+first: {compile_s*1e3:.1f} ms")
    if times:
        print(f"steady frame: {np.median(times)*1e3:.2f} ms")

    out = np.asarray(color if not args.albedo_only else gbuf.albedo[..., :3])
    save_png(out, args.out, srgb_encode=True)
    print("saved", args.out)


if __name__ == "__main__":
    main()
