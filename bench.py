"""Benchmark: full-pipeline frame time at 1920x1080 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 16.0 (the reference-rebuild target is <= 16 ms/frame
at 1080p on one v5e chip, BASELINE.md) — lower is better, < 1.0 meets it.

Scene: procedural colonnade at Sponza-like workload (the bundled Sponza
geometry blob is stripped from /root/reference; see
vkr_tpu/scene/procedural.py).

Per-pass-group timing breakdown goes to stderr (BENCH_BREAKDOWN=0 to
skip): the frame's three segments (G-buffer raster | hi-Z+SSR+GTAO |
shading+TAA) are jitted separately (frame.frame_mid / frame_tail) and
each is timed as R back-to-back async dispatches with ONE readback sync
(per-call sync through the axon tunnel carries ~35 ms noise; queued
dispatches amortize it to ~2.3 ms/call).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vkr_tpu.core.platform import ensure_platform


def _breakdown(scene, state, cam, ssr_res, cfg, interpret, reps=4):
    """Per-pass-group ms to stderr (BASELINE.json asks for raster / GTAO /
    SSR / TAA attribution): segment-jit the frame (G-buffer | frame_mid =
    hi-Z+SSR+GTAO | frame_tail = shading+TAA) and time R queued dispatches
    per segment with one readback sync."""
    import time as _time

    import jax
    import numpy as np

    from vkr_tpu.core import registry
    from vkr_tpu.frame import frame_mid, frame_tail

    jit_gbuf = jax.jit(lambda s, c: registry.get("gbuf_opaque_taa")(
        s, c.mvp, c.prev_mvp, c.jitter, width=cfg.width,
        height=cfg.height, quantize=cfg.quantize_formats,
        use_pallas=True, interpret=interpret,
        mask_peel_layers=cfg.raster.mask_peel_layers,
        trilinear=cfg.trilinear_textures,
    ))
    jit_mid = jax.jit(lambda gb, st, c: frame_mid(
        gb, st, c, ssr_res, cfg, use_pallas=True, interpret=interpret,
    ))
    jit_tail = jax.jit(lambda gb, m, st, c: frame_tail(
        gb, m, st, c, ssr_res, cfg, use_pallas=True, interpret=interpret,
    ))

    gbuf = jit_gbuf(scene, cam)
    mid = jit_mid(gbuf, state, cam)
    tail = jit_tail(gbuf, mid, state, cam)
    _ = np.asarray(tail[0][0, 0])  # sync compiles

    def timed(name, fn, sync):
        # One untimed warm rep per segment: the first execution of a fresh
        # executable through the tunnel can carry seconds of one-time
        # upload/dispatch cost (run-1 printed a 2389 ms "mid" because of
        # it) — never fold that into the per-rep number.
        _ = np.asarray(sync(fn()))
        out = None
        t0 = _time.time()
        for _i in range(reps):
            out = fn()
        _ = np.asarray(sync(out))
        ms = (_time.time() - t0) / reps * 1e3
        print(f"breakdown {name}: {ms:.1f} ms", file=sys.stderr)
        return ms

    total = 0.0
    total += timed("gbuffer(raster+tex)",
                   lambda: jit_gbuf(scene, cam), lambda o: o.depth[0, 0])
    total += timed("mid(hiz+ssr+gtao)",
                   lambda: jit_mid(gbuf, state, cam),
                   lambda o: o["occlusion"][0, 0])
    total += timed("tail(shading+taa)",
                   lambda: jit_tail(gbuf, mid, state, cam),
                   lambda o: o[0][0, 0])
    print(f"breakdown sum: {total:.1f} ms (segment dispatch adds "
          f"~2.3 ms/call; fused frame is the headline)", file=sys.stderr)


BENCH_EYE = (-18.0, 2.2, -2.0)
BENCH_CENTER = (4.0, 1.8, 0.5)


def bench_orbit_view(i: int):
    """Frame i's view matrix: a slow orbit of BENCH_EYE around
    BENCH_CENTER. The orbit rate must keep the eye INSIDE the hall: the
    walls sit at z = +-6 and the orbit radius is ~22.1, so eye z =
    0.5 - 22*sin(ang) - 2.5*cos(ang) crosses the z=-6 wall plane at
    ang ~= 0.185. The old 0.02*i rate pushed frames >= 10 OUTSIDE the
    enclosure (the view became the wall's exterior + background; coverage
    collapsed to 0.579 and under-stated the workload — round-2/3 medians
    carried ~6 such cheap frames). 0.01*i keeps all 16 frames inside
    (max ang 0.15 -> eye z -5.25). tests/test_raster.py guards this.
    """
    import numpy as np

    from vkr_tpu.mathlib import look_at

    eye = np.array(BENCH_EYE, np.float32)
    center = np.array(BENCH_CENTER, np.float32)
    ang = 0.01 * i
    rot = np.array(
        [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
         [np.sin(ang), 0, np.cos(ang)]], np.float32)
    return look_at(center + rot @ (eye - center), center, (0, -1, 0))


def _merge_flushed(times, median):
    """The tunnel occasionally flushes two queued frames on one readback:
    interval i doubles and interval i+1 collapses (the pair sums to ~2x
    the median). Merge such pairs into two equal halves so the reported
    distribution reflects the sustained rate instead of a min 16x below
    the median. Returns (cleaned, n_pairs_merged)."""
    out, merged, i = [], 0, 0
    while i < len(times):
        if i + 1 < len(times):
            a, b = times[i], times[i + 1]
            paired = (
                max(a, b) > 1.5 * median
                and min(a, b) < 0.5 * median
                and 0.7 < (a + b) / (2.0 * median) < 1.3
            )
            if paired:
                out.extend([(a + b) / 2.0] * 2)
                merged += 1
                i += 2
                continue
        out.append(times[i])
        i += 1
    return out, merged


def main():
    backend = ensure_platform()
    import dataclasses

    import jax
    import numpy as np

    from vkr_tpu.config import RenderConfig
    from vkr_tpu.core.framestate import FrameState
    from vkr_tpu.frame import (
        build_ssr_resources,
        camera_frame,
        render_frame,
    )
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.passes.gbuffer import upload_scene
    from vkr_tpu.scene import colonnade_scene

    res = os.environ.get("BENCH_RES", "1920x1080")
    width, height = (int(v) for v in res.split("x"))
    frames = int(os.environ.get("BENCH_FRAMES", "16"))
    # Fail BEFORE the (possibly ~20-min cold) compile: the pipelined loop
    # needs >= 2 frames, and the orbit leaves the hall enclosure past
    # frame 18 (bench_orbit_view docstring) which would only surface as a
    # coverage failure after the full run.
    if not 2 <= frames <= 18:
        print(f"ERROR: BENCH_FRAMES={frames} out of range [2, 18] "
              f"(>18 exits the hall enclosure; <2 has no timed frame)",
              file=sys.stderr)
        sys.exit(1)
    ssr_iters = int(os.environ.get("BENCH_SSR_ITERS", "80"))
    scene_kind = os.environ.get("BENCH_SCENE", "sponza_tex")
    tex_size = int(os.environ.get("BENCH_TEX", "1024"))

    cfg = RenderConfig(width=width, height=height)
    cfg = dataclasses.replace(
        cfg, ssr=dataclasses.replace(cfg.ssr, max_iterations=ssr_iters)
    )

    print(f"backend: {backend}", file=sys.stderr)
    t0 = time.time()
    if scene_kind == "sponza_tex":
        # Reference-scale workload: >=300k tris (vs Sponza's ~260k,
        # main.cpp:217-218) textured with Sponza's REAL 25-material /
        # 69-texture set at native 1024^2 (procedural.py).
        from vkr_tpu.scene.procedural import sponza_colonnade_scene

        scene_cpu = sponza_colonnade_scene(
            columns=24, tessellation=80, tex_size=tex_size
        )
    else:
        scene_cpu = colonnade_scene(columns=16, tessellation=64,
                                    tex_size=512)
    scene = upload_scene(scene_cpu)
    ssr_res = build_ssr_resources(1024)
    print(f"scene+LUTs: {time.time()-t0:.1f}s "
          f"({scene.tri_opaque.shape[0] + scene.tri_masked.shape[0]} tris)",
          file=sys.stderr)

    interpret = jax.default_backend() != "tpu"

    view_at = bench_orbit_view

    state = FrameState.initial(height, width)
    view = prev = view_at(0)
    t0 = time.time()
    cam = camera_frame(cfg, view, prev, 0)
    # AOT trace cache (core/aot.py): the warm-start bottleneck is PYTHON
    # TRACING of the frame graph (BENCH_STARTUP_PROFILE split), not the
    # XLA compile (persistent-cache hit). A prior run's serialized
    # export skips tracing entirely; any package source edit re-exports.
    from vkr_tpu.core.aot import cached_jit

    jitted = cached_jit(
        "bench_frame",
        lambda s, st, c: render_frame(
            s, st, c, ssr_res, cfg, use_pallas=True, interpret=interpret
        ),
        (scene, state, cam),
        donate_argnums=(1,),
        verbose=True,
        extra_key=repr(cfg) + repr(interpret),
    )
    if os.environ.get("BENCH_STARTUP_PROFILE", "0") == "1":
        # split compile+first into trace+lower / compile (persistent-
        # cache hit when warm) / first dispatch+run (executable upload
        # through the tunnel) — the VERDICT-r4 startup risk surface
        lowered = jitted.lower(scene, state, cam)
        t1 = time.time()
        print(f"startup: trace+lower {t1 - t0:.1f}s", file=sys.stderr)
        compiled = lowered.compile()
        t2 = time.time()
        print(f"startup: compile {t2 - t1:.1f}s", file=sys.stderr)
        color, state, aux = compiled(scene, state, cam)
        _ = np.asarray(color[0, 0])
        print(f"startup: first-exec {time.time() - t2:.1f}s",
              file=sys.stderr)
        # the timed loop must reuse the AOT executable: calling the jit
        # wrapper would re-trace (lower().compile() doesn't seed the
        # wrapper's dispatch cache)
        jitted = compiled
    else:
        color, state, aux = jitted(scene, state, cam)
        _ = np.asarray(color[0, 0])
    compile_s = time.time() - t0
    print(f"compile+first: {compile_s:.1f}s", file=sys.stderr)

    # Frames-in-flight pipelining (the reference keeps 2-3 frames in
    # flight through its swapchain/fences; PARITY.md §2.5 row): dispatch
    # frame i+1 BEFORE syncing frame i so the ~20-35 ms host<->device
    # round-trip of each readback overlaps device execution. Per-frame
    # time = interval between successive frame COMPLETIONS — the
    # sustained rate a swapchain would present at. BENCH_PIPELINE=0
    # restores the serial dispatch->sync latency measurement.
    pipelined = os.environ.get("BENCH_PIPELINE", "1") == "1"
    times = []
    if pipelined:
        prev_color = t_mark = None
        for i in range(1, frames):
            prev, view = view, view_at(i)
            cam = camera_frame(cfg, view, prev, i)
            color, state, aux = jitted(scene, state, cam)
            if prev_color is None:
                t_mark = time.time()
            else:
                _ = np.asarray(prev_color[0, 0])  # frame i-1 completed
                t = time.time()
                times.append(t - t_mark)
                t_mark = t
            prev_color = color
        _ = np.asarray(prev_color[0, 0])
        times.append(time.time() - t_mark)
    else:
        for i in range(1, frames):
            prev, view = view, view_at(i)
            cam = camera_frame(cfg, view, prev, i)
            t0 = time.time()
            color, state, aux = jitted(scene, state, cam)
            _ = np.asarray(color[0, 0])  # sync (block_until_ready is a
            times.append(time.time() - t0)  # no-op on the axon tunnel)

    raw_median = float(np.median(times))
    times, n_merged = _merge_flushed(times, raw_median)
    ms = float(np.median(times)) * 1e3
    cov = float(np.mean(np.asarray(state.prev_depth) < 1.0))
    dropped = int(np.asarray(aux["overflow"]))
    if dropped != 0:
        print(f"ERROR: raster bin overflow — {dropped} pairs dropped "
              f"(geometry lost; raise pair_factor)", file=sys.stderr)
        sys.exit(1)
    ts = np.sort(np.asarray(times)) * 1e3
    k = max(1, len(ts) // 4)
    trimmed = float(ts[k:-k].mean()) if len(ts) > 2 * k else float(ts.mean())
    print(f"coverage: {cov:.3f}  frames: {len(times)}  "
          f"min/median/max ms: {ts[0]:.1f}/{ms:.1f}/{ts[-1]:.1f}  "
          f"p10/p90: {np.percentile(ts, 10):.1f}/"
          f"{np.percentile(ts, 90):.1f}  trimmed25: {trimmed:.1f}  "
          f"merged double-flush pairs: {n_merged}", file=sys.stderr)
    if cov < 0.98:
        # The enclosed hall must fill the frame; a coverage drop means the
        # camera path or scene regressed and the timing under-states the
        # real workload (this caught the orbit exiting the hall wall).
        print(f"ERROR: coverage {cov:.3f} < 0.98 — bench workload "
              f"regressed (camera left the enclosure?)", file=sys.stderr)
        sys.exit(1)

    # The breakdown jits 3 MORE segments; on a cold cache through the
    # tunnel that could double an already ~20-min compile and blow the
    # driver's window — auto-skip when the fused compile was cold
    # (BENCH_BREAKDOWN=1 forces it regardless).
    want_bd = os.environ.get("BENCH_BREAKDOWN", "auto")
    if want_bd not in ("0", "1", "auto"):
        print(f"warning: BENCH_BREAKDOWN={want_bd!r} not one of 0/1/auto; "
              f"treating as 1", file=sys.stderr)
        want_bd = "1"
    if want_bd == "1" or (want_bd == "auto" and compile_s < 900):
        try:
            _breakdown(scene, state, cam, ssr_res, cfg, interpret)
        except Exception as e:  # never lose the headline JSON line
            print(f"breakdown failed: {e!r}", file=sys.stderr)

    print(json.dumps({
        "metric": "1080p_full_pipeline_frame_time",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(ms / 16.0, 3),
    }))


if __name__ == "__main__":
    main()
