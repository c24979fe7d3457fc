"""Phase-B fetch-class census on the REAL bench workload.

The env-flag ablations (VKR_MARCH_ABLATE) are confounded: skipping a
fetch class feeds rays wrong depths, which changes convergence and
inflates the iteration count (measured: nomip0 made the march SLOWER,
136 -> 166 ms/rep). This census instead replays the march with the
bit-faithful XLA replica formulas (same bf16 hi+lo tables) and counts,
per iteration and per 1024-ray kernel block, which fetch classes FIRE:

  * blocks with any alive ray        -> pay the coarse einsum pair
  * blocks with any mip-1 ray        -> pay the (8,128,row2) mip-1 pair
  * blocks with any mip-0 ray        -> pay the 256-row window pair
  * mip-1/coarse row spread          -> would a dynamic window cover it?

Combined with the per-class us/tile-iter from phase_b_ablate.py this
closes a NON-confounded cost model: t = sum_i sum_class fires * cost.
Replicates the production compaction schedule (B1 uncompacted 16..32,
cap 0.25 at 32, 0.1 at 48 — ssr.py compact_frac=0.25).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/march_census.py
"""

from __future__ import annotations

import os
import sys

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
    from vkr_tpu.frame import _normal_mat4, camera_frame
    from vkr_tpu.mathlib import look_at
    from vkr_tpu.mathlib.octahedral import decode_normal
    from vkr_tpu.mathlib.projection import (project_view_vec,
                                            reconstruct_view_vec)
    from vkr_tpu.passes import ssr as S
    from vkr_tpu.passes.downsample import build_hiz
    from vkr_tpu.passes.gbuffer import render_gbuffer, upload_scene
    from vkr_tpu.passes.sampling import screen_uv_grid
    from vkr_tpu.passes import ssr_march as M
    from vkr_tpu.scene.procedural import sponza_colonnade_scene

    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    W, H = 1920 // scale, 1080 // scale
    W, H = (W // 256) * 256, (H // 16) * 16  # tile-aligned
    cap_iters = 80
    cfg = RenderConfig(width=W, height=H)
    scene = upload_scene(sponza_colonnade_scene(columns=24,
                                                tessellation=80,
                                                tex_size=64))
    view = look_at((-18, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
    cam = camera_frame(cfg, view, view, 0)
    interp = jax.default_backend() != "tpu"
    gb = jax.jit(lambda s, c: render_gbuffer(
        s, c.mvp, c.prev_mvp, c.jitter, width=W, height=H,
        interpret=interp))(scene, cam)
    hiz = jax.jit(lambda d, n, v: build_hiz(d, n, v))(
        gb.depth, gb.normal, gb.velocity)
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
    w0v = -view_vec / jnp.linalg.norm(view_vec, axis=-1,
                                      keepdims=True).clip(1e-20)
    print(f"trace grid {h}x{w}", flush=True)

    # ---- phase A state (iters 0..16) via the XLA replica ----
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    chans = [o[..., 0], o[..., 1], o[..., 2],
             d[..., 0], d[..., 1], d[..., 2],
             view_vec[..., 0], view_vec[..., 1], view_vec[..., 2],
             w0v[..., 0], w0v[..., 1], w0v[..., 2]]
    pad_vals = [2.0, 2.0, 0.5, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                1.0]
    cons = jnp.stack([M._pad2(chans[i], hp, wp, pad_vals[i])
                      for i in range(len(chans))])
    state = jax.jit(lambda cons, m0: M._phase_a_xla(
        cons, m0, h=h, w=w, hp=hp, wp=wp, fovy=params.fovy,
        aspect=params.aspect, znear=params.znear, zfar=params.zfar,
        n_iters=16, banded=False))(cons, mips[0])

    # ---- tables: same packing as the driver, bf16-quantized values ----
    offsets, widths, heights = [], [], []
    segs = []
    off = 0
    for li, m in enumerate(mips[1:]):
        mh, mw = m.shape
        offsets.append(off)
        widths.append(mw)
        heights.append(mh)
        seg = np.asarray(m).reshape(-1)
        align = 1024 if li == 0 else 128
        pad = (-seg.shape[0]) % align
        if pad:
            seg = np.pad(seg, (0, pad), constant_values=1.0)
        segs.append(seg)
        off += seg.shape[0]
    flat1 = np.concatenate(segs).astype(np.float32)
    hi1 = flat1.astype(jnp.bfloat16)
    q1 = np.asarray(hi1, np.float32) + np.asarray(
        (flat1 - np.asarray(hi1, np.float32)).astype(jnp.bfloat16),
        np.float32)
    flat0 = np.asarray(mips[0]).reshape(-1).astype(np.float32)
    hi0 = flat0.astype(jnp.bfloat16)
    q0 = np.asarray(hi0, np.float32) + np.asarray(
        (flat0 - np.asarray(hi0, np.float32)).astype(jnp.bfloat16),
        np.float32)
    q1j, q0j = jnp.asarray(q1), jnp.asarray(q0)
    row2 = offsets[1] >> 7
    n_levels = len(offsets)

    # ---- one census step = the _phase_b_xla body + class masks ----
    n_px = hp * wp

    @jax.jit
    def census_step(cs_flat, i):
        c = {k: cs_flat[j] for j, k in enumerate(M._CN)}
        c["mx"] = 0.005 / w
        c["my"] = 0.005 / h
        c.update(M._derive(c))
        st = {k: cs_flat[M.N_CONS + j] for j, k in enumerate(M._ST)}
        st["mip"] = st["mip"].astype(jnp.int32)
        alive = st["done"] == 0.0
        at0 = (st["mip"] == 0) & alive
        at1 = (st["mip"] == 1) & alive
        mipf = st["mip"].astype(jnp.float32)
        mip_resx = w * jnp.exp2(-mipf)
        mip_resy = h * jnp.exp2(-mipf)
        mip = jnp.clip(st["mip"], 1, n_levels)
        mpx = mip_resx * st["px"]
        mpy = mip_resy * st["py"]
        xi = mpx.astype(jnp.int32)
        yi = mpy.astype(jnp.int32)
        off_ = jnp.full_like(xi, offsets[0])
        wl = jnp.full_like(xi, widths[0])
        hl = jnp.full_like(xi, heights[0])
        for lvl in range(2, n_levels + 1):
            sel = mip == lvl
            off_ = jnp.where(sel, offsets[lvl - 1], off_)
            wl = jnp.where(sel, widths[lvl - 1], wl)
            hl = jnp.where(sel, heights[lvl - 1], hl)
        xi = jnp.clip(xi, 0, wl - 1)
        yi = jnp.clip(yi, 0, hl - 1)
        flat = off_ + yi * wl + xi
        surface_z = q1j[flat]
        xi0 = jnp.clip((w * st["px"]).astype(jnp.int32), 0, w - 1)
        yi0 = jnp.clip((h * st["py"]).astype(jnp.int32), 0, h - 1)
        flat0i = yi0 * w + xi0
        surface_z = jnp.where(at0, q0j[flat0i], surface_z)
        st, _ = M._step(c, st, surface_z, i.astype(jnp.float32),
                        mip0sample=False, min_mip=0, fovy=params.fovy,
                        aspect=params.aspect, znear=params.znear,
                        zfar=params.zfar, mip_resx=mip_resx,
                        mip_resy=mip_resy, mpx=mpx, mpy=mpy)
        frow = flat >> 7           # mips>=1 table row (coarse/mip-1)
        f0row = flat0i >> 7        # mip-0 table row
        new_flat = jnp.concatenate([
            cs_flat[: M.N_CONS],
            jnp.stack([st[k].astype(jnp.float32) for k in M._ST])])
        return new_flat, (alive, at0, at1, frow, f0row)

    def block_stats(mask, rows, win, blocks):
        """fires = blocks with any masked ray; covered = fraction of
        those blocks where a win-row window at min row covers ALL
        masked rays (16-row aligned base, like the kernel's slice)."""
        m = mask.reshape(blocks, -1)
        r = np.where(m, rows.reshape(blocks, -1), 1 << 30)
        fires = m.any(1)
        rmin = (r.min(1) // 16) * 16
        rmax = np.where(m, rows.reshape(blocks, -1), -1).max(1)
        cov = fires & (rmax - rmin < win)
        return int(fires.sum()), int(cov.sum())

    # ---- replay 16..80 with the production compaction schedule ----
    st_flat = jnp.concatenate([cons.reshape(M.N_CONS, n_px),
                               state.reshape(M.N_STATE, n_px)])
    di = M.N_CONS + M._ST.index("done")
    order = np.arange(n_px)          # current ray -> original pixel
    caps = {32: (n_px * 25 // 100) // 1024 * 1024,
            48: (n_px * 10 // 100) // 1024 * 1024}
    tot = {"alive_blk": 0, "at1_blk": 0, "at0_blk": 0,
           "at1_cov": 0, "at0_cov": 0, "coarse_cov": 0, "iters": 0}
    per_seg = []
    full = jnp.asarray(st_flat)
    cur = full
    W1, W0 = 256, 256
    for i in range(16, cap_iters):
        if i in caps:
            done = np.asarray(full[di]) > 0.5
            key = done.astype(np.int64) * (1 << 24) + np.arange(n_px)
            idx = np.sort(key)[: caps[i]] & ((1 << 24) - 1)
            cur = full[:, idx]
            order = idx
        cur, (alive, at0, at1, frow, f0row) = census_step(
            cur, jnp.asarray(i, jnp.int32))
        full = full.at[:, order].set(cur) if order.shape[0] != n_px \
            else cur
        alive, at0, at1 = (np.asarray(x) for x in (alive, at0, at1))
        frow, f0row = np.asarray(frow), np.asarray(f0row)
        blocks = alive.shape[0] // 1024
        a_f, _ = block_stats(alive, frow, 1 << 30, blocks)
        c_f, c_cov = block_stats(alive & (frow >= row2), frow, 128,
                                 blocks)
        m1_f, m1_cov = block_stats(at1, frow, W1, blocks)
        m0_f, m0_cov = block_stats(at0, f0row, W0, blocks)
        tot["alive_blk"] += a_f
        tot["at1_blk"] += m1_f
        tot["at0_blk"] += m0_f
        tot["at1_cov"] += m1_cov
        tot["at0_cov"] += m0_cov
        tot["coarse_cov"] += c_cov
        tot["iters"] += 1
        if i in (16, 24, 31, 32, 40, 47, 48, 60, 79):
            print(f"iter {i:2d}: blocks {blocks:3d} alive_blk {a_f:3d} "
                  f"at1 {m1_f:3d} (win{W1} covers {m1_cov:3d}) "
                  f"at0 {m0_f:3d} (win{W0} covers {m0_cov:3d}) "
                  f"coarse fires {c_f:3d} (win128 covers {c_cov:3d}) "
                  f"alive rays {alive.sum()}", flush=True)

    print("\ntotals over iters 16..80 (block-iterations):")
    for k, v in tot.items():
        print(f"  {k}: {v}")
    print(f"\ncost model inputs: coarse fires every alive block-iter "
          f"({tot['alive_blk']}), mip-1 {tot['at1_blk']} "
          f"({tot['at1_cov']} window-coverable), mip-0 {tot['at0_blk']} "
          f"({tot['at0_cov']} window-coverable)")


if __name__ == "__main__":
    main()
