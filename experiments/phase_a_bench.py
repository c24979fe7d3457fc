"""Attribute the phase-A march cost (measured 131 ms standalone at 1080p
— 16 us/tile-iteration vs the ~1.5 us one-hot gather floor).

Runs the REAL _phase_a_kernel on synthetic rays plus ablated variants:

  full      - production kernel
  nodma     - window DMA replaced by zeros (isolates DMA cost)
  nogather  - surface_z = 0.5 constant (isolates one-hot gather cost)
  nostep    - fetch only, trivial state update (isolates _step math)
  iters1    - n_iters=1 (fixed per-tile cost)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/phase_a_bench.py
"""

from __future__ import annotations

import functools
import time


def main():
    from vkr_tpu.core.platform import ensure_platform

    print("backend:", ensure_platform())
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import vkr_tpu.passes.ssr_march as M

    H, W = 544, 960  # padded 1080p half-res grid
    hp, wp = H, W
    win_h, win_w = M._WIN_H, M._WIN_W
    rng = np.random.default_rng(0)

    depth0 = jnp.asarray(rng.uniform(0.3, 1.0, (hp, wp)), jnp.float32)
    # rays: origin at own pixel uv, direction toward +x/+z slightly
    ys, xs = np.mgrid[0:hp, 0:wp]
    ox = (xs + 0.5) / wp
    oy = (ys + 0.5) / hp
    oz = rng.uniform(0.2, 0.9, (hp, wp))
    dx = rng.uniform(-0.002, 0.002, (hp, wp))
    dy = rng.uniform(-0.002, 0.002, (hp, wp))
    dz = rng.uniform(0.001, 0.01, (hp, wp))
    cons_np = np.stack([
        ox, oy, oz, dx, dy, dz,
        np.zeros_like(ox), np.zeros_like(ox), np.zeros_like(ox),
        np.ones_like(ox) * 0.577, np.ones_like(ox) * 0.577,
        np.ones_like(ox) * 0.577,
    ]).astype(np.float32)
    cons = jnp.asarray(cons_np)

    def run(mode, n_iters=16):
        kern = functools.partial(
            _kernel, mode=mode, h=H, w=W, hp=hp, wp=wp,
            win_h=win_h, win_w=win_w, n_iters=n_iters,
        )
        grid = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(hp // 8, wp // 128),
            in_specs=[
                pl.BlockSpec((M.N_CONS, 8, 128), lambda i, j: (0, i, j)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((M.N_STATE, 8, 128),
                                   lambda i, j: (0, i, j)),
            scratch_shapes=[
                pltpu.VMEM(((win_w // 128) * win_h, 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            kern, grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((M.N_STATE, hp, wp),
                                           jnp.float32),
        )

    def _kernel(cons_ref, depth_hbm, out_ref, win, sem, *, mode, h, w,
                hp, wp, win_h, win_w, n_iters):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        y0 = ty * 8
        x0 = tx * 128
        ys_ = pl.multiple_of(jnp.clip(y0 - 24, 0, hp - win_h), 8)
        xs_ = pl.multiple_of(jnp.clip(x0 - 128, 0, wp - win_w), 128)
        blocks = win_w // 128
        if mode != "nodma":
            for b in range(blocks):
                cp = pltpu.make_async_copy(
                    depth_hbm.at[pl.ds(ys_, win_h),
                                 pl.ds(xs_ + 128 * b, 128)],
                    win.at[pl.ds(win_h * b, win_h)], sem)
                cp.start()
                cp.wait()
            window = win[...]
        else:
            window = jnp.zeros((blocks * win_h, 128), jnp.float32) + 0.5
        win_hi = window.astype(jnp.bfloat16)
        win_lo = (window - win_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        c = {k: cons_ref[i] for i, k in enumerate(M._CN)}
        c["mx"] = 0.005 / w
        c["my"] = 0.005 / h
        c.update(M._derive(c))
        zero = jnp.zeros((8, 128), jnp.float32)
        st = dict(px=c["ox"], py=c["oy"], pz=c["oz"], t=zero,
                  mip=jnp.zeros((8, 128), jnp.int32), hor=zero,
                  done=zero, oob=zero, iters=zero)
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (8, 128, blocks * win_h), 2)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)

        for i in range(n_iters):
            mpx = w * st["px"]
            mpy = h * st["py"]
            xi = jnp.clip(mpx.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(mpy.astype(jnp.int32), 0, h - 1)
            ly = jnp.clip(yi - ys_, 0, win_h - 1)
            lx = jnp.clip(xi - xs_, 0, win_w - 1)
            if mode == "nogather":
                surface_z = 0.5 + 0.0 * st["px"]
            else:
                frow = (lx >> 7) * win_h + ly
                fcol = lx & 127
                oh = (frow[..., None] == row_iota).astype(jnp.bfloat16)
                rs = jnp.einsum("slh,hw->slw", oh, win_hi,
                                preferred_element_type=jnp.float32)
                rs = rs + jnp.einsum("slh,hw->slw", oh, win_lo,
                                     preferred_element_type=jnp.float32)
                colh = fcol[..., None] == col_iota
                surface_z = jnp.where(colh, rs, 0.0).sum(-1)
            if mode == "nostep":
                st["px"] = st["px"] + surface_z * 1e-6
                st["pz"] = st["pz"] + 1e-6
            else:
                st = M._step(c, st, surface_z, float(i),
                             mip0sample=(i < 15), min_mip=0,
                             fovy=1.0, aspect=1.77, znear=0.05, zfar=80.0,
                             mip_resx=float(w), mip_resy=float(h),
                             mpx=mpx, mpy=mpy)
        for i, k in enumerate(M._ST):
            out_ref[i] = st[k].astype(jnp.float32)

    n_tiles = (hp // 8) * (wp // 128)
    for mode, it in (("full", 16), ("nodma", 16), ("nogather", 16),
                     ("nostep", 16), ("full", 1)):
        tag = f"{mode}/it{it}"
        try:
            fn = jax.jit(run(mode, it))
            t0 = time.time()
            np.asarray(fn(cons, depth0)[0])
            ct = time.time() - t0
            ts = []
            for _ in range(6):
                t0 = time.time()
                np.asarray(fn(cons, depth0)[0])
                ts.append((time.time() - t0) * 1e3)
            med = float(np.median(ts))
            print(f"{tag:14s} compile {ct:5.0f}s  median {med:7.1f} ms  "
                  f"({med*1e3/n_tiles:6.1f} us/tile)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:14s} FAILED: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
