"""Find the ~200 us/tile FIXED cost in the phase-A kernel skeleton.

Minimal kernels on the same (hp/8, wp/128) 2D grid:

  m0 copy         - out = cons slice (no HBM input, no scratch)
  m1 inputs       - + unused HBM depth ref + VMEM scratch + sem
  m2 dma          - + the 3 window DMAs
  m3 iotas        - + window bf16 split + row/col iota reduction
  m4 grid1d       - m0 on a 1D grid (n_tiles,)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/phase_a_min.py
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

    N_CONS, N_STATE = 12, 9
    hp, wp = 544, 1024
    win_h, win_w = 48, 384
    blocks = win_w // 128
    rng = np.random.default_rng(0)
    cons = jnp.asarray(rng.standard_normal((N_CONS, hp, wp)), jnp.float32)
    depth0 = jnp.asarray(rng.uniform(0.3, 1.0, (hp, wp)), jnp.float32)
    n_tiles = (hp // 8) * (wp // 128)

    def k_copy(cons_ref, out_ref):
        for i in range(N_STATE):
            out_ref[i] = cons_ref[i % N_CONS]

    def k_inputs(cons_ref, depth_hbm, out_ref, win, sem, *, dma, iotas):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        y0 = ty * 8
        x0 = tx * 128
        ys_ = pl.multiple_of(jnp.clip(y0 - 24, 0, hp - win_h), 8)
        xs_ = pl.multiple_of(jnp.clip(x0 - 128, 0, wp - win_w), 128)
        extra = jnp.zeros((8, 128), jnp.float32)
        if dma:
            for b in range(blocks):
                cp = pltpu.make_async_copy(
                    depth_hbm.at[pl.ds(ys_, win_h),
                                 pl.ds(xs_ + 128 * b, 128)],
                    win.at[pl.ds(win_h * b, win_h)], sem)
                cp.start()
                cp.wait()
            extra = extra + win[0:8, :]
        if iotas:
            window = win[...]
            win_hi = window.astype(jnp.bfloat16)
            win_lo = (window - win_hi.astype(jnp.float32)
                      ).astype(jnp.bfloat16)
            row_iota = jax.lax.broadcasted_iota(
                jnp.int32, (8, 128, blocks * win_h), 2)
            col_iota = jax.lax.broadcasted_iota(
                jnp.int32, (8, 128, 128), 2)
            frow = (cons_ref[0] * 100).astype(jnp.int32) % (blocks * win_h)
            oh = (frow[..., None] == row_iota).astype(jnp.bfloat16)
            rs = jnp.einsum("slh,hw->slw", oh, win_hi,
                            preferred_element_type=jnp.float32)
            rs = rs + jnp.einsum("slh,hw->slw", oh, win_lo,
                                 preferred_element_type=jnp.float32)
            fcol = (cons_ref[1] * 100).astype(jnp.int32) % 128
            colh = fcol[..., None] == col_iota
            extra = extra + jnp.where(colh, rs, 0.0).sum(-1)
        for i in range(N_STATE):
            out_ref[i] = cons_ref[i % N_CONS] + extra

    def build2d(kern, with_inputs):
        if with_inputs:
            grid = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(hp // 8, wp // 128),
                in_specs=[
                    pl.BlockSpec((N_CONS, 8, 128),
                                 lambda i, j: (0, i, j)),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                ],
                out_specs=pl.BlockSpec((N_STATE, 8, 128),
                                       lambda i, j: (0, i, j)),
                scratch_shapes=[
                    pltpu.VMEM((blocks * win_h, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )
            return pl.pallas_call(
                kern, grid_spec=grid,
                out_shape=jax.ShapeDtypeStruct((N_STATE, hp, wp),
                                               jnp.float32))
        return pl.pallas_call(
            kern,
            grid=(hp // 8, wp // 128),
            in_specs=[pl.BlockSpec((N_CONS, 8, 128),
                                   lambda i, j: (0, i, j))],
            out_specs=pl.BlockSpec((N_STATE, 8, 128),
                                   lambda i, j: (0, i, j)),
            out_shape=jax.ShapeDtypeStruct((N_STATE, hp, wp),
                                           jnp.float32))

    def build1d(kern):
        return pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((N_CONS, 8, 128), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((N_STATE, 8, 128), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((N_STATE, n_tiles * 8, 128),
                                           jnp.float32))

    cons1d = cons.reshape(N_CONS, n_tiles * 8, 128)

    cases = [
        ("m0 copy", build2d(k_copy, False), (cons,)),
        ("m1 inputs", build2d(functools.partial(
            k_inputs, dma=False, iotas=False), True), (cons, depth0)),
        ("m2 dma", build2d(functools.partial(
            k_inputs, dma=True, iotas=False), True), (cons, depth0)),
        ("m3 iotas", build2d(functools.partial(
            k_inputs, dma=True, iotas=True), True), (cons, depth0)),
        ("m4 grid1d", build1d(k_copy), (cons1d,)),
    ]
    for tag, fn, a in cases:
        try:
            f = jax.jit(fn)
            t0 = time.time()
            np.asarray(f(*a)[0])
            ct = time.time() - t0
            ts = []
            for _ in range(6):
                t0 = time.time()
                np.asarray(f(*a)[0])
                ts.append((time.time() - t0) * 1e3)
            med = float(np.median(ts))
            print(f"{tag:12s} compile {ct:5.0f}s  median {med:7.1f} ms  "
                  f"({med*1e3/n_tiles:6.1f} us/tile)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:12s} FAILED: {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
