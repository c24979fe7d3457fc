"""Ablate the phase-B march kernel's per-tile-iteration cost on v5e.

Runs a stripped copy of _phase_b_kernel's loop at bench scale
(544 tiles x 16 fixed iterations, no early exit) with pieces disabled,
timing each variant by the K-rep differential method:

  full      — coarse einsum pair + mip-1 einsum pair + chunked mip-0
  coarse    — coarse (mips>=2, R~346) hi/lo einsums + col reduce + step
  nofetch   — surface_z = const (loop + step + bookkeeping only)
  colonly   — coarse einsums without the (8,128,128) column reduce
  packed    — coarse fetch as ONE einsum against [hi | lo] (RC, 256)
  fullpk    — full with every hi/lo einsum pair packed the same way
  full2x    — full with the loop body composed 2x (half the trips)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/phase_b_ablate.py
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

    from vkr_tpu.passes.ssr_march import (_CN, _ST, N_CONS, N_STATE,
                                          _derive, _step)

    h, w = 540, 960
    n_tiles = 544
    n_rays = n_tiles * 1024
    R1 = 1016     # mip-1 rows
    RC = 346      # mips>=2 rows
    R = R1 + RC
    R0 = 4096     # mip-0 rows (chunked)
    CHUNK = 1024
    ITERS = 16

    def kernel(cs_ref, hi_ref, lo_ref, hi0_ref, lo0_ref, out_ref, *,
               variant):
        # packed variants receive [hi | lo] tables: hi_ref is (R, 256),
        # hi0_ref (R0, 256); lo_ref/lo0_ref are unused 1-row dummies.
        packed = variant in ("packed", "fullpk")
        fullish = variant in ("full", "fullpk", "full2x")
        c = {k: cs_ref[i] for i, k in enumerate(_CN)}
        c["mx"] = 0.005 / w
        c["my"] = 0.005 / h
        c.update(_derive(c))
        st = {k: cs_ref[N_CONS + i] for i, k in enumerate(_ST)}
        st["mip"] = st["mip"].astype(jnp.int32)
        rc_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, RC), 2)
        r1_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, R1), 2)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
        ck_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, CHUNK), 2)
        hi_c = hi_ref[R1:, :]
        lo_c = None if packed else lo_ref[R1:, :]

        def contract(oh, hi_slice, lo_slice):
            """hi+lo fetch: two einsums, or one against [hi | lo]."""
            if packed:
                both = jnp.einsum("slh,hw->slw", oh, hi_slice,
                                  preferred_element_type=jnp.float32)
                return both[:, :, :128] + both[:, :, 128:]
            part = jnp.einsum("slh,hw->slw", oh, hi_slice,
                              preferred_element_type=jnp.float32)
            return part + jnp.einsum("slh,hw->slw", oh, lo_slice,
                                     preferred_element_type=jnp.float32)

        def body(i, st):
            act = st["done"] == 0.0
            at0 = (st["mip"] == 0) & act
            at1 = (st["mip"] == 1) & act
            mipf = st["mip"].astype(jnp.float32)
            mip_resx = w * jnp.exp2(-mipf)
            mip_resy = h * jnp.exp2(-mipf)
            mpx = mip_resx * st["px"]
            mpy = mip_resy * st["py"]
            xi = jnp.clip(mpx.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(mpy.astype(jnp.int32), 0, h - 1)
            flat = yi * 8 + xi  # synthetic flat index in [0, R*128)
            flat = jnp.clip(flat, 0, R * 128 - 1)
            frow = flat >> 7
            if variant == "nofetch":
                surface_z = 0.9 + 1e-6 * mipf
            else:
                ohc = ((frow - R1)[..., None] == rc_iota).astype(
                    jnp.bfloat16)
                rs = contract(ohc, hi_c, lo_c)
                if fullish:
                    def fetch1():
                        oh1 = (jnp.where(at1, frow, -1)[..., None]
                               == r1_iota).astype(jnp.bfloat16)
                        return contract(
                            oh1, hi_ref[:R1, :],
                            None if packed else lo_ref[:R1, :])

                    rs = rs + jax.lax.cond(
                        jnp.any(at1), fetch1,
                        lambda: jnp.zeros((8, 128, 128), jnp.float32))
                if variant == "colonly":
                    surface_z = rs[:, :, 0]
                else:
                    colh = (flat & 127)[..., None] == col_iota
                    surface_z = jnp.where(colh, rs, 0.0).sum(-1)
                if fullish:
                    f0row = jnp.clip(flat, 0, R0 * 128 - 1) >> 7
                    f0col = (flat & 127)[..., None] == col_iota

                    def fetch0():
                        acc = jnp.zeros((8, 128, 128), jnp.float32)
                        for s in range(0, R0, CHUNK):
                            in_chunk = at0 & (f0row >= s) & (
                                f0row < s + CHUNK)

                            def hit(s=s):
                                oh0 = ((f0row - s)[..., None] == ck_iota
                                       ).astype(jnp.bfloat16)
                                return contract(
                                    oh0, hi0_ref[s : s + CHUNK, :],
                                    None if packed
                                    else lo0_ref[s : s + CHUNK, :])

                            acc = acc + jax.lax.cond(
                                jnp.any(in_chunk), hit,
                                lambda: jnp.zeros((8, 128, 128),
                                                  jnp.float32))
                        return jnp.where(f0col, acc, 0.0).sum(-1)

                    z0 = jax.lax.cond(
                        jnp.any(at0), fetch0,
                        lambda: jnp.zeros((8, 128), jnp.float32))
                    surface_z = jnp.where(at0, z0, surface_z)

            st, _ = _step(c, st, surface_z, i.astype(jnp.float32),
                          mip0sample=False, min_mip=-100, fovy=1.0,
                          aspect=1.78, znear=0.05, zfar=80.0,
                          mip_resx=mip_resx, mip_resy=mip_resy,
                          mpx=mpx, mpy=mpy)
            # keep mips cycling 0..3 so at0/at1 fire realistically
            st["mip"] = (st["mip"] + 1) & 3
            st["done"] = jnp.zeros((8, 128), jnp.float32)
            return st

        if variant == "full2x":
            st = jax.lax.fori_loop(
                0, ITERS // 2,
                lambda i, s: body(2 * i + 1, body(2 * i, s)), st)
        else:
            st = jax.lax.fori_loop(0, ITERS, lambda i, s: body(i, s), st)
        for i, k in enumerate(_ST):
            out_ref[i] = st[k].astype(jnp.float32)

    rng = np.random.default_rng(0)
    cs = jnp.asarray(rng.uniform(0.1, 0.9,
                                 (N_CONS + N_STATE, n_rays // 128, 128)),
                     jnp.float32)
    hi = jnp.asarray(rng.uniform(size=(R, 128)), jnp.bfloat16)
    lo = jnp.asarray(rng.uniform(size=(R, 128)) * 1e-3, jnp.bfloat16)
    hi0 = jnp.asarray(rng.uniform(size=(R0, 128)), jnp.bfloat16)
    lo0 = jnp.asarray(rng.uniform(size=(R0, 128)) * 1e-3, jnp.bfloat16)
    hipk = jnp.concatenate([hi, lo], axis=1)    # (R, 256)
    hi0pk = jnp.concatenate([hi0, lo0], axis=1)  # (R0, 256)
    dummy = jnp.zeros((8, 128), jnp.bfloat16)

    for variant in ("nofetch", "colonly", "coarse", "packed", "full",
                    "fullpk", "full2x"):
        packed = variant in ("packed", "fullpk")
        tw = 256 if packed else 128
        t_hi, t_lo = (hipk, dummy) if packed else (hi, lo)
        t_hi0, t_lo0 = (hi0pk, dummy) if packed else (hi0, lo0)

        def run(k):
            def f(cs_in):
                outs = []
                for r in range(k):
                    o = pl.pallas_call(
                        functools.partial(kernel, variant=variant),
                        grid_spec=pltpu.PrefetchScalarGridSpec(
                            num_scalar_prefetch=0,
                            grid=(n_rays // 1024,),
                            in_specs=[
                                pl.BlockSpec((N_CONS + N_STATE, 8, 128),
                                             lambda i: (0, i, 0)),
                                pl.BlockSpec((R, tw), lambda i: (0, 0)),
                                pl.BlockSpec(t_lo.shape,
                                             lambda i: (0, 0)),
                                pl.BlockSpec((R0, tw), lambda i: (0, 0)),
                                pl.BlockSpec(t_lo0.shape,
                                             lambda i: (0, 0)),
                            ],
                            out_specs=pl.BlockSpec(
                                (N_STATE, 8, 128), lambda i: (0, i, 0)),
                        ),
                        out_shape=jax.ShapeDtypeStruct(
                            (N_STATE, n_rays // 128, 128), jnp.float32),
                    )(cs_in.at[0, 0, 0].add(1e-7 * (r + 1)), t_hi, t_lo,
                      t_hi0, t_lo0)
                    outs.append(o.sum())
                return sum(outs)
            return jax.jit(f)

        f1, f4 = run(1), run(4)
        np.asarray(f1(cs))
        np.asarray(f4(cs))
        t1s, t4s = [], []
        for _ in range(5):
            t0 = time.time()
            np.asarray(f1(cs))
            t1s.append(time.time() - t0)
            t0 = time.time()
            np.asarray(f4(cs))
            t4s.append(time.time() - t0)
        per = (np.median(t4s) - np.median(t1s)) / 3.0 * 1e3
        per_ti = per * 1e3 / (n_tiles * ITERS)
        print(f"{variant:8s} per-rep {per:7.2f} ms  "
              f"({per_ti:5.2f} us/tile-iter)", flush=True)


if __name__ == "__main__":
    main()
