"""Round-3 probe: pricing in-kernel 2D one-hot gathers vs table size R
and operand dtype.

Production gathers (SSR march phase B, texture sampling) are 2D —
out[s,l] = win[frow[s,l], fcol[s,l]] — which forces the one-hot MXU
formulation: a pure select-chain can do OWN-LANE row gathers for ~free
(sublane_gather.py) but any 2D variant degenerates to O(R*128) vreg
selects, so the MXU row-contraction + masked lane reduction is the only
competitive engine.  Its cost is ~linear in R (the MAC count is
rays * R * 128), so the levers are (a) smaller windows and (b) cheaper
operand dtypes.  This probe measures, with march-style serialized
iterations (next indices depend on the fetched value):

  pair_bf16 - production formulation (ssr_march.py): window split into
              bf16 hi + bf16 residual, 2 einsums (f32-grade, ~4e-6 err)
  int8x3    - window quantized to 24-bit fixed point, stored as 3 int8
              byte-planes; 3 int8 einsums with i32 accumulation (int8
              MACs run 2x bf16 rate on v5e; exact D24-grade values)
  bf16_one  - single bf16 einsum (accuracy floor ~4e-3; pricing
              reference only)

Usage:  python experiments/gather2d.py

RESULTS (v5e via axon tunnel, 2026-08-17, TILES=128, 16-iter chains;
timing noise ~+-30% from the ~2.3 ms/dispatch tunnel jitter):

  R= 144 pair_bf16 err=3.8e-06   1.72 us/tile-iter
  R= 144 int8x3    (sign-wrap bug: bytes >=128 wrap in int8; ~1.54 even so)
  R= 144 bf16_one  err=2.0e-03   1.09 us/tile-iter
  R= 448 pair_bf16 err=3.8e-06   0.49 us/tile-iter   (lo-call flake; ~1.5 real)
  R= 448 bf16_one  err=2.0e-03   0.97 us/tile-iter
  R=1344 pair_bf16 err=3.8e-06   4.92 us/tile-iter
  R=1344 int8x3    ~4.1 us/tile-iter
  R=1344 bf16_one  err=2.0e-03   1.20 us/tile-iter

Takeaways:
  * bf16_one is FLAT ~1 us across R=144..1344 -> the floor is VPU work
    (one-hot build ~R vreg-ops + 128-lane column mask ~380 ops), not MXU
    throughput.  The second einsum only hurts at large R (VMEM spills of
    the (8,128,R) intermediates): pair_bf16 4.9 us at R=1344.
  * int8x3 saves ~10-15% at best — not worth a third plane + quantized
    semantics.  Dropped.
  * Plan: (a) shrink the march's global-phase table via per-tile
    multi-mip VMEM windows (R~1350 -> ~450, escape-to-global fallback),
    (b) replace the 128-lane masked-sum column extract with a 7-stage
    bit-tree select (~260 ops, and bit-exact — usable for u32/RGBA
    payloads), (c) keep bf16 hi+lo for depth accuracy.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILES = 128
ITERS_HI = 16
ITERS_LO = 1


def _colmask(rs, fcol):
    colh = (fcol[..., None]
            == jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2))
    return jnp.where(colh, rs, 0.0).sum(-1)


def _payload(planes, frow, fcol, mode, R):
    riota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, R), 2)
    if mode == "pair_bf16":
        hi, lo = planes
        oh = (frow[:, :, None] == riota).astype(jnp.bfloat16)
        rs = jnp.einsum("slh,hw->slw", oh, hi,
                        preferred_element_type=jnp.float32)
        rs = rs + jnp.einsum("slh,hw->slw", oh, lo,
                             preferred_element_type=jnp.float32)
        return _colmask(rs, fcol)
    if mode == "int8x3":
        p2, p1, p0 = planes
        oh = (frow[:, :, None] == riota).astype(jnp.int8)
        a2 = jnp.einsum("slh,hw->slw", oh, p2,
                        preferred_element_type=jnp.int32)
        a1 = jnp.einsum("slh,hw->slw", oh, p1,
                        preferred_element_type=jnp.int32)
        a0 = jnp.einsum("slh,hw->slw", oh, p0,
                        preferred_element_type=jnp.int32)
        rs = (a2.astype(jnp.float32) * 65536.0
              + a1.astype(jnp.float32) * 256.0
              + a0.astype(jnp.float32)) * (1.0 / 16777215.0)
        return _colmask(rs, fcol)
    if mode == "bf16_one":
        (hi,) = planes
        oh = (frow[:, :, None] == riota).astype(jnp.bfloat16)
        rs = jnp.einsum("slh,hw->slw", oh, hi,
                        preferred_element_type=jnp.float32)
        return _colmask(rs, fcol)
    raise ValueError(mode)


def _kernel(win_ref, seed_ref, out_ref, *, mode, iters, R):
    win = win_ref[...]
    if mode == "pair_bf16":
        hi = win.astype(jnp.bfloat16)
        planes = (hi, (win - hi.astype(jnp.float32)).astype(jnp.bfloat16))
    elif mode == "int8x3":
        q = jnp.clip((win * 16777215.0), 0, 16777215.0).astype(jnp.int32)
        planes = (((q >> 16) & 0xFF).astype(jnp.int8),
                  ((q >> 8) & 0xFF).astype(jnp.int8),
                  (q & 0xFF).astype(jnp.int8))
    else:
        planes = (win.astype(jnp.bfloat16),)
    s0 = seed_ref[...]
    frow = (s0 & 0xFFFF) % R
    fcol = (s0 >> 16) & 127
    acc = jnp.zeros((8, 128), jnp.float32)
    for _ in range(iters):
        v = _payload(planes, frow, fcol, mode, R)
        acc = acc + v
        vi = (v * 4096.0).astype(jnp.int32)
        frow = (frow + 1 + (vi & 7)) % R
        fcol = (fcol + 1 + ((vi >> 3) & 7)) & 127
    out_ref[...] = acc


def build(mode, iters, R):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, iters=iters, R=R),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * 8, 128), jnp.float32),
    )


def quant24(w):
    q = np.clip(w * 16777215.0, 0, 16777215.0).astype(np.int64)
    return (q.astype(np.float64) / 16777215.0).astype(np.float32)


def oracle(win, seed, iters, R, quant=False):
    w = np.asarray(win).reshape(TILES, R, 128)
    if quant:
        w = quant24(w)
    s0 = np.asarray(seed).reshape(TILES, 8, 128)
    frow = (s0 & 0xFFFF) % R
    fcol = (s0 >> 16) & 127
    acc = np.zeros((TILES, 8, 128), np.float32)
    for _ in range(iters):
        v = np.take_along_axis(
            w.reshape(TILES, R * 128),
            (frow * 128 + fcol).reshape(TILES, -1), axis=1
        ).reshape(TILES, 8, 128).astype(np.float32)
        acc += v
        vi = (v * 4096.0).astype(np.int64).astype(np.int32)
        frow = (frow + 1 + (vi & 7)) % R
        fcol = (fcol + 1 + ((vi >> 3) & 7)) & 127
    return acc.reshape(TILES * 8, 128)


def main():
    rng = np.random.default_rng(0)
    for R in (144, 448, 1344):
        win = jnp.asarray(
            rng.uniform(0.1, 0.9, (TILES * R, 128)), jnp.float32)
        seed = jnp.asarray(
            rng.integers(0, 2**31 - 1, (TILES * 8, 128)), jnp.int32)
        for mode in ("pair_bf16", "int8x3", "bf16_one"):
            try:
                want1 = oracle(win, seed, 1, R, quant=(mode == "int8x3"))
                got = np.asarray(jax.jit(build(mode, 1, R))(win, seed))
                err = np.abs(got - want1).max()
                lo = jax.jit(build(mode, ITERS_LO, R))
                hi = jax.jit(build(mode, ITERS_HI, R))
                for f in (lo, hi):
                    np.asarray(f(win, seed))
                reps = 20
                t0 = time.time()
                for _ in range(reps):
                    r = lo(win, seed)
                np.asarray(r)
                t_lo = (time.time() - t0) / reps
                t0 = time.time()
                for _ in range(reps):
                    r = hi(win, seed)
                np.asarray(r)
                t_hi = (time.time() - t0) / reps
                per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO) / TILES
                print(f"R={R:4d} {mode:9s} err={err:.2e} "
                      f"lo={t_lo*1e3:6.2f}ms hi={t_hi*1e3:6.2f}ms "
                      f"-> {per*1e6:6.3f} us/tile-iter", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"R={R:4d} {mode:9s} FAILED: {repr(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()
