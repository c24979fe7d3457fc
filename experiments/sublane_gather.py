"""Round-3 item-1 feasibility probe: in-kernel row gather strategies.

The SSR march's per-iteration cost (~1.5 us/tile-iteration) is dominated
by the one-hot MXU gather that fetches surface_z = win[frow, lane] from
the tile-local depth window (passes/ssr_march.py). This experiment times
three in-kernel formulations of exactly that access pattern, isolated
from the march:

  onehot   - (rows==frow) one-hot -> einsum against the window (current)
  take     - jnp.take_along_axis over the sublane axis (does Mosaic lower
             a HW sublane gather?)
  rollsum  - sum over R of roll(win, -r) * (frow == r) select chain

Each kernel repeats the gather ITERS times per tile over a grid of TILES
(8,128) tiles so the per-gather cost can be read off the slope; a
baseline kernel with ITERS=1 removes the fixed tile overhead.

Usage:  python experiments/sublane_gather.py          (TPU via tunnel)

RESULTS (v5e via axon tunnel, 2026-08-17):

  rollsum  err=0.00e+00  lo~1.3-1.9ms  hi~1.3-1.4ms  -> slope ~0 ns/gather
  take     FAILED  (tpu_compile_helper exit 1 — no HW sublane-gather path)
  onehot   FAILED  in this standalone formulation (int-iota variant also
           crashes the remote compile helper; the production march's
           fused formulation in passes/ssr_march.py does compile, at
           ~1.5 us/tile-iteration)

Takeaway for round-3 item 1: the roll-select chain is effectively FREE
per iteration. The 48 pre-rolled `win[r]` row reads are loop-invariant
(the window never changes across march iterations — same as production),
so each gather costs only ~3 VPU ops per candidate row on (8,128)
vectors; 33 iterations cost no more than 1 (cost hides under the ~5-7 us
fixed tile overhead incl. the 48x128 window DMA). Replace the phase-A/B1
one-hot MXU gathers with roll-select chains: est. >=10x on the gather,
removing most of the ~1.5 us/tile-iteration march floor.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

R = 48        # window rows (matches the phase-A march window)
TILES = 256   # grid size
ITERS_HI = 33
ITERS_LO = 1


def _payload(win_ref, frow, mode):
    """One gather: out[s, l] = win[frow[s, l], l]."""
    win = win_ref[...]
    if mode == "onehot":
        # the march's formulation (passes/ssr_march.py): one-hot row
        # gather of FULL rows on the MXU, then select the matching column
        oh = (frow[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (8, 128, R), 2))
        rs = jnp.einsum("slh,hw->slw", oh.astype(jnp.bfloat16),
                        win.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        colh = (jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 1)
                == jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2))
        return jnp.where(colh, rs, 0.0).sum(-1)
    if mode == "take":
        # Mosaic's in-kernel gather wants indices == input.shape + (1,)
        # (sublane gather, same-shape output); pad indices to R rows and
        # keep the first 8 — measures the HW path's throughput ceiling.
        frow_full = jnp.concatenate(
            [frow] + [frow] * (R // 8 - 1), axis=0)
        return jnp.take_along_axis(win, frow_full, axis=0)[:8]
    if mode == "rollsum":
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(R):
            acc += jnp.where(frow == r, win[r], 0.0)
        return acc
    raise ValueError(mode)


def _kernel(win_ref, seed_ref, out_ref, *, mode, iters):
    frow = (seed_ref[...] & 0xFFFF) % R
    acc = jnp.zeros((8, 128), jnp.float32)
    for i in range(iters):
        # new indices each iteration so nothing hoists out of the loop
        frow = (frow * 1103515245 + 12345 + i) % R
        acc += _payload(win_ref, frow, mode)
    out_ref[...] = acc


def build(mode, iters):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, iters=iters),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((TILES * 8, 128), jnp.float32),
    )


def main():
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((TILES * R, 128)), jnp.float32)
    seed = jnp.asarray(
        rng.integers(0, 2**31 - 1, (TILES * 8, 128)), jnp.int32
    )

    # correctness vs a numpy oracle (one iteration)
    def oracle(win, seed):
        w = np.asarray(win).reshape(TILES, R, 128)
        fr = (np.asarray(seed).reshape(TILES, 8, 128) & 0xFFFF) % R
        # replicate int32 wraparound of the in-kernel LCG step
        fr64 = fr.astype(np.int64) * 1103515245 + 12345
        fr = (((fr64 + 2**31) % 2**32) - 2**31).astype(np.int32) % R
        out = np.take_along_axis(w, fr, axis=1)
        return out.reshape(TILES * 8, 128).astype(np.float32)

    want = oracle(win, seed)
    for mode in ("onehot", "take", "rollsum"):
        try:
            fn = jax.jit(build(mode, 1))
            got = np.asarray(fn(win, seed))
            err = np.abs(got - want).max()
            lo = jax.jit(build(mode, ITERS_LO))
            hi = jax.jit(build(mode, ITERS_HI))
            for f in (lo, hi):
                f(win, seed).block_until_ready()
            reps = 30
            t0 = time.time()
            for _ in range(reps):
                r = lo(win, seed)
            r.block_until_ready()
            t_lo = (time.time() - t0) / reps
            t0 = time.time()
            for _ in range(reps):
                r = hi(win, seed)
            r.block_until_ready()
            t_hi = (time.time() - t0) / reps
            per = (t_hi - t_lo) / (ITERS_HI - ITERS_LO) / TILES
            print(f"{mode:8s} err={err:.2e}  lo={t_lo*1e3:6.2f}ms "
                  f"hi={t_hi*1e3:6.2f}ms  -> {per*1e9:7.1f} ns/tile-gather",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and keep probing
            print(f"{mode:8s} FAILED: {repr(e)[:600]}", flush=True)


if __name__ == "__main__":
    main()
