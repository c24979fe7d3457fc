"""Probe Mosaic support for the phase-A quadrant-gather primitives.

 a) static UNALIGNED row slice of a VMEM ref (win[24+dy : 32+dy, :])
 b) lane roll of a loaded (8, 384) value (jnp.roll / pltpu.roll)
 c) static unaligned row slice of a fully loaded value
 d) combined: diamond roll-select fetch out[s,l] = W[24+s+dy, 128+l+dx]

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/probe_prims.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 56, 384
TILES = 64


def k_ref_slice(win_ref, out_ref):
    acc = jnp.zeros((8, 128), jnp.float32)
    for dy in (-3, 0, 5):  # unaligned static row starts
        acc = acc + win_ref[24 + dy : 32 + dy, 128:256]
    out_ref[...] = acc


def k_roll_loaded(win_ref, out_ref):
    w = win_ref[...]
    acc = jnp.zeros((8, 128), jnp.float32)
    for dx in (-3, 0, 5):
        r = jnp.roll(w[24:32, :], -dx, axis=1)
        acc = acc + r[:, 128:256]
    out_ref[...] = acc


def k_val_slice(win_ref, out_ref):
    w = win_ref[...]
    acc = jnp.zeros((8, 128), jnp.float32)
    for dy in (-3, 0, 5):
        acc = acc + w[24 + dy : 32 + dy, 128:256]
    out_ref[...] = acc


def k_diamond(win_ref, sel_ref, out_ref, *, radius):
    w = win_ref[...]
    dyj = sel_ref[0].astype(jnp.int32)
    dxj = sel_ref[1].astype(jnp.int32)
    acc = jnp.zeros((8, 128), jnp.float32)
    for dy in range(-radius, radius + 1):
        rows = w[24 + dy : 32 + dy, :]
        rem = radius - abs(dy)
        for dx in ({-rem, rem} if rem else {0}):
            v = jnp.roll(rows, -dx, axis=1)[:, 128:256]
            m = (dyj == dy) & (dxj == dx)
            acc = acc + jnp.where(m, v, 0.0)
    out_ref[...] = acc


def run(name, kernel, n_in=1, **kw):
    try:
        specs = [pl.BlockSpec((H, W), lambda i: (i, 0))]
        if n_in == 2:
            specs.append(pl.BlockSpec((2, 8, 128), lambda i: (0, i, 0)))
        fn = pl.pallas_call(
            functools.partial(kernel, **kw) if kw else kernel,
            grid=(TILES,),
            in_specs=specs,
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((TILES * 8, 128), jnp.float32),
        )
        rng = np.random.default_rng(0)
        win = jnp.asarray(rng.standard_normal((TILES * H, W)), jnp.float32)
        args = [win]
        if n_in == 2:
            r = kw["radius"]
            dy = rng.integers(-r, r + 1, (TILES * 8, 128))
            dx = np.where(rng.random((TILES * 8, 128)) < 0.5, 1, -1) * (
                r - np.abs(dy)
            )
            args.append(jnp.asarray(
                np.stack([dy, dx]).reshape(2, TILES, 8, 128)
                .swapaxes(0, 1).reshape(2 * TILES * 8 // 8, 8, 128)
                , jnp.float32).reshape(2 * TILES, 8, 128))
            # simpler: rebuild below
        t0 = time.time()
        got = np.asarray(jax.jit(fn)(*args))
        print(f"{name:14s} OK  compile+run {time.time()-t0:5.1f}s  "
              f"sum={got.sum():.3f}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name:14s} FAILED: {repr(e)[:300]}", flush=True)
        return False


def main():
    from vkr_tpu.core.platform import ensure_platform
    print("backend:", ensure_platform(), flush=True)
    run("ref_slice", k_ref_slice)
    run("roll_loaded", k_roll_loaded)
    run("val_slice", k_val_slice)


if __name__ == "__main__":
    main()


def k_lane_slice(win_ref, out_ref):
    w = win_ref[...]
    acc = jnp.zeros((8, 128), jnp.float32)
    for dx in (-3, 0, 5):
        acc = acc + w[24:32, 128 + dx : 256 + dx]
    out_ref[...] = acc


def k_lane_slice2d(win_ref, out_ref):
    w = win_ref[...]
    acc = jnp.zeros((8, 128), jnp.float32)
    for dy, dx in ((-3, 7), (5, -11), (1, 0)):
        acc = acc + w[24 + dy : 32 + dy, 128 + dx : 256 + dx]
    out_ref[...] = acc


def k_ptpu_roll(win_ref, out_ref):
    w = win_ref[...]
    acc = jnp.zeros((8, 128), jnp.float32)
    for dx in (-3, 0, 5):
        r = pltpu.roll(w[24:32, :], -dx, 1)
        acc = acc + r[:, 128:256]
    out_ref[...] = acc
