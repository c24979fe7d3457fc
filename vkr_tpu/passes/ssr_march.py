"""Pallas hi-Z hierarchical ray march — the SSR trace hot loop on TPU.

The reference's march (shaders/include/screen_trace.glsl:51-101 +
advanced_ssr/trace.comp:171-236) is one gather per ray per iteration from
a depth mip pyramid — the worst possible shape for XLA's scalarized TPU
gather (~0.1 Gtaps/s measured). This module restructures the IDENTICAL
math into three phases that avoid XLA gathers entirely on the hot path:

  Phase A (iterations 0..15): the find_hor prefix pins every ray to mip 0
    (trace.comp:191 `i < 15`), which makes the trajectory DATA-INDEPENDENT
    up to stalls: an advancing ray crosses exactly one cell boundary per
    iteration along a closed-form DDA lattice, and a ray that fails the
    depth test stalls at its cell permanently (within the prefix). The
    kernel therefore (1) walks the lattice closed-form, (2) prefetches
    every candidate depth with static window slices selected by a
    ring-shell mask chain — ~3 VPU ops per candidate, no one-hot MXU
    gather, no serial fetch->step dependency — and (3) replays the exact
    reference step function against the prefetched values. Rays whose
    origin cell sits more than _A_DELTA L1 texels from their pixel
    (extreme close-range geometry) fall outside the enumerated shells and
    are retired invalid — never falsely valid, like the drop policy below.

  Phase B1 (iterations 16..32): the whole (padded) ray grid marches in a
    global kernel holding the ENTIRE depth pyramid in VMEM — the mip>=1
    levels as one flat table, mip 0 as its own table read through a
    chunked one-hot (skipped on iterations where a tile has no mip-0
    rays). Fetches use a one-hot MXU gather: row-select as a
    (rays, R) x (R, 128) matmul, column-select as a masked lane
    reduction. f32 accuracy survives the MXU's bf16 operand truncation
    via a hi+lo bf16 split of each table (two matmuls, |err| <= ~4e-6).
    Most rays retire here (hit / sky / out of bounds); tiles whose rays
    all retired exit after one loop-condition check.

  Phase B2 (iterations 32..max): survivors are compacted (single-key
    sort + one row gather) and marched to the iteration cap in the same
    kernel; survivors beyond the compaction capacity are invalidated,
    the same drop policy as the XLA fallback path.

In-kernel gathers use the factored one-hot engine (~0.45 Gtaps/s
amortized, ~5x XLA, independent of table size) — see ROADMAP.md "MXU
one-hot gather engine".
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_T = 3.402823466e38

# phase-A window geometry (per (8,128) ray tile, mip-0 texels)
_A_WIN_H = 56   # rows: 24 up / 24 down margins around the 8-row tile
_A_WIN_W = 384  # cols: 128 left / 128 right margins (128-aligned DMA)
# Prefetch cells sit on the L1 diamond of radius j+1 around the ray's
# ORIGIN cell, which sits within L1 <= _A_DELTA of its pixel (the
# 0.001*n view-space nudge of trace.comp:64 projects to <~1 texel except
# at extreme close range) — so window offsets lie in shells [j-1, j+3].
_A_DELTA = 2
_A_RMAX = 18    # |dy| <= 18 keeps row slices inside the 56-row window

# state channel order (phase A out, phase B in/out)
_ST = ("px", "py", "pz", "t", "mip", "hor", "done", "oob", "iters")
N_STATE = len(_ST)
# per-ray constants channel order
_CN = ("ox", "oy", "oz", "dx", "dy", "dz",
       "cx", "cy", "cz", "wx", "wy", "wz")
N_CONS = len(_CN)


def _derive(c):
    """inv_dir / uv_offset / floor_offset from the direction — same as
    ssr._hierarchical_march.make_consts."""
    out = {}
    for ax, (d, m) in (("x", (c["dx"], c["mx"])), ("y", (c["dy"], c["my"])),
                       ("z", (c["dz"], None))):
        safe = jnp.where(d == 0.0, 1.0, d)
        out["inv_" + ax] = jnp.where(d != 0.0, 1.0 / safe, MAX_T)
        if m is not None:
            out["uvo_" + ax] = jnp.where(d < 0.0, -m, m)
            out["flo_" + ax] = jnp.where(d < 0.0, 0.0, 1.0)
    return out


def _step(c, st, surface_z, i_scalar, *, mip0sample, min_mip,
          fovy, aspect, znear, zfar, mip_resx, mip_resy, mpx, mpy):
    """One march iteration given the fetched surface_z — the exact body of
    ssr._hierarchical_march.make_body (trace.comp:191-236)."""
    xy_plane_x = (jnp.floor(mpx) + c["flo_x"]) / mip_resx + c["uvo_x"]
    xy_plane_y = (jnp.floor(mpy) + c["flo_y"]) / mip_resy + c["uvo_y"]
    t_x = (xy_plane_x - c["ox"]) * c["inv_x"]
    t_y = (xy_plane_y - c["oy"]) * c["inv_y"]
    t_z = (surface_z - c["oz"]) * c["inv_z"]
    t_z = jnp.where(c["dz"] > 0.0, t_z, MAX_T)
    t_min = jnp.minimum(jnp.minimum(t_x, t_y), t_z)
    above = surface_z > st["pz"]
    skipped = (t_min != t_z) & above
    new_t = jnp.clip(jnp.where(above, t_min, st["t"]), -1e20, 1e20)
    new_px = c["ox"] + new_t * c["dx"]
    new_py = c["oy"] + new_t * c["dy"]
    new_pz = c["oz"] + new_t * c["dz"]

    dm = jnp.where(skipped, 1, -1)
    if mip0sample:
        dm = jnp.zeros_like(dm)
    new_mip = st["mip"] + dm

    act = st["done"] == 0.0
    px = jnp.where(act, new_px, st["px"])
    py = jnp.where(act, new_py, st["py"])
    pz = jnp.where(act, new_pz, st["pz"])
    t = jnp.where(act, new_t, st["t"])
    mip_out = jnp.where(act, new_mip, st["mip"])

    # horizon estimate on fine mips (trace.comp:214-223)
    tg = math.tan(fovy / 2.0)
    z_lin = znear * zfar / (surface_z * (zfar - znear) - zfar)
    vx = -(2.0 * px - 1.0) * (z_lin * aspect * tg) - c["cx"]
    vy = -(2.0 * py - 1.0) * (z_lin * tg) - c["cy"]
    vz = z_lin - c["cz"]
    v_len = jnp.maximum(
        jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-20
    )
    h2 = (c["wx"] * vx + c["wy"] * vy + c["wz"] * vz) / v_len
    hor_upd = act & (mip_out <= 1) & (v_len < 0.3)
    hor = jnp.where(hor_upd, jnp.maximum(st["hor"], h2), st["hor"])

    iters = jnp.where(act, i_scalar + 1.0, st["iters"])
    done = st["done"]
    done = jnp.maximum(done, (mip_out < min_mip).astype(jnp.float32))
    oob_pos = (
        ((px < 0.0) & (c["dx"] <= 0.0)) | ((px > 1.0) & (c["dx"] >= 0.0))
        | ((py < 0.0) & (c["dy"] <= 0.0)) | ((py > 1.0) & (c["dy"] >= 0.0))
    )
    newly_oob = act & oob_pos & (mip_out >= min_mip)
    done = jnp.maximum(done, newly_oob.astype(jnp.float32))
    oob = jnp.maximum(st["oob"], newly_oob.astype(jnp.float32))
    return dict(px=px, py=py, pz=pz, t=t, mip=mip_out, hor=hor,
                done=done, oob=oob, iters=iters), {"advanced": act & skipped}


# ------------------------------------------------------------ phase A

def _phase_a_kernel(cons_ref, dpad_hbm, out_ref, win, sem, *,
                    h, w, fovy, aspect, znear, zfar, n_iters,
                    banded=False):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    y0 = ty * 8
    x0 = tx * 128
    # dpad is the mip-0 depth padded by (24, 24) rows / (128, 128) cols
    # of far-plane, so every tile's window is full-size and un-clamped
    cp = pltpu.make_async_copy(
        dpad_hbm.at[pl.ds(pl.multiple_of(y0, 8), _A_WIN_H),
                    pl.ds(pl.multiple_of(x0, 128), _A_WIN_W)],
        win, sem,
    )
    cp.start()
    cp.wait()
    W = win[...]  # (56, 384) f32 — exact depths, no bf16 split needed

    c = {k: cons_ref[i] for i, k in enumerate(_CN)}
    c["mx"] = 0.005 / w
    c["my"] = 0.005 / h
    c.update(_derive(c))

    zero = jnp.zeros((8, 128), jnp.float32)
    st = dict(px=c["ox"], py=c["oy"], pz=c["oz"], t=zero,
              mip=jnp.zeros((8, 128), jnp.int32), hor=zero, done=zero,
              oob=zero, iters=zero)

    # initial_advance_ray (screen_trace.glsl:8-15) at mip 0
    cpx = w * c["ox"]
    cpy = h * c["oy"]
    t0x = ((jnp.floor(cpx) + c["flo_x"]) / w + c["uvo_x"] - c["ox"]) \
        * c["inv_x"]
    t0y = ((jnp.floor(cpy) + c["flo_y"]) / h + c["uvo_y"] - c["oy"]) \
        * c["inv_y"]
    ct = jnp.minimum(t0x, t0y)
    st["t"] = ct
    st["px"] = c["ox"] + ct * c["dx"]
    st["py"] = c["oy"] + ct * c["dy"]
    st["pz"] = c["oz"] + ct * c["dz"]

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    # band mode: cons carries the GLOBAL pixel row per ray (the dpad
    # input is band-sliced, so the window DMA keeps band-local y0 while
    # the lattice cells — derived from global uv — need global rows)
    if banded:
        prow = cons_ref[N_CONS].astype(jnp.int32)
    else:
        prow = y0 + s_iota

    # ---- pass 1: closed-form DDA lattice + ring-shell prefetch.  The
    # always-advance path's t/cell sequence uses the exact f32
    # expressions of _step's boundary math, so a replayed ray that has
    # advanced k times sits bit-exactly at lattice position k.
    slice_cache = {}

    def wslice(dy, dx):
        if (dy, dx) not in slice_cache:
            slice_cache[(dy, dx)] = W[24 + dy: 32 + dy,
                                      128 + dx: 256 + dx]
        return slice_cache[(dy, dx)]

    fetched = []  # (surface_z, matched) per lattice step
    lt = st["t"]
    for j in range(n_iters):
        lpx = c["ox"] + lt * c["dx"]
        lpy = c["oy"] + lt * c["dy"]
        mpx = w * lpx
        mpy = h * lpy
        xi = jnp.clip(mpx.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(mpy.astype(jnp.int32), 0, h - 1)
        dyj = yi - prow
        dxj = xi - (x0 + l_iota)
        shell_lo = max(0, j + 1 - _A_DELTA)
        shell_hi = min(j + 1 + _A_DELTA, _A_RMAX)
        mrow = {dy: dyj == dy
                for dy in range(-shell_hi, shell_hi + 1)}
        mcol = {dx: dxj == dx
                for dx in range(-shell_hi, shell_hi + 1)}
        z = zero
        matched = jnp.zeros((8, 128), jnp.bool_)
        for r in range(shell_lo, shell_hi + 1):
            combos = ([(0, 0)] if r == 0 else
                      [(dy, sgn * (r - abs(dy)))
                       for dy in range(-r, r + 1)
                       for sgn in ((1, -1) if r - abs(dy) else (1,))])
            for dy, dx in combos:
                m = mrow[dy] & mcol[dx]
                z = z + jnp.where(m, wslice(dy, dx), 0.0)
                matched = matched | m
        fetched.append((z, matched))
        # advance the lattice to the next boundary crossing
        tx_ = ((jnp.floor(mpx) + c["flo_x"]) / w + c["uvo_x"] - c["ox"]) \
            * c["inv_x"]
        ty_ = ((jnp.floor(mpy) + c["flo_y"]) / h + c["uvo_y"] - c["oy"]) \
            * c["inv_y"]
        lt = jnp.clip(jnp.minimum(tx_, ty_), -1e20, 1e20)

    # ---- pass 2: replay the exact reference step against the prefetch;
    # k = how many boundary advances this ray has made so far
    k = jnp.zeros((8, 128), jnp.int32)
    for i in range(n_iters):
        z = zero
        m = jnp.zeros((8, 128), jnp.bool_)
        for j in range(i + 1):
            sel = k == j
            z = jnp.where(sel, fetched[j][0], z)
            m = m | (sel & fetched[j][1])
        # rays whose cell fell outside the enumerated shells retire
        # invalid BEFORE the step (never falsely valid)
        bad = (st["done"] == 0.0) & ~m
        badf = bad.astype(jnp.float32)
        st["done"] = jnp.maximum(st["done"], badf)
        st["oob"] = jnp.maximum(st["oob"], badf)
        mpx = w * st["px"]
        mpy = h * st["py"]
        st, aux = _step(c, st, z, float(i),
                        mip0sample=(i < 15), min_mip=0, fovy=fovy,
                        aspect=aspect, znear=znear, zfar=zfar,
                        mip_resx=float(w), mip_resy=float(h),
                        mpx=mpx, mpy=mpy)
        k = k + aux["advanced"].astype(jnp.int32)

    for i, key in enumerate(_ST):
        out_ref[i] = st[key].astype(jnp.float32)


def _phase_a_xla(cons, mip0, *, h, w, hp, wp, fovy, aspect, znear, zfar,
                 n_iters, banded=False):
    """Pure-XLA replica of _phase_a_kernel (bit-identical semantics,
    including the ring-shell drop policy). Used for interpret=True:
    Pallas interpret mode of the unrolled select chain takes tens of
    minutes to compile on XLA:CPU, and the window reads are exact f32
    either way — the enumerated diamond rings r in [shell_lo, shell_hi]
    are exactly the cells with L1 norm in that range."""
    c = {k: cons[i] for i, k in enumerate(_CN)}
    c["mx"] = 0.005 / w
    c["my"] = 0.005 / h
    c.update(_derive(c))

    zero = jnp.zeros((hp, wp), jnp.float32)
    st = dict(px=c["ox"], py=c["oy"], pz=c["oz"], t=zero,
              mip=jnp.zeros((hp, wp), jnp.int32), hor=zero, done=zero,
              oob=zero, iters=zero)
    cpx = w * c["ox"]
    cpy = h * c["oy"]
    t0x = ((jnp.floor(cpx) + c["flo_x"]) / w + c["uvo_x"] - c["ox"]) \
        * c["inv_x"]
    t0y = ((jnp.floor(cpy) + c["flo_y"]) / h + c["uvo_y"] - c["oy"]) \
        * c["inv_y"]
    ct = jnp.minimum(t0x, t0y)
    st["t"] = ct
    st["px"] = c["ox"] + ct * c["dx"]
    st["py"] = c["oy"] + ct * c["dy"]
    st["pz"] = c["oz"] + ct * c["dz"]

    if banded:
        gy = cons[N_CONS].astype(jnp.int32)
    else:
        gy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)

    fetched = []
    lt = st["t"]
    for j in range(n_iters):
        lpx = c["ox"] + lt * c["dx"]
        lpy = c["oy"] + lt * c["dy"]
        mpx = w * lpx
        mpy = h * lpy
        xi = jnp.clip(mpx.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(mpy.astype(jnp.int32), 0, h - 1)
        l1 = jnp.abs(yi - gy) + jnp.abs(xi - gx)
        shell_lo = max(0, j + 1 - _A_DELTA)
        shell_hi = min(j + 1 + _A_DELTA, _A_RMAX)
        matched = (l1 >= shell_lo) & (l1 <= shell_hi)
        z = jnp.where(matched, mip0[yi, xi], 0.0)
        fetched.append((z, matched))
        tx_ = ((jnp.floor(mpx) + c["flo_x"]) / w + c["uvo_x"] - c["ox"]) \
            * c["inv_x"]
        ty_ = ((jnp.floor(mpy) + c["flo_y"]) / h + c["uvo_y"] - c["oy"]) \
            * c["inv_y"]
        lt = jnp.clip(jnp.minimum(tx_, ty_), -1e20, 1e20)

    k = jnp.zeros((hp, wp), jnp.int32)
    for i in range(n_iters):
        z = zero
        m = jnp.zeros((hp, wp), jnp.bool_)
        for j in range(i + 1):
            sel = k == j
            z = jnp.where(sel, fetched[j][0], z)
            m = m | (sel & fetched[j][1])
        bad = (st["done"] == 0.0) & ~m
        badf = bad.astype(jnp.float32)
        st["done"] = jnp.maximum(st["done"], badf)
        st["oob"] = jnp.maximum(st["oob"], badf)
        mpx = w * st["px"]
        mpy = h * st["py"]
        st, aux = _step(c, st, z, float(i),
                        mip0sample=(i < 15), min_mip=0, fovy=fovy,
                        aspect=aspect, znear=znear, zfar=zfar,
                        mip_resx=float(w), mip_resy=float(h),
                        mpx=mpx, mpy=mpy)
        k = k + aux["advanced"].astype(jnp.int32)
    return jnp.stack([st[key].astype(jnp.float32) for key in _ST])


# ------------------------------------------------------------ phase B

_M0_CHUNK = 1024  # mip-0 table rows per one-hot chunk (window fallback)
_M0_WIN = 256     # mip-0 dynamic-window rows (16-aligned bf16 VMEM slice)
# Ablations measured perf-NEUTRAL on v5e and therefore NOT taken
# (experiments/phase_b_ablate.py, 2026-08-18): 2x loop-body unroll
# (5.55 vs 5.57 us/tile-iter) and packing each hi/lo pair as one
# [hi | lo] (R, 256) einsum operand (5.58 us). The loop skeleton
# itself is free (nofetch 0.06 us/tile-iter) — all cost is in the
# fetch machinery, so the levers are fewer fetches, not cheaper trips.


def _phase_b_kernel(cs_ref, hi_ref, lo_ref, hi0_ref, lo0_ref, out_ref, *,
                    h, w, offsets, widths, heights, fovy, aspect,
                    znear, zfar, start_iter, end_iter, ablate="",
                    classgate=False):
    """Global hierarchical march, iterations [start_iter, end_iter).

    Fetch cost is split by mip class: rays CRUISE at coarse mips, so the
    mips>=2 subtable (~1/4 of the pyramid rows after per-mip 128-texel
    alignment) is one-hot-gathered every iteration, while the mip-1
    subtable (~3/4 of the rows) is cond-skipped on iterations where no
    ray in the tile sits at mip 1. Fetches at mip 0 hit the
    full-resolution mip-0 table (hi0/lo0) via a CHUNKED one-hot (its row
    count exceeds what a single one-hot intermediate can hold in VMEM);
    a tile skips that work entirely on iterations where none of its rays
    are at mip 0 (lax.cond). The march is therefore exact at every
    level — no hit-candidate approximation."""
    c = {k: cs_ref[i] for i, k in enumerate(_CN)}
    c["mx"] = 0.005 / w
    c["my"] = 0.005 / h
    c.update(_derive(c))
    st = {k: cs_ref[N_CONS + i] for i, k in enumerate(_ST)}
    st["mip"] = st["mip"].astype(jnp.int32)

    n_levels = len(offsets)
    R = hi_ref.shape[0]
    R0 = hi0_ref.shape[0]

    def contract(oh, hi_slice, lo_slice):
        # one fetch = the bf16 hi + residual-lo einsum pair
        part = jnp.einsum("slh,hw->slw", oh, hi_slice,
                          preferred_element_type=jnp.float32)
        return part + jnp.einsum("slh,hw->slw", oh, lo_slice,
                                 preferred_element_type=jnp.float32)

    # mip-1 rows [0, row2) / coarse rows [row2, R) — offsets are 128-
    # texel aligned per mip so the split is row-exact
    row2 = offsets[1] >> 7 if n_levels >= 2 else R
    if row2 < R:
        rc_iota = jax.lax.broadcasted_iota(
            jnp.int32, (8, 128, R - row2), 2)
        hi_c = hi_ref[row2:, :]
        lo_c = lo_ref[row2:, :]
    if row2 > 0:
        r1_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, row2), 2)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    ck_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, _M0_CHUNK), 2)
    w0_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, _M0_WIN), 2)

    def cond(carry):
        i, st = carry
        return (i < end_iter) & jnp.any(st["done"] == 0.0)

    def body(carry):
        i, st = carry
        act = st["done"] == 0.0
        at0 = (st["mip"] == 0) & act
        at1 = (st["mip"] == 1) & act
        mipf = st["mip"].astype(jnp.float32)
        mip_resx = w * jnp.exp2(-mipf)
        mip_resy = h * jnp.exp2(-mipf)
        mip = jnp.clip(st["mip"], 1, n_levels)  # coarse fetch level
        mpx = mip_resx * st["px"]
        mpy = mip_resy * st["py"]
        xi = mpx.astype(jnp.int32)
        yi = mpy.astype(jnp.int32)
        # per-level clamp + flat offset via static where-chains
        off = jnp.full_like(xi, offsets[0])
        wl = jnp.full_like(xi, widths[0])
        hl = jnp.full_like(xi, heights[0])
        for lvl in range(2, n_levels + 1):
            sel = mip == lvl
            off = jnp.where(sel, offsets[lvl - 1], off)
            wl = jnp.where(sel, widths[lvl - 1], wl)
            hl = jnp.where(sel, heights[lvl - 1], hl)
        xi = jnp.clip(xi, 0, wl - 1)
        yi = jnp.clip(yi, 0, hl - 1)
        flat = off + yi * wl + xi
        frow = flat >> 7
        if row2 < R and "nocoarse" not in ablate:
            # coarse class (mips >= 2): fine rays' frow < row2 never
            # matches the one-hot, and done rays' surface_z is ignored
            # by _step (the mip-1 class already masks them out), so the
            # fetch only ever SERVES act & mip>=2 rays
            def fetchc():
                ohc = ((frow - row2)[..., None]
                       == rc_iota).astype(jnp.bfloat16)
                return contract(ohc, hi_c, lo_c)

            if classgate:
                # VKR_MARCH_CLASSGATE experiment: skip the coarse einsum
                # pair on iterations where the tile has no cruising ray
                # (pays off only with mip-class-sorted compaction, which
                # makes blocks fetch-class-homogeneous)
                rs = jax.lax.cond(
                    jnp.any((st["mip"] >= 2) & act), fetchc,
                    lambda: jnp.zeros((8, 128, 128), jnp.float32))
            else:
                rs = fetchc()
        else:
            rs = jnp.zeros((8, 128, 128), jnp.float32)

        # mip-1 class: skipped on iterations where the tile has no
        # mip-1 ray (post-prefix rays cruise at mips >= 2 and only dip
        # through 1 while refining a hit candidate)
        def fetch1():
            oh1 = (jnp.where(at1, frow, -1)[..., None]
                   == r1_iota).astype(jnp.bfloat16)
            return contract(oh1, hi_ref[:row2, :], lo_ref[:row2, :])

        if row2 > 0 and "nomip1" not in ablate:
            rs = rs + jax.lax.cond(
                jnp.any(at1), fetch1,
                lambda: jnp.zeros((8, 128, 128), jnp.float32))
        if "nocol" in ablate:
            surface_z = rs[:, :, 0]
        else:
            colh = (flat & 127)[..., None] == col_iota
            surface_z = jnp.where(colh, rs, 0.0).sum(-1)

        # exact mip-0 fetch for rays at the finest level (skipped when
        # the whole tile has none this iteration)
        xi0 = jnp.clip((w * st["px"]).astype(jnp.int32), 0, w - 1)
        yi0 = jnp.clip((h * st["py"]).astype(jnp.int32), 0, h - 1)
        flat0 = yi0 * w + xi0
        f0row = flat0 >> 7
        f0col = (flat0 & 127)[..., None] == col_iota

        def fetch0():
            # Rays at mip 0 are spatially coherent (phase A starts them
            # in their own tile, and compaction preserves pixel order),
            # so ONE dynamic 256-row VMEM window anchored at the tile's
            # minimum active row covers nearly all of them — a ~4x
            # smaller one-hot build + einsum pair than the 1024-row
            # chunked path (measured the dominant phase-B cost at ~6 us
            # per firing iteration). Stragglers beyond the window fall
            # back to the chunked path, cond-gated per chunk; both paths
            # read the SAME hi0/lo0 tables, so values are bit-identical.
            big = jnp.asarray(1 << 30, jnp.int32)
            rowmin = jnp.min(jnp.where(at0, f0row, big))
            base = jnp.minimum((rowmin // 16) * 16, R0 - _M0_WIN)
            base = pl.multiple_of(jnp.maximum(base, 0), 16)
            rel = f0row - base  # >= 0 for at0 rays by construction
            covered = at0 & (rel < _M0_WIN)
            ohw = (jnp.where(covered, rel, -1)[..., None]
                   == w0_iota).astype(jnp.bfloat16)
            acc = contract(ohw, hi0_ref[pl.ds(base, _M0_WIN), :],
                           lo0_ref[pl.ds(base, _M0_WIN), :])

            outside = at0 & ~covered

            def far():
                facc = jnp.zeros((8, 128, 128), jnp.float32)
                for s in range(0, R0, _M0_CHUNK):
                    in_chunk = outside & (f0row >= s) \
                        & (f0row < s + _M0_CHUNK)

                    def hit(s=s):
                        oh0 = ((jnp.where(in_chunk, f0row, -1) - s)
                               [..., None] == ck_iota
                               ).astype(jnp.bfloat16)
                        return contract(
                            oh0, hi0_ref[s : s + _M0_CHUNK, :],
                            lo0_ref[s : s + _M0_CHUNK, :])

                    facc = facc + jax.lax.cond(
                        jnp.any(in_chunk), hit,
                        lambda: jnp.zeros((8, 128, 128), jnp.float32))
                return facc

            acc = acc + jax.lax.cond(
                jnp.any(outside), far,
                lambda: jnp.zeros((8, 128, 128), jnp.float32))
            return jnp.where(f0col, acc, 0.0).sum(-1)

        if "nomip0" not in ablate:
            z0 = jax.lax.cond(jnp.any(at0), fetch0,
                              lambda: jnp.zeros((8, 128), jnp.float32))
            surface_z = jnp.where(at0, z0, surface_z)

        st, _ = _step(c, st, surface_z, i.astype(jnp.float32),
                      mip0sample=False, min_mip=0, fovy=fovy,
                      aspect=aspect, znear=znear, zfar=zfar,
                      mip_resx=mip_resx, mip_resy=mip_resy,
                      mpx=mpx, mpy=mpy)
        return i + 1, st

    _, st = jax.lax.while_loop(
        cond, body, (jnp.asarray(start_iter, jnp.int32), st)
    )
    for i, k in enumerate(_ST):
        out_ref[i] = st[k].astype(jnp.float32)


def _phase_b_xla(cs, hi, lo, hi0, lo0, *, h, w, offsets, widths, heights,
                 fovy, aspect, znear, zfar, start_iter, end_iter):
    """Pure-XLA replica of _phase_b_kernel for interpret=True — same
    fetch semantics INCLUDING the bf16 hi+lo table quantization (the
    one-hot MXU einsum reconstructs exactly hi[r]+lo[r] in f32), so CPU
    tests see the compiled path's numerics. cs: (N_CONS+N_STATE, n)."""
    c = {k: cs[i] for i, k in enumerate(_CN)}
    c["mx"] = 0.005 / w
    c["my"] = 0.005 / h
    c.update(_derive(c))
    st0 = {k: cs[N_CONS + i] for i, k in enumerate(_ST)}
    st0["mip"] = st0["mip"].astype(jnp.int32)
    n_levels = len(offsets)
    hi_f = hi.reshape(-1)
    lo_f = lo.reshape(-1)
    hi0_f = hi0.reshape(-1)
    lo0_f = lo0.reshape(-1)

    def cond(carry):
        i, st = carry
        return (i < end_iter) & jnp.any(st["done"] == 0.0)

    def body(carry):
        i, st = carry
        at0 = (st["mip"] == 0) & (st["done"] == 0.0)
        mipf = st["mip"].astype(jnp.float32)
        mip_resx = w * jnp.exp2(-mipf)
        mip_resy = h * jnp.exp2(-mipf)
        mip = jnp.clip(st["mip"], 1, n_levels)
        mpx = mip_resx * st["px"]
        mpy = mip_resy * st["py"]
        xi = mpx.astype(jnp.int32)
        yi = mpy.astype(jnp.int32)
        off = jnp.full_like(xi, offsets[0])
        wl = jnp.full_like(xi, widths[0])
        hl = jnp.full_like(xi, heights[0])
        for lvl in range(2, n_levels + 1):
            sel = mip == lvl
            off = jnp.where(sel, offsets[lvl - 1], off)
            wl = jnp.where(sel, widths[lvl - 1], wl)
            hl = jnp.where(sel, heights[lvl - 1], hl)
        xi = jnp.clip(xi, 0, wl - 1)
        yi = jnp.clip(yi, 0, hl - 1)
        flat = off + yi * wl + xi
        surface_z = hi_f[flat].astype(jnp.float32) \
            + lo_f[flat].astype(jnp.float32)
        xi0 = jnp.clip((w * st["px"]).astype(jnp.int32), 0, w - 1)
        yi0 = jnp.clip((h * st["py"]).astype(jnp.int32), 0, h - 1)
        flat0 = yi0 * w + xi0
        z0 = hi0_f[flat0].astype(jnp.float32) \
            + lo0_f[flat0].astype(jnp.float32)
        surface_z = jnp.where(at0, z0, surface_z)
        st, _ = _step(c, st, surface_z, i.astype(jnp.float32),
                      mip0sample=False, min_mip=0, fovy=fovy,
                      aspect=aspect, znear=znear, zfar=zfar,
                      mip_resx=mip_resx, mip_resy=mip_resy,
                      mpx=mpx, mpy=mpy)
        return i + 1, st

    _, st = jax.lax.while_loop(
        cond, body, (jnp.asarray(start_iter, jnp.int32), st0)
    )
    return jnp.stack([st[k].astype(jnp.float32) for k in _ST])


# -------------------------------------------------------------- driver

def _pad2(a, hp, wp, value):
    h, w = a.shape[:2]
    return jnp.pad(a, ((0, hp - h), (0, wp - w)) + ((0, 0),) * (a.ndim - 2),
                   constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("shapes", "fovy", "aspect", "znear", "zfar",
                     "max_iterations", "compact_frac", "interpret"),
)
def _march_impl(mips, origin, direction, camera_start, w0, row0, *,
                shapes, fovy, aspect, znear, zfar, max_iterations,
                compact_frac, interpret):
    h, w = shapes[0]
    banded = row0 is not None
    bh = origin.shape[0]  # band rows (== h when not banded)
    hp = -(-bh // 8) * 8
    wp = -(-w // 128) * 128

    # per-ray constants, padded so pad rays retire out-of-bounds at once
    chans = [origin[..., 0], origin[..., 1], origin[..., 2],
             direction[..., 0], direction[..., 1], direction[..., 2],
             camera_start[..., 0], camera_start[..., 1],
             camera_start[..., 2],
             w0[..., 0], w0[..., 1], w0[..., 2]]
    pad_vals = [2.0, 2.0, 0.5, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                1.0]
    n_cons_a = N_CONS
    if banded:
        # band mode: phase A needs each ray's GLOBAL pixel row (the
        # window DMA stays band-local; lattice cells are global)
        prow = (row0 + jnp.arange(bh, dtype=jnp.float32))[:, None] \
            * jnp.ones((1, w), jnp.float32)
        chans.append(prow)
        pad_vals.append(-1e6)
        n_cons_a = N_CONS + 1
    cons = jnp.stack(
        [_pad2(chans[i], hp, wp, pad_vals[i])
         for i in range(len(chans))]
    )

    # phase-A mip-0 window source: rows [row0 - 24, row0 + bh + 24) of
    # the far-plane-padded full-res depth (static slice size; row0 is
    # traced in band mode)
    dpad_full = jnp.pad(
        jnp.pad(mips[0], ((0, hp - bh if not banded else 0), (0, wp - w)),
                constant_values=1.0),
        # banded: +8 extra far-plane rows so the LAST band's slice stays
        # in range when its height pads up to a multiple of 8
        ((24, 32 if banded else 24), (128, 128)), constant_values=1.0)
    if banded:
        dpad = jax.lax.dynamic_slice(
            dpad_full, (row0, 0), (hp + 48, dpad_full.shape[1]))
    else:
        dpad = dpad_full

    n_a = min(16, max_iterations)
    grid_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(hp // 8, wp // 128),
        in_specs=[
            pl.BlockSpec((n_cons_a, 8, 128), lambda i, j: (0, i, j)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((N_STATE, 8, 128), lambda i, j: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((_A_WIN_H, _A_WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    if interpret:
        state = _phase_a_xla(
            cons, mips[0], h=h, w=w, hp=hp, wp=wp,
            fovy=fovy, aspect=aspect, znear=znear, zfar=zfar,
            n_iters=n_a, banded=banded,
        )
    else:
        state = pl.pallas_call(
            functools.partial(
                _phase_a_kernel, h=h, w=w, fovy=fovy, aspect=aspect,
                znear=znear, zfar=zfar, n_iters=n_a, banded=banded,
            ),
            grid_spec=grid_a,
            out_shape=jax.ShapeDtypeStruct((N_STATE, hp, wp), jnp.float32),
            interpret=interpret,
        )(cons, dpad)
    cons = cons[:N_CONS]  # phase B uses only the uv-space constants

    # full pyramid as VMEM tables, bf16 hi + residual lo: mips >= 1
    # flat-packed together, mip 0 (full res, padded) separate
    def hilo(t):
        t_hi = t.astype(jnp.bfloat16)
        return t_hi, (t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # each mip 128-texel aligned (mip-1 end 1024-aligned: the kernel
    # splits the table at that row with an 8-row-block ref slice)
    segs = []
    off = 0
    offsets, widths, heights = [], [], []
    for li, m in enumerate(mips[1:]):
        mh, mw = m.shape
        offsets.append(off)
        widths.append(mw)
        heights.append(mh)
        seg = m.reshape(-1)
        align = 1024 if li == 0 else 128
        pad = (-seg.shape[0]) % align
        if pad:
            seg = jnp.pad(seg, (0, pad), constant_values=1.0)
        segs.append(seg)
        off += seg.shape[0]
    flat1 = jnp.concatenate(segs)
    rpad = (-flat1.shape[0]) % 1024
    flat1 = jnp.pad(flat1, (0, rpad), constant_values=1.0)
    tbl_hi, tbl_lo = hilo(flat1.reshape(-1, 128))
    flat0 = mips[0].reshape(-1)
    # pad to whole one-hot chunks (the kernel slices the table in
    # _M0_CHUNK-row blocks; partial blocks are illegal ref slices)
    rpad0 = (-flat0.shape[0]) % (128 * _M0_CHUNK)
    flat0 = jnp.pad(flat0, (0, rpad0), constant_values=1.0)
    tbl0_hi, tbl0_lo = hilo(flat0.reshape(-1, 128))

    def run_phase_b(cs_blocks, n_rays, start_iter, end_iter):
        if interpret:
            return _phase_b_xla(
                cs_blocks.reshape(N_CONS + N_STATE, n_rays),
                tbl_hi, tbl_lo, tbl0_hi, tbl0_lo, h=h, w=w,
                offsets=tuple(offsets), widths=tuple(widths),
                heights=tuple(heights), fovy=fovy, aspect=aspect,
                znear=znear, zfar=zfar, start_iter=start_iter,
                end_iter=end_iter,
            ).reshape(N_STATE, n_rays // 128, 128)
        grid_b = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_rays // 1024,),
            in_specs=[
                pl.BlockSpec((N_CONS + N_STATE, 8, 128),
                             lambda i: (0, i, 0)),
                pl.BlockSpec(tbl_hi.shape, lambda i: (0, 0)),
                pl.BlockSpec(tbl_hi.shape, lambda i: (0, 0)),
                pl.BlockSpec(tbl0_hi.shape, lambda i: (0, 0)),
                pl.BlockSpec(tbl0_hi.shape, lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((N_STATE, 8, 128),
                                   lambda i: (0, i, 0)),
        )
        return pl.pallas_call(
            functools.partial(
                _phase_b_kernel, h=h, w=w, offsets=tuple(offsets),
                widths=tuple(widths), heights=tuple(heights), fovy=fovy,
                aspect=aspect, znear=znear, zfar=zfar,
                start_iter=start_iter, end_iter=end_iter,
                # measurement-only: experiments/march_inner.py ablations
                # (VKR_MARCH_ABLATE="nocoarse,nomip1,nocol,nomip0" subsets);
                # production traces always see "" (same lowered HLO)
                ablate=os.environ.get("VKR_MARCH_ABLATE", ""),
                classgate=bool(os.environ.get("VKR_MARCH_CLASSGATE")),
            ),
            grid_spec=grid_b,
            out_shape=jax.ShapeDtypeStruct(
                (N_STATE, n_rays // 128, 128), jnp.float32
            ),
            interpret=interpret,
        )(cs_blocks, tbl_hi, tbl_lo, tbl0_hi, tbl0_lo)

    n_px = hp * wp
    b1_end = min(n_a + 16, max_iterations)
    if max_iterations > n_a:
        # ---- phase B1: iters 16..32 UNCOMPACTED (most rays are still
        # alive right after the prefix — compacting here would drop
        # them; tiles whose rays all retired exit after one check)
        cs = jnp.concatenate(
            [cons.reshape(N_CONS, n_px), state.reshape(N_STATE, n_px)]
        )  # (21, n_px)
        st1 = run_phase_b(
            cs.reshape(N_CONS + N_STATE, n_px // 128, 128), n_px,
            n_a, b1_end,
        ).reshape(N_STATE, n_px)
        state = st1.reshape(N_STATE, hp, wp)

    # ---- compacted segments: survivors (actives first) are packed with
    # a single-key sort + one row gather, marched, and scattered back.
    # Aliveness decays geometrically, so a SECOND compaction 16
    # iterations in shrinks the tile count again (measured on the bench
    # scene: 49% alive at 32, 15% at 48).
    assert n_px < (1 << 24), (
        f"{n_px} rays exceed the 24-bit compaction key (8K+ full-res"
        " marches need a wider key)"
    )
    seg_starts = [b1_end, min(b1_end + 16, max_iterations)]
    # compact_frac >= 1 means "never drop" (tests) — keep segment 2 at
    # full capacity too
    seg_fracs = [compact_frac,
                 compact_frac if compact_frac >= 1.0
                 else compact_frac * 0.4]
    di = _ST.index("done")
    oi = _ST.index("oob")
    for si, seg_start in enumerate(seg_starts):
        seg_end = (seg_starts[si + 1] if si + 1 < len(seg_starts)
                   else max_iterations)
        if seg_end <= seg_start:
            continue
        cs = jnp.concatenate(
            [cons.reshape(N_CONS, n_px), state.reshape(N_STATE, n_px)]
        )
        cap = max(1024, int(n_px * seg_fracs[si]) // 1024 * 1024)
        # the sort key packs the ray index into 24 bits under the done
        # flag (cf. bin_triangles' guarded packed sort)
        done_f = cs[N_CONS + di] > 0.5
        ray_ix = jnp.arange(n_px, dtype=jnp.int32)
        if os.environ.get("VKR_MARCH_MIPSORT"):
            # experiment (pair with VKR_MARCH_CLASSGATE): pack survivors
            # sorted by fetch class — crawlers (mip <= 1) first, cruisers
            # (mip >= 2) after — so compacted blocks become fetch-class-
            # homogeneous and the kernel's per-class conds actually skip.
            # Pixel order is preserved WITHIN each class, keeping the
            # mip-0 window's spatial-coherence assumption intact.
            cruise = cs[N_CONS + _ST.index("mip")] >= 1.5
            key = (done_f.astype(jnp.int32) * (1 << 25)
                   + cruise.astype(jnp.int32) * (1 << 24) + ray_ix)
        else:
            key = done_f.astype(jnp.int32) * (1 << 24) + ray_ix
        idx = (jnp.sort(key)[:cap]) & ((1 << 24) - 1)
        comp = cs.T[idx].T  # one row gather: (21, cap)

        st_b = run_phase_b(
            comp.reshape(N_CONS + N_STATE, cap // 128, 128), cap,
            seg_start, seg_end,
        ).reshape(N_STATE, cap)

        # Scatter the compacted results back. Actives beyond capacity
        # are invalidated (never falsely valid) — the same drop policy
        # as the XLA path's compaction.
        selected = jnp.zeros((n_px,), bool).at[idx].set(True)
        dropped = ~done_f & ~selected
        state_f = state.reshape(N_STATE, n_px).at[:, idx].set(st_b)
        state_f = state_f.at[di].set(
            jnp.where(dropped, 1.0, state_f[di])
        )
        state_f = state_f.at[oi].set(
            jnp.where(dropped, 1.0, state_f[oi])
        )
        state = state_f.reshape(N_STATE, hp, wp)

    def ch(k):
        return state[_ST.index(k), :bh, :w]

    done = ch("done") > 0.5
    oob = ch("oob") > 0.5
    iters = jnp.where(done & ~oob, ch("iters").astype(jnp.int32),
                      max_iterations + 1)
    position = jnp.stack([ch("px"), ch("py"), ch("pz")], axis=-1)
    position = jnp.where(jnp.isfinite(position), position, 0.0)
    position = jnp.clip(position, -1e6, 1e6)
    return position, ch("hor"), iters



def hierarchical_march_pallas(mips, origin, direction, camera_start, w0,
                              params, max_iterations,
                              compact_frac: float = 0.5,
                              interpret: bool = False,
                              row0=None):
    """Drop-in Pallas replacement for ssr._hierarchical_march
    (find_hor=True). mips: list of (h_l, w_l) depth arrays (the hi-Z
    pyramid). Returns (position (h, w, 3), hor (h, w), iters (h, w)).

    row0 (band mode, parallel/band.py): origin/direction/... cover only
    rows [row0, row0 + band_h) of the trace grid while mips stay
    full-frame; row0 may be traced (any value — the phase-A window
    slice carries global pixel rows per ray)."""
    shapes = tuple((int(m.shape[0]), int(m.shape[1])) for m in mips)
    return _march_impl(
        tuple(mips), origin, direction, camera_start, w0, row0,
        shapes=shapes,
        fovy=float(params.fovy), aspect=float(params.aspect),
        znear=float(params.znear), zfar=float(params.zfar),
        max_iterations=int(max_iterations),
        compact_frac=float(compact_frac), interpret=bool(interpret),
    )
