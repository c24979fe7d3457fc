"""Pallas tiled window-gather — fast bounded-offset bilinear resampling.

XLA's TPU gather is scalarized (~0.09 Gtaps/s); every reprojection-style
sample (TAA history, GTAO/SSR temporal accumulation) costs ~45 ms per
full-screen bilinear at 1080p. This kernel exploits two facts:

  * reprojection offsets are small (velocity-bounded), so every sample
    lies in a +-R pixel window around its pixel -> each (8, 128) tile only
    needs a (8+2R, 384) window of the source in VMEM;
  * Mosaic supports per-lane sublane gathers within a single (8, 128)
    vreg (`jnp.take_along_axis(t, i, axis=0)`), so the y-component of a
    gather is a few vreg ops; the x-component becomes a static-shift loop
    over the window's 128-aligned column slabs.

Per tile: DMA the window once, then for each static x-shift s in [-R, R]:
slice the window columns, x-lerp the two neighboring columns, per-lane
y-gather the rows y0/y0+1 (composed over 8-row blocks), y-lerp, and select
the pixels whose integer x-offset is s. Offsets are clamped to +-R
(callers: reprojection already validates/rejects fast motion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
_COL_PAD = 128  # left/right window margin (>= radius, 128-aligned)


def _gather_rows(block_stack, y0, fy, n_blocks):
    """Per-lane bilinear row gather from a (8 * n_blocks, 128) window
    column set: returns value at (y0 + fy) per lane via composed
    single-vreg sublane gathers."""
    v0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    v1 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    y1 = y0 + 1
    for b in range(n_blocks):
        blk = block_stack[8 * b : 8 * b + 8, :]
        for ysel, acc_id in ((y0, 0), (y1, 1)):
            local = jnp.clip(ysel - 8 * b, 0, 7)
            g = jnp.take_along_axis(blk, local, axis=0)
            hit = (ysel >= 8 * b) & (ysel < 8 * b + 8)
            if acc_id == 0:
                v0 = jnp.where(hit, g, v0)
            else:
                v1 = jnp.where(hit, g, v1)
    return v0 + (v1 - v0) * fy


def _window_gather_kernel(
    img_hbm,     # (C, Hp, Wp) f32, pre-padded: rows +R+8, cols +128/side
    off_y_ref,   # (8, 128) f32 offsets in pixels
    off_x_ref,
    out_ref,     # (C, 8, 128) f32
    win,         # VMEM scratch (C, WR, 384)
    sem,
    *,
    radius: int,
    win_rows: int,
    channels: int,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    cp = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(ty * TILE_H, win_rows),
                   pl.ds(tx * TILE_W, 3 * TILE_W)],
        win,
        sem,
    )
    cp.start()
    cp.wait()

    r = float(radius)
    off_y = jnp.clip(off_y_ref[...], -r, r)
    off_x = jnp.clip(off_x_ref[...], -r, r)

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0
    ).astype(jnp.float32)
    wy = row_iota + radius + off_y
    wy = jnp.clip(wy, 0.0, win_rows - 1.001)
    y0 = wy.astype(jnp.int32)
    fy = wy - y0.astype(jnp.float32)

    sx = jnp.floor(off_x)
    fx = off_x - sx
    s_int = sx.astype(jnp.int32)

    n_blocks = win_rows // 8
    outs = [jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for _ in range(channels)]
    # Column sets of adjacent shifts overlap (shift s's right column is
    # shift s+1's left), so row-gather each column set once; the index
    # math (y0/fy/fx/shift select) is shared across channels.
    v_prev = [None] * channels
    for s in range(-radius, radius + 2):
        sel = s_int == (s - 1)
        for c in range(channels):
            cs = win[c, :, _COL_PAD + s : _COL_PAD + s + TILE_W]
            v_cur = _gather_rows(cs, y0, fy, n_blocks)
            if v_prev[c] is not None:
                val = v_prev[c] + (v_cur - v_prev[c]) * fx
                outs[c] = jnp.where(sel, val, outs[c])
            v_prev[c] = v_cur
    for c in range(channels):
        out_ref[c] = outs[c]


def _pad_image(img, radius: int):
    """Edge-pad so every window DMA is in range and 128-aligned."""
    h, w = img.shape
    hp = ((h + TILE_H - 1) // TILE_H) * TILE_H
    wp = ((w + TILE_W - 1) // TILE_W) * TILE_W
    return jnp.pad(
        img,
        ((radius, radius + (hp - h) + TILE_H),
         (_COL_PAD, _COL_PAD + (wp - w) + TILE_W)),
        mode="edge",
    )


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def window_gather_bilinear(img, off_y, off_x, *, radius: int = 16,
                           interpret: bool = False, row0=None):
    """Bilinear sample of `img` at (y + off_y, x + off_x) per pixel,
    offsets clamped to +-radius pixels, clamp-to-edge.

    img: (H, W) or (H, W, C) f32; off_*: (H, W) f32 in pixel units.
    Multi-channel images run in ONE kernel (shared index math and a single
    windowed DMA per tile).

    row0 (band mode): off_* cover only output rows [row0, row0 + bh) of
    the full `img` frame — the padded image is sliced so each tile's
    window DMA lands on its global rows; row0 may be traced.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    channels = img.shape[-1]

    h, w = off_y.shape[:2]
    tiles_y = -(-h // TILE_H)
    tiles_x = -(-w // TILE_W)
    # +1 row so the y0+1 tap at the max positive offset stays in-window
    win_rows = ((TILE_H + 2 * radius + 1 + 7) // 8) * 8

    img_cm = jnp.moveaxis(img.astype(jnp.float32), -1, 0)  # (C, H, W)
    img_p = jnp.stack(
        [_pad_image(img_cm[c], radius) for c in range(channels)], axis=0
    )
    hp = tiles_y * TILE_H
    wp = tiles_x * TILE_W
    if row0 is not None:
        img_p = jax.lax.dynamic_slice(
            img_p, (0, row0, 0),
            (channels, hp + 2 * radius + TILE_H, img_p.shape[2]))

    def pad2(a):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_window_gather_kernel, radius=radius,
                          win_rows=win_rows, channels=channels),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec(
            (channels, TILE_H, TILE_W), lambda i, j: (0, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((channels, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((channels, win_rows, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, pad2(off_y), pad2(off_x))
    out = jnp.moveaxis(out[:, :h, :w], 0, -1)
    return out[..., 0] if squeeze else out


def _window_gather_multi_kernel(
    img_hbm,     # (1, Hp, Wp) f32, pre-padded
    off_y_ref,   # (K, 8, 128) f32 offsets in pixels
    off_x_ref,
    out_ref,     # (K, 8, 128) f32
    win,         # VMEM scratch (1, WR, 384)
    sem,
    *,
    radius: int,
    win_rows: int,
    k_sets: int,
):
    """K offset sets against ONE single-channel image, sharing the
    per-tile window DMA (the GTAO march: 16 collinear steps sample the
    same depth image — re-DMAing the window per step would dominate)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    cp = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(ty * TILE_H, win_rows),
                   pl.ds(tx * TILE_W, 3 * TILE_W)],
        win,
        sem,
    )
    cp.start()
    cp.wait()

    r = float(radius)
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0
    ).astype(jnp.float32)
    n_blocks = win_rows // 8
    for k in range(k_sets):
        off_y = jnp.clip(off_y_ref[k], -r, r)
        off_x = jnp.clip(off_x_ref[k], -r, r)
        wy = jnp.clip(row_iota + radius + off_y, 0.0, win_rows - 1.001)
        y0 = wy.astype(jnp.int32)
        fy = wy - y0.astype(jnp.float32)
        sx = jnp.floor(off_x)
        fx = off_x - sx
        s_int = sx.astype(jnp.int32)
        out = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        v_prev = None
        for s in range(-radius, radius + 2):
            sel = s_int == (s - 1)
            cs = win[0, :, _COL_PAD + s : _COL_PAD + s + TILE_W]
            v_cur = _gather_rows(cs, y0, fy, n_blocks)
            if v_prev is not None:
                out = jnp.where(sel, v_prev + (v_cur - v_prev) * fx,
                                out)
            v_prev = v_cur
        out_ref[k] = out


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def window_gather_bilinear_multi(img, off_y, off_x, *, radius: int = 16,
                                 interpret: bool = False, row0=None):
    """K bilinear samples per pixel of ONE (H, W) image at
    (y + off_y[k], x + off_x[k]); offsets clamped to +-radius,
    clamp-to-edge. off_*: (K, h, w). Returns (K, h, w) f32.

    One kernel call shares the per-tile window DMA across all K sets
    (vs K separate window_gather_bilinear calls). row0: band mode as in
    window_gather_bilinear."""
    k_sets, h, w = off_y.shape
    tiles_y = -(-h // TILE_H)
    tiles_x = -(-w // TILE_W)
    win_rows = ((TILE_H + 2 * radius + 1 + 7) // 8) * 8
    img_p = _pad_image(img.astype(jnp.float32), radius)[None]
    hp = tiles_y * TILE_H
    wp = tiles_x * TILE_W
    if row0 is not None:
        img_p = jax.lax.dynamic_slice(
            img_p, (0, row0, 0),
            (1, hp + 2 * radius + TILE_H, img_p.shape[2]))

    def pad3(a):
        return jnp.pad(a.astype(jnp.float32),
                       ((0, 0), (0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_window_gather_multi_kernel, radius=radius,
                          win_rows=win_rows, k_sets=k_sets),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((k_sets, TILE_H, TILE_W), lambda i, j: (0, i, j)),
            pl.BlockSpec((k_sets, TILE_H, TILE_W), lambda i, j: (0, i, j)),
        ],
        out_specs=pl.BlockSpec(
            (k_sets, TILE_H, TILE_W), lambda i, j: (0, i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((k_sets, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, win_rows, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, pad3(off_y), pad3(off_x))
    return out[:, :h, :w]


def window_gather_reference(img, off_y, off_x, radius: int = 16):
    """jnp oracle with identical clamp semantics (slow XLA gather)."""
    from vkr_tpu.passes.sampling import bilinear_sample

    h, w = img.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    r = float(radius)
    sy = yy + 0.5 + jnp.clip(off_y, -r, r)
    sx = xx + 0.5 + jnp.clip(off_x, -r, r)
    uv = jnp.stack([sx / w, sy / h], axis=-1)
    return bilinear_sample(img, uv)


# ---------------------------------------------------- fused TAA gather

_TAA_TAPS = ((0, 0), (1, 0), (0, 1), (-1, 0), (0, -1))  # (dx, dy)


def _gather_rows4(block_stack, base, n_blocks):
    """Four consecutive window rows (base .. base+3) per lane via
    composed single-vreg sublane gathers. base may be -1 at the window
    edge; the never-selected row stays 0 (callers' row selection
    guarantees it is unused there)."""
    gs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(4)]
    for b in range(n_blocks):
        blk = block_stack[8 * b : 8 * b + 8, :]
        for j in range(4):
            ysel = base + j
            local = jnp.clip(ysel - 8 * b, 0, 7)
            g = jnp.take_along_axis(blk, local, axis=0)
            hit = (ysel >= 8 * b) & (ysel < 8 * b + 8)
            gs[j] = jnp.where(hit, g, gs[j])
    return gs


def _sel3(d, v0, v1, v2):
    return jnp.where(d == 0, v0, jnp.where(d == 1, v1, v2))


def _taa_gather_kernel(
    img_hbm,     # (4, Hp, Wp) f32: history rgb + prev depth, pre-padded
    off_y_ref,   # (8, 128) f32 reprojection offsets in pixels
    off_x_ref,
    out_ref,     # (16, 8, 128) f32: hist(3), 4 neighbor taps (12), depth
    win,         # VMEM scratch (4, WR, 384)
    sem,
    *,
    radius: int,
    win_rows: int,
):
    """Fused TAA history fetch: ONE window DMA per tile serves the
    center bilinear tap, the four +-1-texel neighbor taps (the history
    clamp box, resolve.comp textureOffset pattern) and the prev-depth
    tap — replacing SIX window_gather_bilinear calls (measured round 5:
    taa_resolve 29.9 ms/rep by K-rep differential, dominated by the
    repeated per-tile window DMAs + row gathers).

    Exact per-tap clamp semantics of window_gather_bilinear: each tap
    clamps (off + d) to +-radius independently, then clamps wy to the
    window. clip is monotone and 1-Lipschitz, so every tap's row index
    lies in [y0_center - 1, y0_center + 2]: FOUR consecutive row
    gathers per column set serve all taps exactly, clamp cases
    included. dx taps share the center's row phase; dy taps get their
    own (fy differs only at clamp edges)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    cp = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(ty * TILE_H, win_rows),
                   pl.ds(tx * TILE_W, 3 * TILE_W)],
        win,
        sem,
    )
    cp.start()
    cp.wait()

    r = float(radius)
    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_H, TILE_W), 0
    ).astype(jnp.float32)
    off_y = off_y_ref[...]
    off_x = off_x_ref[...]

    # row phases: dy = 0 (center + both dx taps), +1, -1
    phases = []
    for dy in (0, 1, -1):
        oy = jnp.clip(off_y + dy, -r, r)
        wy = jnp.clip(row_iota + radius + oy, 0.0, win_rows - 1.001)
        y0 = wy.astype(jnp.int32)
        phases.append((y0, wy - y0.astype(jnp.float32)))
    base = phases[0][0] - 1
    d_ph = [y0 - base for y0, _ in phases]  # each in {0, 1, 2}

    # per-tap x shift / fraction (independent clamp)
    sx, fx = [], []
    for dx, _ in _TAA_TAPS:
        ox = jnp.clip(off_x + dx, -r, r)
        s = jnp.floor(ox)
        sx.append(s.astype(jnp.int32))
        fx.append(ox - s)
    tap_phase = [0, 0, 1, 0, 2]  # dy of taps -> phase index

    n_blocks = win_rows // 8
    outs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(16)]
    v_prev = [[None] * 3 for _ in range(3)]  # [channel][phase]
    v_prev_d = None
    for s in range(-radius, radius + 2):
        v_cur = [[None] * 3 for _ in range(3)]
        for c in range(3):
            cs = win[c, :, _COL_PAD + s : _COL_PAD + s + TILE_W]
            g = _gather_rows4(cs, base, n_blocks)
            for q in range(3):
                v0 = _sel3(d_ph[q], g[0], g[1], g[2])
                v1 = _sel3(d_ph[q], g[1], g[2], g[3])
                v_cur[c][q] = v0 + (v1 - v0) * phases[q][1]
        csd = win[3, :, _COL_PAD + s : _COL_PAD + s + TILE_W]
        gd = _gather_rows4(csd, base, n_blocks)
        vd0 = _sel3(d_ph[0], gd[0], gd[1], gd[2])
        vd1 = _sel3(d_ph[0], gd[1], gd[2], gd[3])
        v_cur_d = vd0 + (vd1 - vd0) * phases[0][1]

        if v_prev[0][0] is not None:
            for k in range(5):
                q = tap_phase[k]
                sel = sx[k] == (s - 1)
                for c in range(3):
                    val = v_prev[c][q] + (v_cur[c][q] - v_prev[c][q]) \
                        * fx[k]
                    outs[3 * k + c] = jnp.where(sel, val, outs[3 * k + c])
            val_d = v_prev_d + (v_cur_d - v_prev_d) * fx[0]
            outs[15] = jnp.where(sx[0] == (s - 1), val_d, outs[15])
        v_prev = v_cur
        v_prev_d = v_cur_d
    for i in range(16):
        out_ref[i] = outs[i]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def taa_history_gather(history_color, history_depth, off_y, off_x, *,
                       radius: int = 16, interpret: bool = False,
                       row0=None):
    """All six TAA history fetches in one kernel call.

    history_color (H, W, 3) + history_depth (H, W), off_* (h, w) pixel
    offsets. Returns (hist (h, w, 3), [c0, c1, c2, c3] neighbor taps at
    (+1,0)/(0,+1)/(-1,0)/(0,-1) texels, prev_depth (h, w)) — each
    identical to the corresponding window_gather_bilinear call."""
    h, w = off_y.shape[:2]
    tiles_y = -(-h // TILE_H)
    tiles_x = -(-w // TILE_W)
    win_rows = ((TILE_H + 2 * radius + 1 + 7) // 8) * 8
    chans = [history_color[..., c] for c in range(3)] + [history_depth]
    img_p = jnp.stack(
        [_pad_image(c.astype(jnp.float32), radius) for c in chans],
        axis=0)
    hp = tiles_y * TILE_H
    wp = tiles_x * TILE_W
    if row0 is not None:
        img_p = jax.lax.dynamic_slice(
            img_p, (0, row0, 0),
            (4, hp + 2 * radius + TILE_H, img_p.shape[2]))

    def pad2(a):
        return jnp.pad(a.astype(jnp.float32), ((0, hp - h), (0, wp - w)))

    out = pl.pallas_call(
        functools.partial(_taa_gather_kernel, radius=radius,
                          win_rows=win_rows),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((16, TILE_H, TILE_W),
                               lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((16, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, win_rows, 3 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(img_p, pad2(off_y), pad2(off_x))
    out = out[:, :h, :w]
    hist = jnp.moveaxis(out[0:3], 0, -1)
    taps = [jnp.moveaxis(out[3 * k : 3 * k + 3], 0, -1)
            for k in range(1, 5)]
    return hist, taps, out[15]
