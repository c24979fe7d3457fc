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
