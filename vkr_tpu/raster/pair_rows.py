"""Combined per-pair row builder shared by the raster and resolve kernels.

Both kernels walk the same binned pair segments; building one 64-f32 row
per pair with a SINGLE gather (instead of ~12 separate per-field gathers
at XLA's scalarized gather rate) was worth ~120 ms/frame at 1080p.

Row layout (64 f32, 2 pairs per 128-lane row; segment starts are
PAIR_ALIGN-aligned so chunk DMAs stay 128-aligned):
  [0:3]   edge a coefficients     (raster)
  [3:6]   edge b coefficients
  [6:9]   edge c constants (fill-rule biased)
  [9:12]  depth plane za zb zc
  [12]    triangle id (f32-exact)
  [13:16] pad
  [16:19] perspective denominator plane (sum e_i / w_i)  (resolve)
  [19:46] 9 attribute/w planes x (p, q, r)
  [46]    material id
  [47:64] pad
"""

from __future__ import annotations

import jax.numpy as jnp

ROW_WIDTH = 64
PAIRS_PER_ROW = 128 // ROW_WIDTH  # 2
RASTER_BASE = 0
RESOLVE_BASE = 16
N_CHANNELS = 9
_CHUNK = 32  # pairs per kernel DMA chunk (kernel.py/gbuf_kernel.py)


def build_tri_rows(setup, corner_attrs=None, tri_mat=None):
    """Per-clipped-triangle 64-f32 rows (TC, 64).

    corner_attrs: optional (TC, 3, 9) per-corner attribute values; when
    None the resolve fields are zeros (visibility-only rasterization).
    """
    tc = setup.a.shape[0]
    ids = jnp.arange(tc, dtype=jnp.float32)[:, None]
    pad3 = jnp.zeros((tc, 3), jnp.float32)

    if corner_attrs is not None:
        inv_w = setup.inv_w  # (TC, 3)
        denom = jnp.stack(
            [
                (setup.a * inv_w).sum(-1),
                (setup.b * inv_w).sum(-1),
                (setup.c * inv_w).sum(-1),
            ],
            axis=-1,
        )
        aw = corner_attrs * inv_w[..., None]  # (TC, 3, 9)
        ch_p = jnp.einsum("ti,tik->tk", setup.a, aw, precision="highest")
        ch_q = jnp.einsum("ti,tik->tk", setup.b, aw, precision="highest")
        ch_r = jnp.einsum("ti,tik->tk", setup.c, aw, precision="highest")
        ch = jnp.stack([ch_p, ch_q, ch_r], axis=-1).reshape(tc, -1)
        mat = tri_mat.astype(jnp.float32)[:, None]
    else:
        denom = jnp.zeros((tc, 3), jnp.float32)
        ch = jnp.zeros((tc, 3 * N_CHANNELS), jnp.float32)
        mat = jnp.full((tc, 1), -1.0, jnp.float32)

    return jnp.concatenate(
        [
            setup.a, setup.b, setup.c, setup.zplane, ids, pad3,
            denom, ch, mat,
            jnp.zeros((tc, ROW_WIDTH - 47), jnp.float32),
        ],
        axis=-1,
    )


def expand_pair_rows(tri_rows, pair_tri_sorted):
    """One gather: (TC, 64) x (CAP,) -> flat (n_rows, 128) pair buffer.

    Dead pairs (id -1) get c = -1 edges (never cover) and id -1. The tail
    is padded by 2 chunks so a segment starting near the end can round its
    DMA start down to an aligned row and still read whole chunks."""
    t = jnp.maximum(pair_tri_sorted, 0)
    rows = tri_rows[t]
    live = (pair_tri_sorted >= 0)[:, None]
    dead = jnp.zeros((1, ROW_WIDTH), jnp.float32)
    dead = dead.at[0, 6:9].set(-1.0).at[0, 12].set(-1.0).at[0, 46].set(-1.0)
    rows = jnp.where(live, rows, dead)
    pad = jnp.zeros((2 * _CHUNK, ROW_WIDTH), jnp.float32)
    return jnp.concatenate([rows, pad], axis=0).reshape(-1, 128)
