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


# ------------------------------------------------------- SoA twins (round 5)

def corner_attributes_pre_t(attr_t, weights, n_src: int):
    """resolve.corner_attributes_pre on component-major inputs.

    attr_t: (K, 3T) static per-corner attribute table (corner-major
    columns, built at scene upload); weights: [c][m] lists of (2T,) from
    setup.clip_near_corners_t. Returns cattrs [c][k] lists of (2T,) —
    same left-associated reduction as the row-major broadcast-sum."""
    import jax.numpy as _jnp

    K = attr_t.shape[0]
    T = n_src
    from vkr_tpu.raster.setup import _sum3

    att2 = [[_jnp.concatenate([attr_t[k, m * T:(m + 1) * T]] * 2)
             for k in range(K)] for m in range(3)]
    return [[_sum3(weights[c][0] * att2[0][k],
                   weights[c][1] * att2[1][k],
                   weights[c][2] * att2[2][k])
             for k in range(K)] for c in range(3)]


def build_tri_rows_t(setup_t, cattrs, tri_mat):
    """build_tri_rows on component-major inputs: one (TC, 64) stack at
    the end instead of (TC, 3)-shaped intermediates (which pad lanes
    3 -> 128 on TPU).

    setup_t: setup.TriangleSetupT; cattrs: [c][k] lists of (TC,);
    tri_mat: (TC,) int32."""
    import jax.numpy as _jnp

    a, b, c = setup_t.a, setup_t.b, setup_t.c
    iw = setup_t.inv_w
    tc = a[0].shape[0]
    ids = _jnp.arange(tc, dtype=_jnp.float32)
    zero = _jnp.zeros((tc,), _jnp.float32)

    from vkr_tpu.raster.setup import _sum3

    denom = [
        _sum3(a[0] * iw[0], a[1] * iw[1], a[2] * iw[2]),
        _sum3(b[0] * iw[0], b[1] * iw[1], b[2] * iw[2]),
        _sum3(c[0] * iw[0], c[1] * iw[1], c[2] * iw[2]),
    ]
    aw = [[cattrs[i][k] * iw[i] for k in range(N_CHANNELS)]
          for i in range(3)]
    cols = list(a) + list(b) + list(c) + list(setup_t.zplane)
    cols += [ids, zero, zero, zero] + denom
    for k in range(N_CHANNELS):  # interleaved [p_k, q_k, r_k]
        cols.append(_sum3(a[0] * aw[0][k], a[1] * aw[1][k],
                          a[2] * aw[2][k]))
        cols.append(_sum3(b[0] * aw[0][k], b[1] * aw[1][k],
                          b[2] * aw[2][k]))
        cols.append(_sum3(c[0] * aw[0][k], c[1] * aw[1][k],
                          c[2] * aw[2][k]))
    cols.append(tri_mat.astype(_jnp.float32))
    cols += [zero] * (ROW_WIDTH - len(cols))
    return _jnp.stack(cols, axis=-1)
