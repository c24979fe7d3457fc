"""TAA resolve pass.

Reference: src/taa.cpp + shaders/taa/resolve.comp. The camera jitters
through the fixed 4-point sequence (main.cpp:93-108); resolve reprojects
uv + velocity, clamps the history sample to the min/max of its 4 immediate
neighbors, blends mix(history, current, 0.1), and validates reprojection by
world-space position error against a distance-scaled epsilon.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vkr_tpu.mathlib.projection import reconstruct_view_vec
from vkr_tpu.passes.sampling import screen_uv_grid

from vkr_tpu.core.registry import register


class TAAParams(NamedTuple):
    inverse_camera: jnp.ndarray
    prev_inverse_camera: jnp.ndarray
    fovy: float
    aspect: float
    znear: float
    zfar: float


@register("taa_resolve")
def taa_resolve(
    history_color,   # (H, W, 3)
    history_depth,   # (H, W) prev frame depth
    current_depth,   # (H, W)
    velocity,        # (H, W, 2)
    current_color,   # (H, W, 3)
    params: TAAParams,
    use_kernel_gather: bool = False,
    interpret: bool = False,
    row0=None,
    band_h: "int | None" = None,
):
    """row0/band_h (band mode, parallel/band.py): compute only rows
    [row0, row0 + band_h); inputs stay FULL-frame (history reprojection
    reads a velocity-radius window)."""
    from vkr_tpu.passes.sampling import reproject_bilinear

    H, W = current_depth.shape
    banded = row0 is not None
    h = band_h if banded else H
    w = W
    uv = screen_uv_grid(h, w, row0=row0 if banded else 0, full_height=H)

    def band(a):
        if not banded:
            return a
        return jax.lax.dynamic_slice(
            a, (row0,) + (0,) * (a.ndim - 1), (h,) + a.shape[1:])

    velocity = band(velocity)
    current_color_c = band(current_color)
    depth_c = band(current_depth)
    delta_len = jnp.linalg.norm(velocity, axis=-1)
    prev_uv = uv + velocity
    in_bounds = (
        (prev_uv[..., 0] >= 0) & (prev_uv[..., 0] <= 1)
        & (prev_uv[..., 1] >= 0) & (prev_uv[..., 1] <= 1)
    )

    hist_depth_tap = None
    if use_kernel_gather:
        # All six history fetches (center + 4-neighbor clamp box +
        # prev-depth reprojection) share one velocity field and one
        # +-1-texel neighborhood: ONE fused kernel call instead of six
        # window gathers (round-5 pass_costs: 29.9 -> see ROADMAP).
        from vkr_tpu.raster.gather_kernel import taa_history_gather

        history, (c0, c1, c2, c3), hist_depth_tap = taa_history_gather(
            history_color, history_depth, velocity[..., 1] * H,
            velocity[..., 0] * W, interpret=interpret, row0=row0)
    else:
        def hist_tap(texel_offset=None):
            return reproject_bilinear(
                history_color, velocity, texel_offset=texel_offset,
                use_kernel=use_kernel_gather, interpret=interpret,
                row0=row0,
            )

        history = hist_tap()
        c0 = hist_tap((1, 0))
        c1 = hist_tap((0, 1))
        c2 = hist_tap((-1, 0))
        c3 = hist_tap((0, -1))
    color_min = jnp.minimum(jnp.minimum(c0, c1), jnp.minimum(c2, c3))
    color_max = jnp.maximum(jnp.maximum(c0, c1), jnp.maximum(c2, c3))
    history = jnp.clip(history, color_min, color_max)

    blended = history + (current_color_c - history) * 0.1

    def world(dtex, inv_cam, suv, vel=None):
        if vel is None:
            d = dtex
        elif hist_depth_tap is not None:
            d = hist_depth_tap  # fused kernel's prev-depth tap
        else:
            d = reproject_bilinear(dtex, vel,
                                   use_kernel=use_kernel_gather,
                                   interpret=interpret, row0=row0)
        vc = reconstruct_view_vec(suv, d, params.fovy, params.aspect,
                                  params.znear, params.zfar)
        m = jnp.asarray(inv_cam)
        return vc @ m[:3, :3].T + m[:3, 3][None, None, :]

    w_cur = world(depth_c, params.inverse_camera, uv)
    w_prev = world(history_depth, params.prev_inverse_camera, prev_uv,
                   vel=velocity)
    cam = jnp.asarray(params.inverse_camera)[:3, 3]
    error = jnp.linalg.norm(w_cur - w_prev, axis=-1)
    pixel_dist = jnp.linalg.norm(w_cur - cam[None, None, :], axis=-1)
    reprojected = in_bounds & (
        (delta_len < 0.005)
        | (error < jnp.clip(0.1 * pixel_dist * delta_len, 0.01, 0.2))
    )

    return jnp.where(reprojected[..., None], blended,
                     current_color_c)
