"""Image sampling helpers shared by the image-space passes.

The equivalent of the GLSL texture() / textureLod() calls against render
targets (DEFAULT_SAMPLER: linear filter, clamp-to-edge — samplers.hpp:36-50)
expressed as dense gathers over (H, W[, C]) arrays with uv in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def _prep(img):
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    return img, squeeze


def bilinear_sample(img, uv, offset_texels=None):
    """texture(img, uv) with linear filter + clamp-to-edge.

    img: (H, W) or (H, W, C); uv: (..., 2) in [0,1].
    offset_texels: optional (2,) int offset in texel units (textureOffset).
    """
    img, squeeze = _prep(img)
    h, w = img.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    if offset_texels is not None:
        x = x + offset_texels[0]
        y = y + offset_texels[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(xi, yi):
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        return img[yi, xi]

    t00 = tap(x0, y0)
    t10 = tap(x0 + 1, y0)
    t01 = tap(x0, y0 + 1)
    t11 = tap(x0 + 1, y0 + 1)
    top = t00 + (t10 - t00) * fx
    bot = t01 + (t11 - t01) * fx
    out = top + (bot - top) * fy
    return out[..., 0] if squeeze else out


def nearest_sample(img, uv, offset_texels=None):
    """texelFetch-style nearest sampling with clamp-to-edge."""
    img, squeeze = _prep(img)
    h, w = img.shape[:2]
    x = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    y = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    if offset_texels is not None:
        x = x + offset_texels[0]
        y = y + offset_texels[1]
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    out = img[y, x]
    return out[..., 0] if squeeze else out


def texel_fetch(img, x, y):
    """texelFetch(img, ivec2(x, y)) with clamp-to-edge."""
    img, squeeze = _prep(img)
    h, w = img.shape[:2]
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    out = img[y, x]
    return out[..., 0] if squeeze else out


def reproject_bilinear(img, uv_offset, *, radius: int = 16,
                       texel_offset=None, use_kernel: bool = True,
                       interpret: bool = False):
    """Bilinear sample at (pixel uv + uv_offset), the reprojection pattern
    of TAA / temporal accumulation.

    With use_kernel, runs the Pallas tiled window-gather (offsets clamped
    to +-radius px, ~15x faster than XLA gather on TPU); otherwise falls
    back to the dense XLA path without the clamp. texel_offset: optional
    (2,) constant texel offset (textureOffset analog).
    """
    h, w = img.shape[:2]
    if use_kernel:
        from vkr_tpu.raster.gather_kernel import window_gather_bilinear

        off_x = uv_offset[..., 0] * w
        off_y = uv_offset[..., 1] * h
        if texel_offset is not None:
            off_x = off_x + texel_offset[0]
            off_y = off_y + texel_offset[1]
        return window_gather_bilinear(img, off_y, off_x, radius=radius,
                                      interpret=interpret)
    uv = screen_uv_grid(h, w) + uv_offset
    return bilinear_sample(
        img, uv,
        None if texel_offset is None else jnp.asarray(texel_offset),
    )


def screen_uv_grid(height: int, width: int):
    """Per-pixel uv at pixel centers — the fullscreen-triangle varying
    (screen_uv in the deferred shaders)."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)
