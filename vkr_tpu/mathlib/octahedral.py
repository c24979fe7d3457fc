"""Octahedral direction/normal encodings.

Same math as the reference's shaders/include/gbuffer_encode.glsl:17-37
(normal <-> RG16_UNORM payload) and shaders/include/octahedral.glsl (probe
direction <-> octahedral texel), expressed vectorized over jnp arrays with
an arbitrary leading shape and a trailing component axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sign_nz(v):
    """sign() that maps 0 to +1 (gbuffer_encode.glsl:5-7)."""
    return jnp.where(v >= 0.0, 1.0, -1.0)


def encode_normal(n):
    """Unit vector (..., 3) -> octahedral uv in [0,1]^2 (..., 2)."""
    l1 = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    xy = n[..., :2] / l1[..., None]
    # Lower hemisphere: fold over the diagonal.
    folded = (1.0 - jnp.abs(xy[..., ::-1])) * _sign_nz(xy)
    xy = jnp.where((n[..., 2] < 0.0)[..., None], folded, xy)
    return 0.5 * xy + 0.5


def decode_normal(uv):
    """Octahedral uv in [0,1]^2 (..., 2) -> unit vector (..., 3)."""
    uv = 2.0 * uv - 1.0
    z = 1.0 - jnp.abs(uv[..., 0]) - jnp.abs(uv[..., 1])
    folded = (1.0 - jnp.abs(uv[..., ::-1])) * _sign_nz(uv)
    xy = jnp.where((z < 0.0)[..., None], folded, uv)
    v = jnp.concatenate([xy, z[..., None]], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


# Probe-space octahedral direction mapping (octahedral.glsl oct_encode /
# oct_decode): same folding, kept as distinct names because probes use the
# full-sphere mapping for arbitrary directions rather than shading normals.
oct_encode_dir = encode_normal
oct_decode_dir = decode_normal
