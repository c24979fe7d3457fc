"""Tiled window-gather kernel vs XLA oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from vkr_tpu.raster.gather_kernel import (
    window_gather_bilinear,
    window_gather_reference,
)


@pytest.mark.parametrize("shape", [(64, 200), (33, 128), (16, 384)])
@pytest.mark.parametrize("radius", [8, 16])
def test_matches_oracle(shape, radius):
    rng = np.random.default_rng(hash(shape) % 2**31)
    h, w = shape
    img = jnp.asarray(rng.random((h, w)), jnp.float32)
    off_y = jnp.asarray(rng.uniform(-radius - 4, radius + 4, (h, w)),
                        jnp.float32)
    off_x = jnp.asarray(rng.uniform(-radius - 4, radius + 4, (h, w)),
                        jnp.float32)
    got = np.asarray(
        window_gather_bilinear(img, off_y, off_x, radius=radius,
                               interpret=True)
    )
    want = np.asarray(
        window_gather_reference(img, off_y, off_x, radius=radius)
    )
    assert np.abs(got - want).max() < 1e-4


def test_multichannel():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((32, 128, 3)), jnp.float32)
    off = jnp.zeros((32, 128), jnp.float32)
    out = np.asarray(
        window_gather_bilinear(img, off, off, radius=8, interpret=True)
    )
    # zero offset = identity
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_reproject_helper_paths_agree():
    from vkr_tpu.passes.sampling import reproject_bilinear

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.random((32, 128)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-0.05, 0.05, (32, 128, 2)), jnp.float32)
    a = np.asarray(
        reproject_bilinear(img, vel, use_kernel=True, interpret=True)
    )
    b = np.asarray(reproject_bilinear(img, vel, use_kernel=False))
    assert np.abs(a - b).max() < 1e-4
