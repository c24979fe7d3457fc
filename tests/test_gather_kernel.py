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


class TestTAAHistoryGather:
    """The fused TAA gather (one kernel, six taps) must reproduce six
    independent window_gather_bilinear calls exactly — including the
    per-tap independent +-radius clamps at the offset extremes."""

    def test_matches_six_calls(self):
        import jax
        from vkr_tpu.raster.gather_kernel import taa_history_gather

        k = jax.random.PRNGKey(3)
        H, W, R = 24, 256, 8
        color = jax.random.uniform(k, (H, W, 3))
        depth = jax.random.uniform(jax.random.PRNGKey(4), (H, W))
        # offsets spanning well past the clamp radius to hit every
        # clamp branch (incl. the fy/fx differences at the edges)
        off_y = (jax.random.uniform(jax.random.PRNGKey(5), (H, W)) * 24
                 - 12.0)
        off_x = (jax.random.uniform(jax.random.PRNGKey(6), (H, W)) * 24
                 - 12.0)

        hist, taps, pdepth = jax.jit(
            lambda *a: taa_history_gather(*a, radius=R, interpret=True)
        )(color, depth, off_y, off_x)

        def ref(img, dy, dx):
            return window_gather_bilinear(
                img, off_y + dy, off_x + dx, radius=R, interpret=True)

        np.testing.assert_allclose(np.asarray(hist),
                                   np.asarray(ref(color, 0, 0)),
                                   rtol=0, atol=1e-6)
        for tap, (dx, dy) in zip(taps, ((1, 0), (0, 1), (-1, 0),
                                        (0, -1))):
            np.testing.assert_allclose(
                np.asarray(tap), np.asarray(ref(color, dy, dx)),
                rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pdepth),
                                   np.asarray(ref(depth, 0, 0)),
                                   rtol=0, atol=1e-6)
