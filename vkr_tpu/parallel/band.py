"""Pixel-band multi-chip rendering (shard_map over framebuffer rows).

The geometry-heavy half of the frame — vertex transform, near clip,
binning, the merged raster+resolve kernel, and all G-buffer texture
sampling — runs SHARDED: each device renders only its horizontal band of
rows, using the band-exact viewport mode (raster/setup.py + kernels keep
edge/depth coefficients in full-frame float coordinates, so the gathered
G-buffer is BITWISE IDENTICAL to a single-device render).

The bands are then all_gathered over ICI (a few MB of G-buffer planes)
and the image-space chain (SSR trace/filter/blur, probe GI, GTAO
main/filter/accumulate, shading, TAA) runs BANDED too: every expensive
pass computes only its device's rows (frame.shade_frame band mode —
each pass takes a row origin; global-access inputs like the hi-Z
pyramid and reprojection histories stay replicated), and each pass
output is re-replicated with a tiled ICI all_gather (a few MB each,
orders of magnitude cheaper than the pass compute it shards). hi-Z
itself stays replicated: it is cheap and every consumer (the march)
reads it globally — sharding it would just all_gather it right back.

The result is deterministically identical everywhere, so the banded
frame matches the single-device frame (tests/test_parallel.py); under
jit, XLA may fuse reductions of the two DIFFERENT programs differently
— 1-ULP deltas that can cascade through the branchy SSR/GTAO marches
(measured max ~1e-5, well below the 1/255 quantization step).

Usage mirrors render_views_sharded (sharding.py); see
__graft_entry__.dryrun_multichip and tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vkr_tpu.passes.gbuffer import GBuffer


def render_frame_banded(
    scene,
    state,          # FrameState, full-frame (replicated)
    cam,
    ssr_res,
    cfg,
    mesh: Mesh,
    *,
    probe_grid=None,
    tri_grid=None,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """One frame band-sharded over `mesh` (1-D). Returns
    (color (H, W, 3) row-sharded, new FrameState replicated, aux) —
    bit-identical to render_frame on one device.

    cfg.height must divide evenly into 2x-even bands (velocity quad
    derivatives and the half-res chain need even band heights).
    """
    from vkr_tpu.core import registry
    from vkr_tpu.frame import shade_frame

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    h, w = cfg.height, cfg.width
    assert h % (2 * n) == 0, (
        f"height {h} must split into even bands across {n} devices"
    )
    bh = h // n

    def per_band(scene_in, state_in, cam_in, res_in):
        band = jax.lax.axis_index(axis)
        row0 = band * bh
        gb = registry.get("gbuf_opaque_taa")(
            scene_in, cam_in.mvp, cam_in.prev_mvp, cam_in.jitter,
            width=w, height=bh, quantize=cfg.quantize_formats,
            use_pallas=use_pallas, interpret=interpret,
            mask_peel_layers=cfg.raster.mask_peel_layers,
            full_height=h, row_offset=row0,
            trilinear=cfg.trilinear_textures,
        )

        # gather the band G-buffer into the full frame (ICI all_gather;
        # band-exact raster makes this bitwise equal to a single-device
        # G-buffer)
        def gather(x):
            return jax.lax.all_gather(x, axis, axis=0, tiled=True)

        gbuf_full = GBuffer(
            albedo=gather(gb.albedo),
            normal=gather(gb.normal),
            material=gather(gb.material),
            velocity=gather(gb.velocity),
            depth=gather(gb.depth),
            overflow=jax.lax.psum(gb.overflow, axis),
        )

        color, new_state, aux = shade_frame(
            gbuf_full, state_in, cam_in, res_in, cfg,
            probe_grid=probe_grid, tri_grid=tri_grid,
            use_pallas=use_pallas, interpret=interpret,
            band=(row0, bh), gather_fn=gather,
        )
        color_band = jax.lax.dynamic_slice(color, (row0, 0, 0),
                                           (bh, w, color.shape[-1]))
        return color_band, new_state, aux["overflow"]

    fn = shard_map(
        per_band,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )
    color, new_state, overflow = fn(scene, state, cam, ssr_res)
    return color, new_state, {"overflow": overflow}
