"""Texture-fetch heatmap profiler.

Reference: src/trace_samples.{hpp,cpp} + include/trace_samples.glsl — a
compile-time debug mode where every texture fetch whose *source* pixel
falls in a uv window does an imageAtomicAdd into an R32_UINT heatmap
(TRACE_SAMPLE_UV, trace_samples.glsl:35-39), visualizing texture bandwidth.

Here the analog is explicit: passes running in debug mode report their
(source uv window, fetched uv) pairs to a SamplesMarker, which scatter-adds
fetch counts into a heatmap array. Cleared per frame (main.cpp:343).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Default trace window (gtao/main.comp:29-32 constants).
DEFAULT_WINDOW = (0.5 - 1e-6, 0.5 - 1e-6, 0.5 + 8.0 / 1920.0,
                  0.5 + 4.0 / 1920.0)


class SamplesMarker:
    """Accumulates fetch-count heatmaps (SamplesMarker::init/clear
    analog)."""

    def __init__(self, height: int, width: int,
                 window: Tuple[float, float, float, float] = DEFAULT_WINDOW):
        self.height = height
        self.width = width
        self.window = window
        self.heatmap = jnp.zeros((height, width), jnp.int32)

    def clear(self):
        """Per-frame clear (main.cpp:343)."""
        self.heatmap = jnp.zeros_like(self.heatmap)

    def trace(self, src_uv, fetch_uv):
        """TRACE_SAMPLE_UV(start, tc): for source pixels inside the window,
        count the fetch at tc into the heatmap.

        src_uv / fetch_uv: (..., 2) arrays of matching shape.
        """
        x0, y0, x1, y1 = self.window
        in_window = (
            (src_uv[..., 0] >= x0) & (src_uv[..., 0] <= x1)
            & (src_uv[..., 1] >= y0) & (src_uv[..., 1] <= y1)
        )
        xi = jnp.clip((fetch_uv[..., 0] * self.width).astype(jnp.int32),
                      0, self.width - 1)
        yi = jnp.clip((fetch_uv[..., 1] * self.height).astype(jnp.int32),
                      0, self.height - 1)
        self.heatmap = self.heatmap.at[
            yi.reshape(-1), xi.reshape(-1)
        ].add(in_window.reshape(-1).astype(jnp.int32), mode="drop")
        return self.heatmap

    def to_image(self):
        """Normalized heatmap for the channel-select viewer."""
        h = self.heatmap.astype(jnp.float32)
        return h / jnp.maximum(h.max(), 1.0)
