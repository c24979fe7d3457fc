"""FrameState — the explicit history-state pytree.

The reference keeps temporal state by remapping image ids after each frame
(main.cpp:416-420: depth<->prev_depth, gtao.output<->prev_frame, TAA
target<->history, SSR blurred<->history, GTAO accumulated<->history). Here
that state is an explicit pytree returned by the jitted frame function and
fed back in; `jax.jit(..., donate_argnums=...)` reproduces the zero-copy
swap (SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class FrameState:
    """History buffers + frame counters threaded through the frame fn.

    Fields (all device arrays unless noted):
      prev_depth      (H, W)   previous frame hardware depth
      taa_history     (H, W, 3) TAA accumulation buffer (RGBA16F analog)
      gtao_accum      (H/2, W/2, 2) accumulated AO + sample count (RG8 analog)
      gtao_prev       (H/2, W/2) previous filtered AO
      ssr_history     (H/2, W/2, 3) blurred SSR history
      prev_mvp        (4, 4)   previous jittered view-projection
      frame_index     ()       int32 frame counter (drives jitter + noise)
    """

    FIELDS = (
        "prev_depth",
        "prev_depth_half",
        "taa_history",
        "gtao_accum",
        "gtao_prev",
        "ssr_history",
        "prev_mvp",
        "frame_index",
    )

    def __init__(self, **kwargs: Any):
        for name in self.FIELDS:
            setattr(self, name, kwargs.get(name))

    @staticmethod
    def initial(height: int, width: int) -> "FrameState":
        """Zero-initialized history, matching the reference's first-frame
        clears (clear_depth to 1.0 at main.cpp:306, clear_history flags)."""
        hh, hw = height // 2, width // 2
        return FrameState(
            prev_depth=jnp.ones((height, width), jnp.float32),
            prev_depth_half=jnp.ones((hh, hw), jnp.float32),
            taa_history=jnp.zeros((height, width, 3), jnp.float32),
            gtao_accum=jnp.zeros((hh, hw, 2), jnp.float32),
            gtao_prev=jnp.zeros((hh, hw), jnp.float32),
            ssr_history=jnp.zeros((hh, hw, 3), jnp.float32),
            prev_mvp=jnp.eye(4, dtype=jnp.float32),
            frame_index=jnp.zeros((), jnp.int32),
        )

    def replace(self, **kwargs: Any) -> "FrameState":
        new = {name: getattr(self, name) for name in self.FIELDS}
        new.update(kwargs)
        return FrameState(**new)

    def tree_flatten(self):
        return tuple(getattr(self, n) for n in self.FIELDS), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(**dict(zip(cls.FIELDS, children)))

    def __repr__(self):
        parts = []
        for n in self.FIELDS:
            v = getattr(self, n)
            shape = getattr(v, "shape", None)
            parts.append(f"{n}={shape}")
        return "FrameState(" + ", ".join(parts) + ")"
