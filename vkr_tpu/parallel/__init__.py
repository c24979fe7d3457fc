from vkr_tpu.parallel.sharding import (
    make_render_mesh,
    render_views_sharded,
)
from vkr_tpu.parallel.band import render_frame_banded  # noqa: F401
