from vkr_tpu.parallel.sharding import (
    make_render_mesh,
    render_views_sharded,
)
